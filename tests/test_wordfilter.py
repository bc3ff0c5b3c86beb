"""Banned-wordlist filter: pinned distinct-hit semantics, codegen plan."""

from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.wordfilter import (
    drop_by_wordlist,
    wordlist_flags,
)

DOCS = [
    (0, "clean words only here"),
    (1, "contains BadWord once"),
    (2, "badword badword repeated still one distinct hit"),
    (3, "badword and alsobad together"),
    (4, ""),
    (5, None),
]
WORDS = ["BADWORD", "alsobad"]


def test_wordlist_flags_pinned(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.key: (r.n_hits, r.flagged) for r in wordlist_flags(df, WORDS).collect()}
    assert got == {
        0: (0, False),
        1: (1, True),   # case-folded both sides
        2: (1, True),   # repeats count once (distinct words)
        3: (2, True),
        4: (0, False),
        5: (0, False),
    }
    kept = sorted(r.doc_id for r in drop_by_wordlist(df, WORDS).collect())
    assert kept == [0, 4, 5]


def test_wordlist_plan_is_codegen_only(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        wordlist_flags(df, WORDS)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
