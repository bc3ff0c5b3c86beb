"""Vocabulary building: exact counts, pair semantics, plan shape."""

from collections import Counter

from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.vocab import (
    token_counts,
    token_pair_counts,
    top_tokens,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "The Cat ran"),
    (2, ""),
    (3, None),
    (4, "  mat   the  "),
]


def _brute_tokens():
    c = Counter()
    for _, t in DOCS:
        c.update((t or "").lower().split())
    return c


def test_token_counts_exact(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.token: r.n for r in token_counts(df).collect()}
    assert got == dict(_brute_tokens())
    got2 = {r.token: r.n for r in token_counts(df, min_count=2).collect()}
    assert got2 == {t: n for t, n in _brute_tokens().items() if n >= 2}


def test_top_tokens_order_and_ties(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [(r.token, r.n) for r in top_tokens(df, 3).collect()]
    brute = sorted(_brute_tokens().items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert got == brute


def test_pair_counts_adjacency(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {(r.tok_a, r.tok_b): r.n for r in token_pair_counts(df).collect()}
    brute = Counter()
    for _, t in DOCS:
        toks = (t or "").lower().split()
        for a, b in zip(toks, toks[1:]):
            brute[(a, b)] += 1
    assert got == dict(brute)
    assert got[("the", "cat")] == 2  # across documents, case-folded


def test_plan_partial_agg_and_take_ordered(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = top_tokens(df, 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_count" in plan, plan  # map-side combine before shuffle
