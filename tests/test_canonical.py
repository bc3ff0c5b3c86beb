"""Canonical dedup form + script ratios (functions/canonical.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.canonical import (
    canonical_text_col,
    canonical_text_duck_sql,
    dedup_canonical,
    script_ratios,
    script_ratios_duck_sql,
)


CASES = [
    "Hello,   World!",
    "hello world",
    "HELLO ... WORLD",
    "a1 b2-c3",
    "  a1   b2 c3!!",
    "",
    None,
    "tabs\tand\nnewlines",
    "unicode: café déjà-vu",  # non-ASCII letters become separators
    "MiXeD 42 Case-42",
    "vertical\x0btab\x0b here",  # Java \s includes \x0B; RE2 \s doesn't —
    # the mirrors pin the explicit class
]


def _brute_canon(t):
    import re

    t = (t or "").lower()
    t = re.sub(r"[^a-z0-9\s]+", " ", t)
    t = re.sub(r"\s+", " ", t)
    return t.strip()


def test_canonical_matches_pure_python_and_duckdb(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "id long, text string")
    got = {
        r.id: r.c
        for r in df.select("id", canonical_text_col(F.col("text")).alias("c")).collect()
    }
    assert got == {i: _brute_canon(t) for i, t in enumerate(CASES)}
    con = duckdb.connect()
    for i, t in enumerate(CASES):
        dd = con.execute(
            f"SELECT {canonical_text_duck_sql('?')}", [t]
        ).fetchone()[0]
        assert dd == got[i], (t, dd, got[i])


def test_dedup_canonical_collapses_reformatting(spark):
    docs = [
        (0, "Hello,   World!"),
        (1, "hello world"),        # same canonical form as 0 and 2
        (2, "HELLO ... WORLD"),
        (3, "different content"),
        (4, ""),
        (5, None),                 # canonicalizes to "" like 4
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.key: (r.canon_len, r.n_variants) for r in dedup_canonical(df).collect()}
    assert got == {
        0: (len("hello world"), 3),
        3: (len("different content"), 1),
        4: (0, 2),
    }


def test_script_ratios_counts(spark):
    docs = [
        (0, "hello 123"),
        (1, "你好世界 ok"),
        (2, "Привет мир"),
        (3, "مرحبا"),
        (4, "안녕하세요 abc1"),
        (5, None),
        (6, "a\x0bb c"),  # \x0B is whitespace to Java AND to the mirror
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.key: (r.n_chars, r.n_latin, r.n_digit, r.n_cjk, r.n_cyrillic, r.n_arabic, r.n_hangul)
        for r in script_ratios(df).collect()
    }
    assert got[6] == (3, 3, 0, 0, 0, 0, 0)
    assert got[0] == (8, 5, 3, 0, 0, 0, 0)
    assert got[1] == (6, 2, 0, 4, 0, 0, 0)
    assert got[2] == (9, 0, 0, 0, 9, 0, 0)
    assert got[3] == (5, 0, 0, 0, 0, 5, 0)
    assert got[4] == (9, 3, 1, 0, 0, 0, 5)
    assert got[5] == (0, 0, 0, 0, 0, 0, 0)
    # DuckDB mirror agrees on every row
    import pandas as pd

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs, columns=["doc_id", "text"]))
    dd = {
        row[0]: tuple(row[1:])
        for row in con.execute(script_ratios_duck_sql()).fetchall()
    }
    assert dd == got


def test_canonical_and_script_plans_map_only(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    plan = script_ratios(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan, plan
    dplan = dedup_canonical(df)._jdf.queryExecution().executedPlan().toString()
    assert dplan.count("Exchange") == 1, dplan  # the one digest shuffle
    assert "partial_count" in dplan or "partial" in dplan.lower(), dplan
