"""Count-min sketch (functions/sketch.py): brute-force parity, the
never-undercount guarantee, mergeability, and cell-mirror parity."""

from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.sketch import (
    cms_build,
    cms_cell_duck_sql,
    cms_estimate,
)


def _brute_cells(texts, width, depth, spark_cell_fn):
    """Exact sketch via the SAME cell function evaluated through Spark
    (the hash family is pinned elsewhere; here we pin the sketch)."""
    toks = []
    for t in texts:
        toks.extend((t or "").lower().split())
    return Counter(toks)


def test_cms_never_undercounts_and_exact_when_sparse(spark):
    texts = [
        "alpha beta gamma alpha",
        "beta beta delta",
        "epsilon alpha zeta",
    ]
    truth = _brute_cells(texts, None, None, None)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    # wide sketch: collisions essentially impossible for 6 tokens
    sk = cms_build(df, width=4096, depth=4)
    est = {
        r.token: r.est
        for r in cms_estimate(sk, list(truth) + ["neverseen"], 4096, 4).collect()
    }
    assert est == {**truth, "neverseen": 0}
    # narrow sketch: estimates may only go UP
    sk2 = cms_build(df, width=4, depth=2)
    est2 = {
        r.token: r.est for r in cms_estimate(sk2, list(truth), 4, 2).collect()
    }
    assert all(est2[t] >= n for t, n in truth.items())
    # total mass per row is conserved exactly
    mass = {
        r.row: r.s
        for r in sk2.groupBy("row").agg(F.sum("n").alias("s")).collect()
    }
    assert mass == {0: sum(truth.values()), 1: sum(truth.values())}


def test_cms_merge_is_cellwise_sum(spark):
    a = spark.createDataFrame([("x y x",)], "text string")
    b = spark.createDataFrame([("x z",)], "text string")
    both = spark.createDataFrame([("x y x",), ("x z",)], "text string")
    ska, skb = cms_build(a, width=64, depth=3), cms_build(b, width=64, depth=3)
    merged = (
        ska.unionByName(skb)
        .groupBy("row", "bucket")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    direct = cms_build(both, width=64, depth=3)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_cms_cell_duck_mirror(spark):
    tokens = ["alpha", "beta", "x", "longer_token_42", ""]
    df = spark.createDataFrame([(t,) for t in tokens], "token string")
    from jarvis_ocr_service_spark.functions.sketch import _cell

    con = duckdb.connect()
    for r in (0, 3):
        got = {
            row.token: row.c
            for row in df.select(
                "token", _cell(F.col("token"), r, 97).alias("c")
            ).collect()
        }
        for t in tokens:
            dd = con.execute(
                f"SELECT {cms_cell_duck_sql('t', r, 97)} FROM (VALUES (?)) v(t)",
                [t],
            ).fetchone()[0]
            assert dd == got[t], (t, r)


def test_cms_validation(spark):
    df = spark.createDataFrame([("a",)], "text string")
    with pytest.raises(ValueError):
        cms_build(df, width=0)
    with pytest.raises(ValueError):
        cms_build(df, depth=0)
    with pytest.raises(ValueError):
        cms_estimate(cms_build(df), [])
