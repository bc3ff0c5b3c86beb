"""Sequence packing: two-phase global cumsum == the global-window
oracle; pack assignment rules; no single-partition global window."""

import duckdb
import pytest

from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.packing import (
    assign_packs,
    with_global_cumsum,
)


def test_cumsum_matches_duckdb_global_window(spark):
    rows = [(i, (i * 37 + 11) % 400 + 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r.doc_id: r.cumsum
        for r in with_global_cumsum(df, "doc_id", "n", num_partitions=16).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            "SELECT doc_id, CAST(sum(n) OVER (ORDER BY doc_id) AS BIGINT) "
            "FROM (SELECT unnest(range(2000)) AS doc_id, "
            "(unnest(range(2000)) * 37 + 11) % 400 + 1 AS n)"
        ).fetchall()
    )
    assert got == want


def test_pack_assignment_rules(spark):
    # tokens: 60, 60, 60 with max 100 -> starts 0, 60, 120 ->
    # packs 0, 0, 1; offsets 0, 60, 20
    df = spark.createDataFrame(
        [(0, 60), (1, 60), (2, 60)], "doc_id long, n_tokens long"
    )
    got = {
        r.doc_id: (r.pack_id, r.pack_offset)
        for r in assign_packs(df, 100, num_partitions=2).collect()
    }
    assert got == {0: (0, 0), 1: (0, 60), 2: (1, 20)}

    # a document longer than the budget starts where it starts and the
    # NEXT doc lands after the straddle
    df2 = spark.createDataFrame(
        [(0, 250), (1, 10)], "doc_id long, n_tokens long"
    )
    got2 = {
        r.doc_id: (r.pack_id, r.pack_offset)
        for r in assign_packs(df2, 100, num_partitions=2).collect()
    }
    assert got2 == {0: (0, 0), 1: (2, 50)}

    with pytest.raises(ValueError):
        assign_packs(df, 0)


def test_no_single_partition_global_window(spark):
    df = spark.createDataFrame([(i, 1) for i in range(10)], "doc_id long, n long")
    plan = (
        with_global_cumsum(df, "doc_id", "n", num_partitions=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the running-sum window must be partitioned by _pid (parallel),
    # never an empty partition spec (the 1-task collapse)
    assert "windowspecdefinition(_pid" in plan, plan


def test_cumsum_releases_cached(spark):
    from jarvis_ocr_service_spark.plans.caching import release_cached

    df = spark.createDataFrame([(i, 1) for i in range(10)], "doc_id long, n long")
    out = with_global_cumsum(df, "doc_id", "n", num_partitions=2)
    out.collect()
    assert release_cached(out) == 1
