"""Plan-quality gates: the physical plans the engine is supposed to
produce, asserted so regressions in pushdown/pruning/shuffle shape fail CI.
(The '.explain and iterate' requirement, pinned.)"""

import pytest
from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.dedup import dedup_exact
from jarvis_ocr_service_spark.plans.pipeline import run_pipeline, status_by_host
from jarvis_ocr_service_spark.sources.pages import synthesize_pages


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pq") / "pages")
    synthesize_pages(spark, 100, num_partitions=2).write.parquet(d)
    return d


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_extraction_scan_prunes_text_column(spark, pages_path):
    """The pages 'text' column (raw crawl text) must never be read by the
    extraction pipeline — column pruning through mapInPandas."""
    plan = _plan(run_pipeline(spark.read.parquet(pages_path)))
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    assert "ReadSchema" in scan
    assert "text" not in scan.split("ReadSchema")[1]
    assert "html" in scan  # payload is read


def test_extraction_is_single_stage_map(spark, pages_path):
    plan = _plan(run_pipeline(spark.read.parquet(pages_path)))
    assert "Exchange" not in plan


def test_filter_pushdown_reaches_scan(spark, pages_path):
    df = spark.read.parquet(pages_path).filter(F.col("lang") == "en")
    plan = _plan(run_pipeline(df))
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    assert "PushedFilters" in scan and "lang" in scan.split("PushedFilters")[1]


def test_status_agg_partial_before_shuffle(spark, pages_path):
    plan = _plan(status_by_host(run_pipeline(spark.read.parquet(pages_path))))
    # map-side combine: a partial_ aggregate must appear below the Exchange
    assert "partial_max" in plan or "partial_" in plan
    assert plan.count("Exchange") == 1


def test_dedup_exact_single_shuffle(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(dedup_exact(docs))
    assert plan.count("Exchange") == 1
    assert "partial_" in plan


def test_dim_joins_are_broadcast(spark):
    import __spark_entry__ as e

    df = e.queries()["orders_by_nation"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_results_filter_pushdown_on_written_output(spark, pages_path, tmp_path):
    out = str(tmp_path / "results")
    run_pipeline(spark.read.parquet(pages_path)).write.parquet(out)
    q = spark.read.parquet(out).filter(F.col("is_valid")).select("url", "text_len")
    scan = [l for l in _plan(q).splitlines() if "FileScan" in l][0]
    assert "is_valid" in scan.split("PushedFilters")[1]
    read_schema = scan.split("ReadSchema")[1]
    assert "text:" not in read_schema  # projection pruned the big column
