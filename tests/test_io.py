"""IO: binaryFile source shape, partitioned sink, bucketed-join co-location."""

import pathlib

import pytest
from pyspark.sql import functions as F

from jarvis_ocr_service_spark.sources.io import (
    read_binary_files,
    write_results_bucketed,
    write_results_partitioned,
)
from jarvis_ocr_service_spark.plans.pipeline import run_pipeline
from jarvis_ocr_service_spark.sources.pages import make_page, synthesize_pages


def test_binary_files_source_feeds_pipeline(spark, tmp_path):
    d = tmp_path / "files"
    d.mkdir()
    for i in (0, 2, 3):  # html, pdf, png payloads
        (d / f"doc{i}.bin").write_bytes(make_page(i)["html"])
    pages = read_binary_files(spark, str(d), glob="*.bin")
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    res = run_pipeline(pages)
    kinds = {r.content_kind for r in res.collect()}
    assert kinds == {"html", "pdf", "image"}  # magic bytes, not extensions


def test_partitioned_sink_layout(spark, tmp_path):
    out = str(tmp_path / "res")
    res = run_pipeline(synthesize_pages(spark, 60, num_partitions=2))
    write_results_partitioned(res, out, n_buckets=8)
    dirs = {p.name for p in pathlib.Path(out).iterdir() if p.name.startswith("host_bucket=")}
    assert 1 < len(dirs) <= 8  # bounded partition count
    back = spark.read.parquet(out)
    assert back.count() == 60
    # partition pruning: filtering on the bucket hits PartitionFilters
    plan = (
        back.filter(F.col("host_bucket") == 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    assert "PartitionFilters" in scan and "host_bucket" in scan.split("PartitionFilters")[1]


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    res = run_pipeline(synthesize_pages(spark, 40, num_partitions=2))
    labels = res.select("url", F.octet_length("text").alias("label"))
    write_results_bucketed(res, "t_results", n_buckets=4)
    (
        labels.write.mode("overwrite").bucketBy(4, "url").sortBy("url")
        .format("parquet").saveAsTable("t_labels")
    )
    # disable broadcast so the bucket co-location (not broadcast) carries
    # the join — at scale both sides are too big to broadcast anyway
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("t_results")
        b = spark.table("t_labels")
        joined = a.join(b, "url")
        assert joined.count() == 40
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located bucket join: no shuffle
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_results")
        spark.sql("DROP TABLE IF EXISTS t_labels")
