"""Table IO: sources and sinks with explicit partitioning.

* :func:`read_binary_files` — the S5 analog: a directory of raw payload
  files becomes a pages-shaped DataFrame via Spark's binaryFile source
  (content-type then comes from magic-byte dispatch, not extensions).
* :func:`write_results_partitioned` — results sink partitioned by a
  bounded host-bucket (never by raw host: 10^8 distinct hosts would mean
  10^8 directories; a salted bucket keeps partition count fixed and the
  hot host spread).
* :func:`write_results_bucketed` — bucketed table sink (``bucketBy`` on
  url) so downstream url-keyed joins (e.g. against a labels table
  bucketed the same way) are co-located and shuffle-free.

The Iceberg-table form of these is the same logical plan with
``writeTo(...).append()``; this environment has no Iceberg runtime, so
the path-based parquet form + the checkpoint manifest (plans/checkpoint)
stand in, with identical partitioning decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jarvis_ocr_service_spark.plans.skew import url_host

DEFAULT_HOST_BUCKETS = 64


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Directory of raw files -> pages-shaped DataFrame (url, warc_ts,
    html, text, lang)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit("").alias("text"),
        F.lit("en").alias("lang"),
    )


def host_bucket_col(url_col, n_buckets: int = DEFAULT_HOST_BUCKETS):
    """Stable bounded partition key: hash of host, salted by url hash so
    a hot host spreads (see plans/skew)."""
    return F.pmod(
        F.xxhash64(url_host(url_col)) + F.pmod(F.xxhash64(url_col), F.lit(16)),
        F.lit(n_buckets),
    )


def write_results_partitioned(
    results: DataFrame, path: str, n_buckets: int = DEFAULT_HOST_BUCKETS,
    mode: str = "overwrite",
) -> None:
    out = results.withColumn("host_bucket", host_bucket_col(F.col("url"), n_buckets))
    out.write.mode(mode).partitionBy("host_bucket").parquet(path)


def write_results_bucketed(
    results: DataFrame, table: str, n_buckets: int = DEFAULT_HOST_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: url-keyed joins against same-bucketed
    tables need no shuffle."""
    (
        results.write.mode(mode)
        .bucketBy(n_buckets, "url")
        .sortBy("url")
        .format("parquet")
        .saveAsTable(table)
    )
