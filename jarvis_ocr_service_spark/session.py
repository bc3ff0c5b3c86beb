"""SparkSession configuration for the extraction engine.

One place for the settings that matter at 100 TB, with the reasoning
attached — test code uses a smaller variant (tests/conftest.py), the
bench uses bench.py's, and spark-submit jobs can apply these via
``--conf`` or by calling :func:`builder`.
"""

from __future__ import annotations

# Engine-recommended configuration and why.
RECOMMENDED_CONF = {
    # AQE: runtime re-planning — coalesces post-filter small partitions
    # between tier stages and splits skewed shuffle partitions (the
    # url-host Zipf skew, SURVEY P11).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Arrow: the engine's Python stages are all mapInPandas; page rows
    # average ~15 KB (up to 50 KB+), so cap batches well below the 10k
    # default to bound per-batch memory (2048 x 50 KB = 100 MB worst-case).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    # Reuse Python workers across tasks — extractor modules import once
    # per executor core, mirroring the reference's lazy provider init
    # (SURVEY P2).
    "spark.python.worker.reuse": "true",
    # Parquet scan splits: pages rows are fat; 128 MB default keeps a few
    # thousand rows per split, good Arrow batch utilization.
    "spark.sql.files.maxPartitionBytes": "134217728",
}


def builder(app_name: str = "jarvis-ocr-service-spark", master: str | None = None,
            shuffle_partitions: int | None = None):
    """SparkSession builder with the recommended conf applied."""
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    for k, v in RECOMMENDED_CONF.items():
        b = b.config(k, v)
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return b
