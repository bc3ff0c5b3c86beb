"""Corpus composition report — the observability aggregate a
training-data pipeline publishes after every build: per-language (or
per-source) document counts, size totals, and an exact integer size
histogram. One partial-agg shuffle; everything integer/exact so the
report is engine-portable and diffable run-to-run.

Histogram buckets are PINNED log2 size classes: bucket =
floor(log2(max(n, 1))) computed as bit_length(n)-1 in exact integer
arithmetic (63 - leading-zeros), so the same document always lands in
the same bucket in any engine.

Reference parity note: mirrors the spirit of the reference's counter
reporting (prds/queue-flow.md metrics) lifted to corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def size_bucket_col(n_col):
    """floor(log2(max(n,1))) via string length of the binary form —
    exact integers end-to-end (bin() -> LPAD-free length), no floating
    log whose last ulp could flip a boundary value."""
    n = F.greatest(n_col.cast("long"), F.lit(1))
    return (F.length(F.conv(n.cast("string"), 10, 2)) - F.lit(1)).cast("long")


def size_bucket_duck_sql(expr: str) -> str:
    """EXACT DuckDB mirror: bit_length of the minimal binary string.
    DuckDB's to_base(n, 2) renders the same minimal binary form."""
    return f"CAST(length(to_base(greatest(CAST({expr} AS BIGINT), 1), 2)) - 1 AS BIGINT)"


def corpus_report(
    df: DataFrame,
    group_col: str = "lang",
    size_col: str = "n_chars",
) -> DataFrame:
    """Per-group totals: (group, n_docs, total_size, min_size, max_size)
    — one shuffle, partial aggregation map-side."""
    return (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(size_col)).cast("long").alias("total_size"),
            F.min(F.col(size_col)).cast("long").alias("min_size"),
            F.max(F.col(size_col)).cast("long").alias("max_size"),
        )
    )


def size_histogram(
    df: DataFrame,
    group_col: str = "lang",
    size_col: str = "n_chars",
) -> DataFrame:
    """(group, size_bucket, n_docs) with pinned log2 buckets."""
    return (
        df.select(
            F.col(group_col).alias("grp"),
            size_bucket_col(F.col(size_col)).alias("size_bucket"),
        )
        .groupBy("grp", "size_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
