"""Spark schemas for the pages input, results output, and manifest tables."""

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Input — exactly the BASELINE.json input_hint shape.
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

SPAN_TYPE = StructType(
    [
        StructField("start", LongType(), False),
        StructField("end", LongType(), False),
        StructField("tag", StringType(), False),
    ]
)

# Output of the extraction cascade — the reference's per-image result row
# (worker.py:202-215 / prds queue-flow results[] schema), flattened.
RESULT_FIELDS = StructType(
    [
        StructField("content_kind", StringType(), False),
        StructField("text", StringType(), False),
        StructField("truncated", BooleanType(), False),
        StructField("language", StringType(), True),
        StructField("confidence", DoubleType(), False),
        StructField("text_len", LongType(), False),
        StructField("is_valid", BooleanType(), False),
        StructField("tier", StringType(), False),
        StructField("validation_reason", StringType(), True),
        StructField("error_code", StringType(), True),
        StructField("error_message", StringType(), True),
        StructField("spans", ArrayType(SPAN_TYPE), False),
    ]
)

RESULTS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("lang", StringType(), True),
    ]
    + RESULT_FIELDS.fields
)

# Per-partition checkpoint manifest (north rule: processed-file lineage +
# extraction counters enabling exactly-once resume).
MANIFEST_SCHEMA = StructType(
    [
        StructField("batch_id", LongType(), False),
        StructField("files", ArrayType(StringType()), False),
        StructField("n_rows", LongType(), False),
        StructField("n_valid", LongType(), False),
        StructField("n_error", LongType(), False),
        StructField("n_truncated", LongType(), False),
        StructField("committed_at", TimestampType(), False),
        StructField("run_id", StringType(), False),
    ]
)
