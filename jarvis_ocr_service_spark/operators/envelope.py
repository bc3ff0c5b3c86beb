"""Queue-envelope validation (F1/F2/F3): the reference's message-schema
rules (/root/reference/app/queue_schemas.py:15-120) as Column expressions.

Rules (each -> its own boolean column, then one error verdict):
  * schema_version == 1
  * job_type == 'ocr.extract_text.requested'
  * created_at parses as ISO-8601
  * attempt >= 1
  * reply_to non-empty
  * image_refs: 1..8 items, kinds in {local_path,s3,minio}, indices
    unique and >= 0
  * image_count consistent, derived from len(refs) when absent
  * options.language non-empty when present

Schema violations are never retried (worker.py:345-357) — the verdict
column carries ``schema_invalid`` and the row routes to the error branch,
the job-level analog of per-row failure isolation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_KINDS = ("local_path", "s3", "minio")  # 'db' rejected (resolver S8)
EXPECTED_JOB_TYPE = "ocr.extract_text.requested"


def validate_envelope(jobs: DataFrame) -> DataFrame:
    """Append rule columns + ``error_code`` ('schema_invalid' | null) +
    ``invalid_reason`` (first failed rule, <=200 chars).

    Expects columns: schema_version, job_type, created_at (string),
    attempt, reply_to, ref_kinds (array<string>), ref_indices
    (array<long|int>), image_count (nullable), options_language (nullable).
    """
    n_refs = F.size("ref_kinds")
    checks = [
        ("bad_schema_version", F.col("schema_version") != 1),
        ("bad_job_type", F.col("job_type") != EXPECTED_JOB_TYPE),
        ("bad_created_at", F.try_to_timestamp(
            F.regexp_replace(F.col("created_at"), "Z$", "+00:00")
        ).isNull()),
        ("bad_attempt", F.coalesce(F.col("attempt"), F.lit(0)) < 1),
        ("bad_reply_to", F.coalesce(F.col("reply_to"), F.lit("")) == ""),
        ("bad_ref_count", ~n_refs.between(1, 8)),
        ("bad_ref_kind",
         F.size(F.filter("ref_kinds", lambda k: ~k.isin(*VALID_KINDS))) > 0),
        ("bad_ref_index",
         (F.size(F.array_distinct("ref_indices")) != F.size("ref_indices"))
         | (F.size(F.filter("ref_indices", lambda i: i < 0)) > 0)),
        ("bad_image_count",
         F.coalesce(F.col("image_count"), n_refs.cast("long")) != n_refs.cast("long")),
        ("bad_language",
         F.col("options_language").isNotNull() & (F.col("options_language") == "")),
    ]
    out = jobs
    for name, cond in checks:
        out = out.withColumn(name, F.coalesce(cond, F.lit(True)))
    any_bad = None
    reason = F.lit(None).cast("string")
    for name, _ in reversed(checks):
        reason = F.when(F.col(name), F.lit(name)).otherwise(reason)
        any_bad = F.col(name) if any_bad is None else (F.col(name) | any_bad)
    return out.withColumn(
        "error_code", F.when(any_bad, F.lit("schema_invalid"))
    ).withColumn("invalid_reason", F.substring(reason, 1, 200))
