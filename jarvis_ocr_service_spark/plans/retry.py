"""Retry flow: attempt-tracked reprocessing of transiently-failed rows.

Reference semantics (/root/reference/worker.py:29-51, 385-391;
prds/queue-flow.md:438-465): on failure, re-enqueue to the *back* of the
queue with ``attempt+1``, retry only transient error codes, give up at 3
attempts. In the engine, Spark task retries already cover executor-level
transients; this module covers *data-plane* retries (e.g. a flaky external
tier): failed rows are selected by the same taxonomy, stamped with
``attempt+1``, and re-run — "back of the queue" becomes "a later pass",
which is exactly what the requeue achieved.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jarvis_ocr_service_spark.config import (
    MAX_ATTEMPTS,
    NON_RETRYABLE_CODES,
    RETRYABLE_CODES,
)


def should_retry_col(error_code, attempt):
    """Column form of config.should_retry (worker.py:29-51)."""
    return (
        (attempt < F.lit(MAX_ATTEMPTS))
        & ~error_code.isin(NON_RETRYABLE_CODES)
        & error_code.isin(RETRYABLE_CODES)
    )


def split_retryable(results: DataFrame, attempt_col: str = "attempt"):
    """(final_rows, retry_rows): retry_rows carry attempt+1."""
    attempt = F.col(attempt_col) if attempt_col in results.columns else F.lit(1)
    # NULL error_code (success rows) must flag False, not NULL — a bare
    # filter(~NULL) would silently drop the row from both branches.
    flagged = results.withColumn(
        "_retry",
        F.coalesce(should_retry_col(F.col("error_code"), attempt), F.lit(False)),
    )
    final = flagged.filter(~F.col("_retry")).drop("_retry")
    retry = (
        flagged.filter(F.col("_retry"))
        .drop("_retry")
        .withColumn(attempt_col, attempt + 1)
    )
    return final, retry


def run_with_retries(
    pages: DataFrame,
    pipeline_fn: Callable[[DataFrame], DataFrame],
    max_attempts: int = MAX_ATTEMPTS,
    join_key: Union[str, List[str], None] = None,
) -> DataFrame:
    """Run the pipeline, re-running rows whose error is retryable, up to
    ``max_attempts`` passes. Deterministic pipelines converge on pass 1;
    the loop exists for tiers with transient external failures.

    ``join_key`` defaults to ``(url, warc_ts)`` — url alone is not a row
    key in a crawl that holds multiple snapshots of one url."""
    if join_key is None:
        join_key = ["url", "warc_ts"] if "warc_ts" in pages.columns else ["url"]
    keys = [join_key] if isinstance(join_key, str) else list(join_key)
    results = pipeline_fn(pages).withColumn("attempt", F.lit(1))
    final, retry = split_retryable(results)
    out = [final]
    attempt = 1
    while attempt < max_attempts:
        if retry.isEmpty():
            break
        attempt += 1
        from jarvis_ocr_service_spark.plans.pipeline import join_on_row_key

        again = join_on_row_key(retry.select(*keys), pages, keys)
        results = pipeline_fn(again).withColumn("attempt", F.lit(attempt))
        final, retry = split_retryable(results)
        out.append(final)
    all_final = out[0]
    for df in out[1:]:
        all_final = all_final.unionByName(df)
    # rows still retryable after the budget are emitted as-is (failed)
    return all_final.unionByName(retry) if attempt >= max_attempts else all_final
