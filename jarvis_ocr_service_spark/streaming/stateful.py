"""Stateful streaming: the pending-validation state machine, faithfully.

The reference parks per-image validation state in Redis with a 300s TTL
(/root/reference/app/validation_state.py:11-76) while an async validator
round-trips, then a callback resumes the job: valid -> next image,
invalid -> next tier, last image -> completion
(app/continue_processing.py:441-520). In-engine the validator is local,
so the batch pipeline needs none of this — but when validation IS an
external stream (e.g. a human-review or model-scoring service), the
faithful Spark mapping is ``applyInPandasWithState``:

  * key: job_id
  * input stream: per-image validation verdicts (job_id, image_index,
    is_valid, n_images)
  * state: verdicts accumulated so far (the reference's
    ``processed_results`` cursor)
  * emit: one completion row when all images have reported
    (status = any-valid rule) — or on state timeout (the 300s TTL),
    status computed from whatever arrived (fail-open, P5).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PENDING_TTL_MS = 300_000  # reference validation_state.py:41

VERDICTS_SCHEMA = "job_id string, image_index long, is_valid boolean, n_images long"

COMPLETION_SCHEMA = StructType(
    [
        StructField("job_id", StringType(), False),
        StructField("status", StringType(), False),
        StructField("n_received", LongType(), False),
        StructField("n_expected", LongType(), False),
        StructField("n_valid", LongType(), False),
        StructField("timed_out", StringType(), False),  # 'true'/'false'
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("received", LongType(), False),
        StructField("valid", LongType(), False),
        StructField("expected", LongType(), False),
    ]
)


def accumulate_verdicts(
    key: Tuple[str], pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState function: fold verdicts into per-job state,
    emit the completion exactly once (all-arrived or TTL timeout)."""
    (job_id,) = key

    if state.hasTimedOut:
        received, valid, expected = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "job_id": job_id,
                    "status": "success" if valid > 0 else "failed",
                    "n_received": received,
                    "n_expected": expected,
                    "n_valid": valid,
                    "timed_out": "true",
                }
            ]
        )
        return

    received, valid, expected = state.get if state.exists else (0, 0, 0)
    for pdf in pdf_iter:
        received += len(pdf)
        valid += int(pdf["is_valid"].sum())
        expected = max(expected, int(pdf["n_images"].max()))

    if expected > 0 and received >= expected:
        if state.exists:
            state.remove()
        yield pd.DataFrame(
            [
                {
                    "job_id": job_id,
                    "status": "success" if valid > 0 else "failed",
                    "n_received": received,
                    "n_expected": expected,
                    "n_valid": valid,
                    "timed_out": "false",
                }
            ]
        )
    else:
        state.update((received, valid, expected))
        state.setTimeoutDuration(PENDING_TTL_MS)
        yield pd.DataFrame(
            {
                "job_id": pd.Series([], dtype=object),
                "status": pd.Series([], dtype=object),
                "n_received": pd.Series([], dtype="int64"),
                "n_expected": pd.Series([], dtype="int64"),
                "n_valid": pd.Series([], dtype="int64"),
                "timed_out": pd.Series([], dtype=object),
            }
        )


def run_pending_validation_stream(
    spark, input_path: str, output_path: str, checkpoint_path: str,
    available_now: bool = True,
):
    """Stream per-image verdicts (parquet dir) -> per-job completions."""
    verdicts = spark.readStream.schema(VERDICTS_SCHEMA).parquet(input_path)
    completions = verdicts.groupBy("job_id").applyInPandasWithState(
        accumulate_verdicts,
        outputStructType=COMPLETION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
    writer = (
        completions.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
