"""Watermarked event-time windowed aggregation (Structured Streaming).

The reference has no watermark/window semantics (SURVEY §2.7) — this is
part of the engine's *beyond-reference* streaming surface: per-window
extraction-throughput counters over a stream of result/event rows, with
late data bounded by a watermark so state stays finite at 10^12-row
scale.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_windowed_counts(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    available_now: bool = True,
):
    """Stream (parquet dir of event rows) -> tumbling-window counts with a
    watermark; append mode emits each window once it is final."""
    ev = spark.readStream.schema(schema).parquet(input_path)
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), "n")
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sessionize(
    events,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "5 minutes",
    value_col: str = "value",
):
    """Session windows per user: events within ``gap`` of each other merge
    into one session (Spark ``session_window`` — session end = last event
    time + gap, the engine-standard convention). Batch form; pass a
    watermarked streaming frame for the streaming form (same expression —
    session_window is supported in Structured Streaming with watermarks).

    Returns (user, session_start, session_end, n_events, value_cents) —
    the value sum is integer cents, the repo's exact-aggregate pattern.

    Scale shape: ONE shuffle on (user, session_window) — Spark merges
    overlapping candidate sessions inside the aggregation; no window
    function, no per-user sort of the whole history.
    """
    return (
        events.groupBy(
            F.col(user_col).alias("user"),
            F.session_window(F.col(ts_col), gap).alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias(
                "value_cents"
            ),
        )
        .select(
            "user",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "value_cents",
        )
    )
