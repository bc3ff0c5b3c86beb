"""Temporal joins Spark's DataFrame API lacks as primitives: as-of join
and bucketed range join — the event-enrichment operators a crawl/event
pipeline needs (attach the latest quote/config/state to each event;
attach interval membership) expressed as compositions of existing
DataFrame ops with scale-correct plans, per the brief's custom-operator
ladder (composition first, Pandas UDF only if semantics demand).

AS-OF JOIN (backward, inclusive): for each left row, the right row with
the LARGEST right ts <= left ts within the same key group — DuckDB's
``ASOF JOIN`` semantics, which is exactly what the oracle uses.

Plan shape: the union-and-running-last trick. Tag both sides, union,
one shuffle+sort on (keys, ts, side_tag), then a running
``last(value, ignorenulls=True)`` over a growing frame — O(n log n)
for the sort, O(n) for the frame, ONE shuffle total. The naive
alternative (theta-join on ts <= ts + window per key) is a
BroadcastNestedLoopJoin — quadratic per key. At equal timestamps the
right row sorts BEFORE the left row (tag order), making the match
inclusive. Right rows should be unique per (keys, ts) — with
duplicates the LAST in (deterministic) column order wins; pinned but
callers should dedup first for portable oracles.

RANGE JOIN (point-in-interval): left.ts BETWEEN right.start AND
right.end. Spark's planner turns the raw predicate into a
nested-loop/cartesian; the scale path buckets the time axis: each
interval explodes into the fixed-width buckets it covers, the point
joins its single bucket (equi-join!), and the exact predicate filters
inside the bucket. A (left, right) pair can only meet in the left
point's own bucket, so no dedup is needed. Explode factor =
interval_len / bucket_width — size the bucket near the typical
interval length.

Reference parity note: the reference service has no temporal joins;
this is part of the training-data layer (SURVEY §2 "beyond the
reference").
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: Sequence[str] = (),
    right_cols: Optional[List[str]] = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward-inclusive as-of join (module docstring). Returns every
    left row + the matched right row's ``ts`` and ``right_cols`` (all
    suffixed); nulls when no right row precedes the left row."""
    by = list(by)
    rc = right_cols or [c for c in right.columns if c not in by + [ts_col]]
    left_cols = [c for c in left.columns if c not in by]

    # NULL-ts handling (pinned to the DuckDB ASOF oracle, ADVICE r4):
    # `t.ts >= q.ts` never matches a NULL, but a nulls-first ascending
    # sort would place a NULL-ts right row before every left row and
    # make it the running-last match for early left rows — silent
    # semantic drift. Drop NULL-ts right rows up front; NULL-ts left
    # rows stay (they sort first, before any right row, so they get
    # the correct no-match nulls).
    right = right.filter(F.col(ts_col).isNotNull())

    r_struct = F.struct(
        F.col(ts_col), *[F.col(c) for c in rc]
    )
    r_type = right.select(r_struct.alias("_rv")).schema["_rv"].dataType
    l_struct = F.struct(*[F.col(c) for c in left_cols])
    l_type = left.select(l_struct.alias("_lv")).schema["_lv"].dataType

    l2 = left.select(
        *by,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_is_l"),
        l_struct.alias("_lv"),
        F.lit(None).cast(r_type).alias("_rv"),
    )
    r2 = right.select(
        *by,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_is_l"),
        F.lit(None).cast(l_type).alias("_lv"),
        r_struct.alias("_rv"),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("_ts", "_is_l")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l2.unionByName(r2)
        .withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_is_l") == 1)
    )
    out_cols = (
        [F.col(b) for b in by]
        + [F.col(f"_lv.{c}").alias(c) for c in left_cols]
        + [F.col(f"_m.{ts_col}").alias(f"{ts_col}{suffix}")]
        + [F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in rc]
    )
    return matched.select(*out_cols)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket: int,
    by: Sequence[str] = (),
) -> DataFrame:
    """Inner join on ``left.point BETWEEN right.start AND right.end``
    (inclusive both ends; numeric LONG columns — convert timestamps
    with ``F.unix_micros`` first). One equi-join on (keys, bucket); see
    module docstring for why this beats the planner's nested loop."""
    if bucket <= 0:
        raise ValueError("bucket must be a positive width")
    by = list(by)
    lb = left.withColumn(
        "_b", F.floor(F.col(point_col) / F.lit(int(bucket))).cast("long")
    )
    rb = (
        right.withColumn(
            "_bs", F.floor(F.col(start_col) / F.lit(int(bucket))).cast("long")
        )
        .withColumn(
            "_be", F.floor(F.col(end_col) / F.lit(int(bucket))).cast("long")
        )
        .filter(F.col(start_col) <= F.col(end_col))
        .withColumn("_b", F.explode(F.sequence(F.col("_bs"), F.col("_be"))))
        .drop("_bs", "_be")
    )
    joined = lb.join(rb, by + ["_b"]).filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("_b")


def with_change_flags(
    df: DataFrame,
    key_col: str = "url",
    ts_col: str = "ts",
    value_col: str = "digest",
) -> DataFrame:
    """Recrawl change detection: per key, order snapshots by (ts, value)
    and flag whether each snapshot's value differs from the previous one
    (``changed`` true for the first snapshot too — a new page IS a
    change). The crawl-scheduling primitive: change rate per url drives
    recrawl frequency, and ``filter(~changed)`` drops no-op recrawls
    before extraction.

    The (ts, value) secondary sort makes equal-timestamp snapshots
    deterministic; NULL values compare null-safely (NULL -> NULL is
    "unchanged", NULL -> x is a change), and the first snapshot is
    detected by row number, not by a NULL-prev sentinel a NULL value
    could fake. ONE shuffle on the key (the window's partition); state
    is nothing — this is a batch lag, the streaming twin is the digest
    dropDuplicatesWithinWatermark in streaming/stream.py."""
    w = Window.partitionBy(key_col).orderBy(ts_col, value_col)
    prev = F.lag(F.col(value_col)).over(w)
    first = F.row_number().over(w) == 1
    return df.withColumn(
        "changed",
        first | ~F.col(value_col).eqNullSafe(prev),
    )


def rate_anomalies(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_sec: int = 3600,
    k2: tuple = (9, 1),
) -> DataFrame:
    """Per-key event-rate burst detection — the crawl/bot-burst flagger:
    bucket each key's events into tumbling ``window_sec`` windows and
    flag windows whose count deviates from the key's own mean by more
    than k standard deviations. ALL-INTEGER via the cleared-denominator
    z-square test (``k2 = (num, den)`` is k² as a rational; default
    (9,1) = 3 sigma):

        flag  <=>  (W*n - S)^2 * den  >  num * (W*SS - S^2)

    where per key W = #windows with events, S = sum of counts, SS = sum
    of squared counts (exactly z^2 > k^2 with z over the key's observed
    windows — empty windows are NOT imputed; the statistic is over
    windows that saw traffic, the form burst detection wants at crawl
    scale where almost all (key, window) cells are empty). Keys with
    W = 1 or zero variance flag nothing (their variance term is 0 and
    the inequality is strict). Returns ``(key, win_start_us, n,
    flagged)`` for every observed window.

    Overflow envelope (BIGINT): needs (W*n)^2 * den < 2^63 — i.e.
    W * max_n < 3e9 / sqrt(den) PER KEY; any real per-key traffic fits
    (document-wide totals never enter the arithmetic).

    Plan: ONE (key, window) partial-agg count shuffle, ONE key-level
    aggregate of (W, S, SS), then an UNHINTED join back (AQE
    broadcasts the key table when it fits) and a codegen flag. Both
    shuffled payloads are counts, never events."""
    num, den = int(k2[0]), int(k2[1])
    if num < 0 or den < 1:
        raise ValueError("k2 must be a nonnegative rational (num, den>=1)")
    if window_sec < 1:
        raise ValueError("window_sec must be >= 1")
    us = int(window_sec) * 1_000_000
    # integer div, NOT floor(double /) — epoch micros sit near 2^50 and
    # a double quotient can round across a window boundary
    win = (
        F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) div {us}")
        .cast("long")
        .alias("_w")
    )
    counts = (
        df.select(F.col(key_col).alias("key"), win)
        .groupBy("key", "_w")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    stats = counts.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("_nw"),
        F.sum("n").cast("long").alias("_S"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("_SS"),
    )
    dev = F.col("_nw") * F.col("n") - F.col("_S")
    var_num = F.col("_nw") * F.col("_SS") - F.col("_S") * F.col("_S")
    return (
        counts.join(stats, "key")
        .select(
            "key",
            (F.col("_w") * us).alias("win_start_us"),
            "n",
            (dev * dev * F.lit(den) > F.lit(num) * var_num).alias("flagged"),
        )
    )
