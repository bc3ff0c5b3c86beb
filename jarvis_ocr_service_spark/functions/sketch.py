"""Count-min sketch — the bounded-memory frequency summary
(Cormode & Muthukrishnan 2005) a trillion-token pipeline uses where an
exact vocabulary table no longer fits: heavy-hitter screening,
per-increment frequency merging (sketches ADD cell-wise), join-free
frequency probes.

DETERMINISTIC hash family — the repo's salted-md5 signed-int64 family
(functions/sampling) with per-row salts ``cms{r}#`` — so the sketch is
value-exact in any engine (no per-session random seeds): cell(r, token)
= pmod(shifted_hash(token, cms{r}), width). Counters are exact integer
sums; the classic guarantee holds: a point estimate = min over rows of
its cell NEVER undercounts, overcounts only by colliding mass
(~ total/width per row, amortized).

Scale shape: build = one token explode (map) x depth cell projections
(map, a union of depth explodes is avoided — depth rides an inline
array) -> ONE groupBy shuffle whose payload is AT MOST depth x width
rows regardless of corpus size (that bound is the whole point).
Probe = a broadcast-sized join or a driver-side literal lookup.

Reference parity note: no counterpart in the reference; the brief's
"novel sketch" slot (SURVEY §2 "beyond the reference").
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.sampling import (
    _shifted,
    shifted_hash_duck_sql,
)
from jarvis_ocr_service_spark.functions.tokens import py_tokens_col as _tokens


def _cell(col, row: int, width: int):
    """Column expr: the row-``row`` bucket of a token column."""
    return F.pmod(_shifted(col, f"cms{row}"), F.lit(int(width))).cast("long")


def cms_build(
    df: DataFrame,
    text_col: str = "text",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Build the sketch over a corpus's token stream: returns the SPARSE
    cell table ``(row, bucket, n)`` (zero cells omitted) — at most
    depth x width rows. Sketches over corpus increments merge by
    unioning cell tables and summing ``n`` per (row, bucket): the
    sketch is a monoid, which is what makes it the incremental-ingest
    frequency summary."""
    if width < 1 or depth < 1:
        raise ValueError("width and depth must be >= 1")
    tok = df.select(F.explode(_tokens(F.col(text_col))).alias("token"))
    cells = F.array(
        *[
            F.struct(
                F.lit(r).cast("long").alias("row"),
                _cell(F.col("token"), r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        tok.select(F.explode(cells).alias("_c"))
        .select(F.col("_c.row").alias("row"), F.col("_c.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    tokens: Sequence[str],
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-estimate the frequency of each query token against a built
    sketch: ``(token, est)`` with est = min over rows of the token's
    cell (0 if a cell is absent — absent means the exact count there is
    0, so the min is 0). NEVER undercounts the true frequency.

    The (token, row, bucket) probe table is built driver-side from the
    literal query list (bounded: |tokens| x depth rows) and joined
    UNHINTED against the sketch."""
    if not tokens:
        raise ValueError("tokens must be non-empty")
    spark = sketch.sparkSession
    probe = spark.createDataFrame(
        [(t, r) for t in dict.fromkeys(tokens) for r in range(depth)],
        "token string, row long",
    )
    # per-row salts differ: pick the row's bucket via a CASE over the
    # bounded depth (pure codegen, no Python)
    bucket = None
    for r in range(depth):
        c = _cell(F.col("token"), r, width)
        bucket = c if bucket is None else F.when(F.col("row") == r, c).otherwise(bucket)
    probe = probe.withColumn("bucket", bucket)
    joined = probe.join(sketch, ["row", "bucket"], "left").select(
        "token", "row", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n")
    )
    return (
        joined.groupBy("token")
        .agg(F.min("n").cast("long").alias("est"))
    )


def cms_cell_duck_sql(token_expr: str, row: int, width: int) -> str:
    """EXACT DuckDB mirror of one sketch cell (nonnegative pmod of the
    shifted hash — SQL % is sign-preserving, so add-then-mod)."""
    h = shifted_hash_duck_sql(token_expr, f"cms{row}")
    w = int(width)
    return f"CAST(((({h}) % {w}) + {w}) % {w} AS BIGINT)"
