"""Link-graph analytics: quantized PageRank over a (src, dst) edge table
— the authority job that consumes urls.outlink_host_edges' output.

Iterative algorithms are normally the hardest class to cross-check
(float accumulation order differs run-to-run and engine-to-engine), so
this PageRank is ALL-INTEGER — the repo's quantized-scoring discipline
applied to iteration:

    init      r_v  = scale // N
    share_v   = r_v // outdeg_v                  (per round)
    inc_v     = sum of shares over in-edges      (exact int sum —
                                                  order-independent)
    r_v'      = ((den-num) * (scale // N)) // den
                + (num * inc_v) // den           (num/den = 85/100)

Every operation is integer floor division / multiplication / addition,
so the rank vector after k rounds is bit-identical in any engine —
DuckDB reproduces it with k chained CTEs. Dangling-mass is the standard
simplified treatment (rank flowing into sink nodes leaks; totals are
not renormalized) — documented, identical on both sides.

Scale shape: per round one join (edges x ranks — ranks is (node, long),
never wide rows) + one aggregation; lineage stays LINEAR because each
round's frame is persisted and fully materialized (count) before the
previous cache drops — the dup_clusters discipline. Rounds are a fixed
small constant (authority scores converge geometrically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE = 10**12


def pagerank_quantized(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    scale: int = DEFAULT_SCALE,
    damp_num: int = 85,
    damp_den: int = 100,
    n_nodes: int | None = None,
) -> DataFrame:
    """(node, rank_q) after ``iters`` rounds — rank_q is an exact BIGINT.

    ``n_nodes`` skips the count job when the caller knows it."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    if n_nodes is None:
        n_nodes = nodes.count()
    else:
        nodes.count()  # materialize the cache either way
    init = int(scale) // int(n_nodes)
    base = ((damp_den - damp_num) * init) // damp_den

    e_deg = e.join(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")), "src"
    ).persist()
    e_deg.count()

    ranks = nodes.select(
        "node", F.lit(init).cast("long").alias("rank")
    ).persist()
    ranks.count()
    for _ in range(int(iters)):
        contrib = (
            e_deg.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("rank div deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("inc"))
        )
        new_ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damp_num} * coalesce(inc, 0L)) div {damp_den}")
                ).cast("long").alias("rank"),
            )
            .persist()
        )
        new_ranks.count()  # fully materialize BEFORE dropping the old cache
        ranks.unpersist()
        ranks = new_ranks
    e_deg.unpersist()
    nodes.unpersist()
    from jarvis_ocr_service_spark.plans.caching import attach_cached

    return attach_cached(
        ranks.select("node", F.col("rank").alias("rank_q")), [ranks]
    )
