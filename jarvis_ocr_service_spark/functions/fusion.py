"""Hybrid retrieval fusion: reciprocal-rank fusion (RRF) of ranked
candidate lists — the standard way LLM data pipelines combine a lexical
retriever (BM25) with an embedding retriever (ANN) for benchmark
mining, hard-negative selection, and retrieval-augmented filtering
(Cormack et al. 2009: RRF outperforms either system alone and any
score-normalization scheme, using ONLY ranks).

ALL-INTEGER scoring so any engine reproduces it bit-for-bit: the
real-valued RRF term 1/(k + rank) becomes

    contrib(rank) = scale // (k_const + rank)      (integer floor)
    rrf_q(doc)    = sum of contrib over the systems that ranked it

with ``scale`` large enough (default 10^9) that distinct ranks map to
distinct contributions at any practical k_const. Ties break on key —
a total order, engine-exact.

Scale shape: RRF operates on top-``depth`` candidate LISTS, not the
corpus — each input is already the bounded output of a retriever's
TakeOrderedAndProject (depth rows, a few hundred at most). The
row_number window over such a list is a single task over ``depth``
rows BY CONSTRUCTION (this is the one place a no-partition window is
right: the data was globally ranked by the retriever already; re-deriving
rank costs O(depth log depth) on one core). The fuse itself is a union
of tiny frames + one groupBy on key. Nothing here touches corpus-sized
data — the retrievers (lexsearch.bm25_topk_quantized,
simsearch.quantized_dot_topk / ivf_topk_quantized) own that scale.

Reference parity note: the reference service has no retrieval layer;
this is part of the training-data mining tier (SURVEY §2 "beyond the
reference"), composing the oracled BM25 and quantized-dot retrievers.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_RRF_K = 60  # Cormack et al.'s k; dampens the head of each list
DEFAULT_RRF_SCALE = 10**9


def topk_ranks(
    df: DataFrame,
    score_col: str,
    key_col: str,
) -> DataFrame:
    """Attach the 1-based rank (score desc, key asc — total order) to a
    BOUNDED top-k candidate list. Precondition: ``df`` is a retriever's
    top-k output (<= a few hundred rows); the no-partition window is a
    single task over that bounded list, which is exactly the right plan
    (see module docstring)."""
    w = Window.orderBy(F.desc(score_col), F.col(key_col))
    return df.select(
        F.col(key_col).alias("key"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k_const: int = DEFAULT_RRF_K,
    scale: int = DEFAULT_RRF_SCALE,
    topk: int = 10,
) -> DataFrame:
    """Fuse ranked lists by integer RRF. Each input frame carries
    ``(key, rank)`` with rank 1-based and unique within its list
    (:func:`topk_ranks` output shape). Returns the fused top
    ``topk``: ``(key, rrf_q, n_systems)`` — rrf_q the integer RRF
    score, n_systems how many lists ranked the key (a useful
    confidence signal: agreement beats a single high rank). Keys
    missing from a list simply contribute nothing for it."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if k_const < 0 or scale < 1 or topk < 1:
        raise ValueError("k_const >= 0, scale >= 1, topk >= 1 required")
    contrib = F.expr(f"CAST({int(scale)} AS BIGINT) div ({int(k_const)} + rank)")
    tagged = [r.select("key", contrib.alias("_c")) for r in rankings]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    return (
        u.groupBy("key")
        .agg(
            F.sum("_c").cast("long").alias("rrf_q"),
            F.count(F.lit(1)).cast("long").alias("n_systems"),
        )
        .orderBy(F.desc("rrf_q"), F.col("key"))
        .limit(int(topk))
    )


def hybrid_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query: str,
    query_vec: List[float],
    k: int = 10,
    depth: int = 50,
    k_const: int = DEFAULT_RRF_K,
    scale: int = DEFAULT_RRF_SCALE,
    text_col: str = "text",
    key_col: str = "doc_id",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Hybrid lexical+semantic retrieval: BM25 top-``depth`` over
    ``docs`` fused with quantized-dot top-``depth`` over ``embeddings``
    (same id space) by integer RRF; returns the fused top ``k`` as
    ``(key, rrf_q, n_systems)``. Both retrievers and the fusion are
    all-integer, so the composition is oracle-exact end-to-end."""
    from jarvis_ocr_service_spark.functions.lexsearch import bm25_topk_quantized
    from jarvis_ocr_service_spark.functions.simsearch import quantized_dot_topk

    bm = bm25_topk_quantized(docs, query, text_col=text_col, key_col=key_col, k=depth)
    ann = quantized_dot_topk(
        embeddings, query_vec, k=depth, vec_col=vec_col, id_col=id_col
    )
    return rrf_fuse(
        [
            topk_ranks(bm, "score", "key"),
            topk_ranks(ann, "dot_q", id_col),
        ],
        k_const=k_const,
        scale=scale,
        topk=k,
    )
