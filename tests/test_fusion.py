"""Integer RRF fusion (functions/fusion.py): brute-force parity,
agreement semantics, and the hybrid BM25+ANN composition."""

import pytest
from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.fusion import (
    DEFAULT_RRF_K,
    DEFAULT_RRF_SCALE,
    hybrid_topk,
    rrf_fuse,
    topk_ranks,
)


def _brute_rrf(lists, k_const=DEFAULT_RRF_K, scale=DEFAULT_RRF_SCALE, topk=10):
    """lists: each a sequence of keys in rank order (rank 1-based)."""
    agg = {}
    for lst in lists:
        for pos, key in enumerate(lst, start=1):
            s, n = agg.get(key, (0, 0))
            agg[key] = (s + scale // (k_const + pos), n + 1)
    order = sorted(agg, key=lambda k: (-agg[k][0], k))[:topk]
    return {k: agg[k] for k in order}


def test_rrf_brute_parity(spark):
    # two overlapping lists with disagreements and unique tails
    l1 = [5, 3, 8, 1, 9, 2]
    l2 = [3, 7, 5, 2, 4]
    r1 = spark.createDataFrame(
        [(k, i + 1) for i, k in enumerate(l1)], "key long, rank long"
    )
    r2 = spark.createDataFrame(
        [(k, i + 1) for i, k in enumerate(l2)], "key long, rank long"
    )
    got = {
        r.key: (r.rrf_q, r.n_systems)
        for r in rrf_fuse([r1, r2], topk=20).collect()
    }
    assert got == _brute_rrf([l1, l2], topk=20)
    # agreement: key 3 and 5 rank high in both lists -> top-2 fused
    top2 = sorted(got, key=lambda k: (-got[k][0], k))[:2]
    assert set(top2) == {3, 5}
    assert got[7][1] == 1 and got[3][1] == 2


def test_rrf_topk_truncates_totally_ordered(spark):
    l1 = list(range(30))
    r1 = spark.createDataFrame(
        [(k, i + 1) for i, k in enumerate(l1)], "key long, rank long"
    )
    rows = rrf_fuse([r1], topk=5).collect()
    assert [r.key for r in rows] == l1[:5]  # single list: fused == list order


def test_rrf_validation(spark):
    r = spark.createDataFrame([(1, 1)], "key long, rank long")
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([r], k_const=-1)
    with pytest.raises(ValueError):
        rrf_fuse([r], scale=0)
    with pytest.raises(ValueError):
        rrf_fuse([r], topk=0)


def test_topk_ranks_total_order(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 10), (4, 5)], "doc long, s long"
    )
    got = {r.key: r.rank for r in topk_ranks(df, "s", "doc").collect()}
    # score desc, key asc: 2 first, then the tied 1 and 3 by key, then 4
    assert got == {2: 1, 1: 2, 3: 3, 4: 4}


def test_hybrid_topk_brute_parity(spark):
    from jarvis_ocr_service_spark.functions.lexsearch import bm25_topk_quantized
    from jarvis_ocr_service_spark.functions.simsearch import quantized_dot_topk

    docs = [
        (i, " ".join(["scan" if i % 3 == 0 else "merge"] * (2 + i % 4) + ["pad"] * (i % 5)))
        for i in range(40)
    ]
    embs = [(i, [float(i % 7) / 7.0, 1.0 - float(i % 5) / 5.0]) for i in range(40)]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    edf = spark.createDataFrame(embs, "vec_id long, embedding array<float>")
    qvec = embs[0][1]
    got = [
        (r.key, r.rrf_q, r.n_systems)
        for r in hybrid_topk(ddf, edf, "scan merge", qvec, k=8, depth=15).collect()
    ]
    # brute: re-derive both lists from the oracled retrievers themselves
    bm_list = [
        r.key
        for r in bm25_topk_quantized(ddf, "scan merge", k=15)
        .orderBy(F.desc("score"), "key")
        .collect()
    ]
    ann_list = [
        r.vec_id
        for r in quantized_dot_topk(edf, qvec, k=15)
        .orderBy(F.desc("dot_q"), "vec_id")
        .collect()
    ]
    brute = _brute_rrf([bm_list, ann_list], topk=8)
    order = sorted(brute, key=lambda k: (-brute[k][0], k))
    assert got == [(k, *brute[k]) for k in order]
    # both systems genuinely contribute: some fused doc is 2-system
    assert any(n == 2 for _, _, n in got)
