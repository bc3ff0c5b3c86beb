"""Quantized TF-IDF lexical top-k: brute-force parity, plan shape."""

from collections import Counter

import pytest

from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.lexsearch import (
    build_term_index,
    tfidf_topk_quantized,
)

DOCS = [
    (0, "apple banana apple cherry"),
    (1, "banana banana banana"),
    (2, "cherry date elderberry"),
    (3, "apple apple apple apple date"),
    (4, "fig grape"),
    (5, ""),
    (6, "APPLE Banana"),  # case-folded
]


def brute(query, docs, scale=1_000_000, k=10):
    terms = sorted({t for t in query.lower().split() if t})
    n = len(docs)
    tf = {}
    df = Counter()
    for key, text in docs:
        c = Counter(w for w in text.lower().split() if w in terms)
        if c:
            tf[key] = c
            for t in c:
                df[t] += 1
    scores = {
        key: sum(cnt * (scale * n // df[t]) for t, cnt in c.items())
        for key, c in tf.items()
    }
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_brute_force(docs_df):
    got = [(r.key, r.score) for r in tfidf_topk_quantized(docs_df, "apple banana").collect()]
    assert got == brute("apple banana", DOCS)


def test_rare_term_outweighs_common(docs_df):
    # 'fig' appears in 1 doc, 'banana' in 3 -> doc 4 must beat any
    # single-banana doc for the query 'fig banana'
    got = [r.key for r in tfidf_topk_quantized(docs_df, "fig banana").collect()]
    assert got[0] in (1, 4)  # 3x banana vs 1x fig — check exact below
    exp = [k for k, _ in brute("fig banana", DOCS)]
    assert got == exp


def test_n_docs_param_skips_count(docs_df):
    a = tfidf_topk_quantized(docs_df, "apple", n_docs=7).collect()
    b = tfidf_topk_quantized(docs_df, "apple").collect()
    assert [(r.key, r.score) for r in a] == [(r.key, r.score) for r in b]


def test_empty_query_raises(docs_df):
    with pytest.raises(ValueError):
        tfidf_topk_quantized(docs_df, "   ")


def test_full_index_form(docs_df):
    idx = build_term_index(docs_df)
    rows = {(r.key, r.term): r.tf for r in idx.collect()}
    assert rows[(3, "apple")] == 4
    assert rows[(6, "apple")] == 1  # lowercased
    assert (5, "") not in rows


def test_plan_filters_before_agg_and_broadcasts_idf(docs_df):
    """The query-term filter must sit below the (key, term) aggregation
    (tiny agg input at 10^12 rows) and the idf join must broadcast."""
    plan = (
        tfidf_topk_quantized(docs_df, "apple banana")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    # TakeOrdered (top-k) rather than a global sort
    assert "TakeOrderedAndProject" in plan, plan
