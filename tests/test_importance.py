"""DSIR importance weighting: exact pure-Python parity, planted
target-affinity ranking, edge cases."""

import hashlib

import pytest
from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.importance import dsir_weights

SF = "/root/testdata/sf0.001"


def _bucket_py(gram: str, n_buckets: int, salt: str = "dsir") -> int:
    h = hashlib.md5(f"{salt}#{gram}".encode()).hexdigest()
    hi, lo = int(h[:8], 16), int(h[8:16], 16)
    return ((hi - (1 << 31)) * (1 << 32) + lo) % n_buckets


def _grams_py(text: str, n_buckets: int) -> list:
    toks = (text or "").lower().split()
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [_bucket_py(g, n_buckets) for g in grams]


def _dsir_py(raw_rows, target_rows, n_buckets):
    """Pure-Python mirror of dsir_weights (the oracle's oracle)."""
    c_raw, c_tgt = {}, {}
    for _, text in raw_rows:
        for b in _grams_py(text, n_buckets):
            c_raw[b] = c_raw.get(b, 0) + 1
    for _, text in target_rows:
        for b in _grams_py(text, n_buckets):
            c_tgt[b] = c_tgt.get(b, 0) + 1

    def bl(x):
        return x.bit_length() - 1

    out = {}
    for key, text in raw_rows:
        bs = _grams_py(text, n_buckets)
        w = sum(bl(c_tgt.get(b, 0) + 1) - bl(c_raw[b] + 1) for b in bs)
        out[key] = (len(bs), w)
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "quantum flux capacitor resonance"),
        (1, "quantum flux capacitor alignment"),
        (2, "buy cheap deals now buy cheap deals now"),
        (3, "buy cheap deals now buy now"),
        (4, "buy cheap now deals cheap"),
        (5, ""),
        (6, None),
        (7, "quantum resonance"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_pure_python_mirror(spark, corpus):
    target = corpus.filter(F.col("doc_id").isin(0, 1))
    got = {
        r.key: (r.n_grams, r.weight)
        for r in dsir_weights(corpus, target, n_buckets=64).collect()
    }
    rows = [(r.doc_id, r.text) for r in corpus.collect()]
    exp = _dsir_py(rows, [r for r in rows if r[0] in (0, 1)], 64)
    assert got == exp


def test_target_like_docs_outrank_spam(spark, corpus):
    target = corpus.filter(F.col("doc_id").isin(0, 1))
    w = {
        r.key: r.weight
        for r in dsir_weights(corpus, target, n_buckets=4096).collect()
    }
    # doc 7 shares its vocabulary with the target; docs 2-4 share none
    assert w[7] > max(w[2], w[3], w[4])


def test_zero_gram_docs_report_zero(spark, corpus):
    target = corpus.filter(F.col("doc_id") == 0)
    got = {
        r.key: (r.n_grams, r.weight)
        for r in dsir_weights(corpus, target).collect()
    }
    assert got[5] == (0, 0)
    assert got[6] == (0, 0)


def test_gram_count_is_tokens_plus_bigrams(spark, corpus):
    target = corpus.filter(F.col("doc_id") == 0)
    got = {r.key: r.n_grams for r in dsir_weights(corpus, target).collect()}
    assert got[0] == 4 + 3
    assert got[7] == 2 + 1


def test_deterministic_across_runs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    target = docs.filter(F.col("doc_id") % 10 == 0)
    a = sorted(map(tuple, dsir_weights(docs, target, n_buckets=512).collect()))
    b = sorted(map(tuple, dsir_weights(docs, target, n_buckets=512).collect()))
    assert a == b
    assert len(a) == docs.count()


def test_invalid_buckets_raises(spark, corpus):
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_weights(corpus, corpus, n_buckets=0)
