"""Lexical (term-based) retrieval over a document corpus: quantized
TF-IDF top-k, the keyword-side counterpart of functions/simsearch's
embedding ANN.

Scoring is deliberately ALL-INTEGER so it is deterministic and
SQL-oracle-checkable (the repo's quantized-cosine trick applied to
lexical search — no log/float idf whose last-ulp could differ between
engines):

    idf_q(term)  = (scale * n_docs) // df(term)      (integer floor-div)
    score(doc)   = sum over query terms of tf(doc, term) * idf_q(term)

Rarer terms get proportionally larger integer weights (idf_q is
monotone-decreasing in df), tf contributes linearly, ranking is
(score DESC, key ASC) — a BM25-shaped signal with exact arithmetic.
Tokens are lowercased Python-``str.split()`` whitespace tokens (the
repo's pinned py-token class).

Scale shape (the 10^12-row discipline): the exploded token stream is
filtered to the query's terms IMMEDIATELY after the split — the
aggregation only ever sees rows for the handful of query terms, never a
full inverted index. df/idf for those terms is a tiny frame joined back
with an explicit broadcast. For repeated-query workloads, build the
(term, doc, tf) index once with :func:`build_term_index` and reuse it.

Reference parity note: the reference service has no retrieval; this is
part of the training-data layer (SURVEY §2 "beyond the reference").
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.tokens import py_tokens_col

DEFAULT_SCALE = 1_000_000

# Backwards-compatible private alias; the shared definition lives in
# functions/tokens.py (single source — byte-identity invariant).
_py_tokens_col = py_tokens_col


def build_term_index(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    terms: Optional[List[str]] = None,
) -> DataFrame:
    """(key, term, tf) frame. With ``terms``, only those terms survive the
    explode — the cheap single-query path; without, the full index (for
    reuse across many queries — persist or write it)."""
    ex = df.select(
        F.col(key_col).alias("key"),
        F.explode(_py_tokens_col(F.col(text_col))).alias("term"),
    )
    if terms is not None:
        ex = ex.filter(F.col("term").isin([t.lower() for t in terms]))
    return ex.groupBy("key", "term").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_topk_quantized(
    df: DataFrame,
    query: str,
    text_col: str = "text",
    key_col: str = "doc_id",
    k: int = 10,
    scale: int = DEFAULT_SCALE,
    n_docs: Optional[int] = None,
) -> DataFrame:
    """Top-k documents for ``query`` by quantized TF-IDF (module
    docstring). ``n_docs`` skips the count job when the caller knows the
    corpus size. Returns (key, score) — score is an exact BIGINT."""
    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        raise ValueError("empty query")
    if n_docs is None:
        n_docs = df.count()
    index = build_term_index(df, text_col, key_col, terms=terms)
    dfreq = index.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.select(
        "term",
        F.expr(f"CAST({int(scale) * int(n_docs)} AS BIGINT) div df").alias("idf_q"),
    )
    scored = (
        index.join(F.broadcast(idf), "term")
        .groupBy("key")
        .agg(F.sum(F.col("tf") * F.col("idf_q")).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.col("key")).limit(k)


def bm25_topk_quantized(
    df: DataFrame,
    query: str,
    text_col: str = "text",
    key_col: str = "doc_id",
    k: int = 10,
    scale: int = DEFAULT_SCALE,
    k1: tuple = (6, 5),
    b: tuple = (3, 4),
    n_docs: Optional[int] = None,
    total_tokens: Optional[int] = None,
) -> DataFrame:
    """Top-k documents by QUANTIZED BM25 — TF-IDF plus the two things it
    lacks for real training-data mining: tf saturation (k1) and
    document-length normalization (b). All-integer, so the DuckDB oracle
    is value-exact (no float log/div whose last ulp could differ).

    ``k1``/``b`` are RATIONALS (num, den) — defaults (6,5)=1.2 and
    (3,4)=0.75, the textbook values. The real-valued BM25 term

        idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    becomes exact integers by (i) quantizing avgdl once per corpus:
    ``avgdl_q = total_tokens // n_docs`` (floor; >=1), (ii) clearing
    denominators with k1_den*b_den*avgdl_q, and (iii) one floor division
    at the end:

        idf_q   = (scale * (2*(n_docs - df) + 1)) // (2*df + 1)
                  # Robertson idf (N-df+.5)/(df+.5), the *2+1 trick
        num     = tf * (k1n + k1d) * b_den * avgdl_q
        den     = tf * k1d * b_den * avgdl_q
                  + k1n * ((b_den - b_num) * avgdl_q + b_num * dl)
        score   = sum over query terms of (idf_q * num) // den

    Monotonicity matches BM25 exactly: saturating in tf, decreasing in
    dl, decreasing in df. Overflow envelope (BIGINT): needs
    idf_q * num < 2^63, i.e. roughly scale * 2*n_docs * tf * 11 * 4 *
    avgdl_q < 9.2e18 — at 10^12 docs drop ``scale`` to ~10^3 (ranking
    granularity, not correctness, is what scale buys).

    Scale shape = tfidf_topk_quantized's: tokens are exploded and
    filtered to the query's terms IMMEDIATELY (never a full inverted
    index); dl rides along from the same projection so no extra join or
    scan; per-term df/idf is a broadcast; the final top-k is
    orderBy+limit (TakeOrderedAndProject). ``n_docs``/``total_tokens``
    skip the one extra count/sum job when the caller knows them.
    Returns (key, score) — score an exact BIGINT."""
    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        raise ValueError("empty query")
    k1n, k1d = map(int, k1)
    bn, bd = map(int, b)
    if k1n < 0 or k1d <= 0 or bn < 0 or bd <= 0 or bn > bd:
        raise ValueError("k1 must be >= 0 and b in [0, 1] as (num, den)")
    base = df.select(
        F.col(key_col).alias("key"),
        _py_tokens_col(F.col(text_col)).alias("_toks"),
    )
    if n_docs is None or total_tokens is None:
        agg = base.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size("_toks")).alias("tt"),
        ).collect()[0]
        n_docs = n_docs if n_docs is not None else agg.n
        total_tokens = total_tokens if total_tokens is not None else (agg.tt or 0)
    avgdl_q = max(1, int(total_tokens) // max(1, int(n_docs)))
    index = (
        base.select(
            "key",
            F.size("_toks").alias("dl"),
            F.explode("_toks").alias("term"),
        )
        .filter(F.col("term").isin(terms))
        .groupBy("key", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    dfreq = index.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.select(
        "term",
        F.expr(
            f"CAST({int(scale)} AS BIGINT)"
            f" * (2 * ({int(n_docs)} - df) + 1) div (2 * df + 1)"
        ).alias("idf_q"),
    )
    num = F.col("tf") * F.lit((k1n + k1d) * bd * avgdl_q)
    den = F.col("tf") * F.lit(k1d * bd * avgdl_q) + F.lit(k1n) * (
        F.lit((bd - bn) * avgdl_q) + F.lit(bn) * F.col("dl")
    )
    scored = (
        index.join(F.broadcast(idf), "term")
        .withColumn("_num", num)
        .withColumn("_den", den)
        # left-assoc same-precedence: (idf_q * _num) div _den
        .withColumn("_ts", F.expr("idf_q * _num div _den"))
        .groupBy("key")
        .agg(F.sum("_ts").alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.col("key")).limit(k)
