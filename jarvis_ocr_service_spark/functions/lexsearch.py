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

DEFAULT_SCALE = 1_000_000


def _py_tokens_col(col):
    """Lowercased Python-str.split()-equivalent tokens (drops empties)."""
    t = F.trim(F.lower(F.coalesce(col, F.lit(""))))
    return F.filter(
        F.split(t, r"\s+"), lambda tk: tk != F.lit("")
    )


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
