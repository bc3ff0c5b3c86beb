"""Corpus vocabulary building — the aggregation that feeds tokenizer
training (BPE/unigram corpora start from exact token/pair counts).

Tokens are the repo's pinned py-token class (lowercased
``str.split()``), so counts are portable to any engine for oracles.

Scale shape: explode -> ONE groupBy shuffle with map-side partial
aggregation (the count rows are (token, long) — tiny next to the
corpus); ``min_count`` filters AFTER the global count (a threshold
below it would be wrong — partial counts can be under it while the
global count is over). Top-k is orderBy+limit = TakeOrderedAndProject,
never a global sort. Pair counts reuse the same shape over adjacent
token pairs (the BPE-merge statistics).

Reference parity note: the reference service has no vocabulary ops;
this is part of the training-data layer (SURVEY §2 "beyond the
reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.tokens import py_tokens_col as _tokens


def token_counts(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(token, n) global exact counts; min_count filters the result."""
    out = (
        df.select(F.explode(_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def top_tokens(df: DataFrame, k: int, text_col: str = "text") -> DataFrame:
    """The k most frequent tokens — (token, n), ties broken by token
    (deterministic)."""
    return (
        token_counts(df, text_col)
        .orderBy(F.desc("n"), F.col("token"))
        .limit(k)
    )


def token_pair_counts(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(tok_a, tok_b, n) counts of ADJACENT token pairs in document
    order — the BPE-merge statistic, at word granularity. Pairs are
    built JVM-side by zipping the token array with its own tail (no
    Python, no index lambda — F.slice + arrays_zip)."""
    toks = _tokens(F.col(text_col))
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("a"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("b"),
    )
    out = (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("tok_a"), F.col("p.b").alias("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out
