"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Everything except the rolling hash is pure Column expressions (JVM-side,
whole-stage codegen, SQL-oracle-checkable). The rolling hash is a
vectorized pandas UDF (bit arithmetic over codepoints isn't worth forcing
into SQL).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Tiny per-language stopword marker sets (n-gram-heuristic language ID:
# count language-marker tokens, majority wins). Deterministic, documented,
# and identical in the DuckDB oracle.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "es": ["el", "la", "los", "de", "que", "es", "un", "una"],
    "it": ["il", "la", "che", "di", "un", "una", "per", "non"],
}
LANGS = sorted(STOPWORDS)  # deterministic tie order: de,en,es,fr,it


def tokens_col(col):
    """Whitespace tokens (empty text -> empty array, not [''])."""
    t = F.trim(F.coalesce(col, F.lit("")))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count_col(col):
    return F.size(tokens_col(col)).cast("long")


def bpe_ish_token_count_col(col):
    """Sub-word-ish token count: splits on whitespace AND
    letter/digit/punct boundaries (a cheap BPE-shaped proxy), counted with
    one regexp pass."""
    t = F.coalesce(col, F.lit(""))
    pieces = F.regexp_extract_all(t, F.lit(r"[^\W\d_]+|\d+|[^\w\s]"), 0)
    return F.size(pieces).cast("long")


def stopword_hits_col(col, lang: str):
    """Count of tokens that are stopword markers for ``lang``."""
    toks = tokens_col(F.lower(col))
    markers = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda tk: F.array_contains(markers, tk))).cast("long")


def lang_id_col(col):
    """Heuristic language ID: argmax of stopword hits over LANGS
    ('und' when no marker appears). Deterministic ties: LANGS order."""
    best_lang = F.lit("und")
    best_hits = F.lit(0).cast("long")
    for lang in LANGS:
        hits = stopword_hits_col(col, lang)
        improved = hits > best_hits
        best_lang = F.when(improved, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(improved, hits).otherwise(best_hits)
    return best_lang


def quality_score_col(col):
    """Deterministic quality score in [0,1]:
    0.4*alpha_ratio + 0.3*min(1, tokens/100) + 0.2*(1-punct_ratio)
    + 0.1*stopword_signal. All single-pass regexp counts, JVM-side."""
    t = F.coalesce(col, F.lit(""))
    n = F.length(t)
    safe_n = F.greatest(n, F.lit(1)).cast("double")
    alpha = F.length(F.regexp_replace(t, r"[\W\d_]+", "")).cast("double") / safe_n
    punct = F.length(F.regexp_replace(t, r"[\w\s]+", "")).cast("double") / safe_n
    toks = token_count_col(t).cast("double")
    tok_signal = F.least(F.lit(1.0), toks / 100.0)
    stop_signal = F.least(
        F.lit(1.0),
        sum(stopword_hits_col(t, lang) for lang in LANGS).cast("double") / 10.0,
    )
    score = (
        0.4 * alpha + 0.3 * tok_signal + 0.2 * (1.0 - punct) + 0.1 * stop_signal
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.least(F.lit(1.0), F.greatest(F.lit(0.0), score))
    )


def fingerprint_md5_col(col):
    """Content fingerprint: md5 of the *normalized* text (so formatting
    noise doesn't split identical documents)."""
    from jarvis_ocr_service_spark.operators.textops import normalize_text_col

    return F.md5(F.encode(normalize_text_col(col), "UTF-8"))


_MOD = (1 << 61) - 1
_BASE = 257


@F.pandas_udf(T.LongType())
def rolling_hash64(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Polynomial rolling hash (base 257 mod 2^61-1) over codepoints —
    an order-sensitive fingerprint (md5 is order-sensitive too, but the
    rolling form supports incremental/windowed variants). Arrow-batched."""

    def one(t: str) -> int:
        h = 0
        for ch in t:
            h = (h * _BASE + ord(ch)) % _MOD
        return h

    for s in texts:
        yield s.fillna("").map(one)


def text_stats(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """One-pass per-document stats frame (all JVM-side)."""
    c = F.col(text_col)
    return df.select(
        F.col(key_col),
        token_count_col(c).alias("n_tokens"),
        bpe_ish_token_count_col(c).alias("n_subtokens"),
        F.octet_length(c).cast("long").alias("n_bytes"),
        lang_id_col(c).alias("lang_guess"),
        quality_score_col(c).alias("quality"),
        fingerprint_md5_col(c).alias("fingerprint"),
    )
