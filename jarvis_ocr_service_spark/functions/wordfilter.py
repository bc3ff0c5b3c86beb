"""Banned-wordlist document filter — the C4 cleanup rule (pages
containing any word from a blocklist are dropped from the corpus).

Semantics (pinned): tokens are the repo's shared py-token class
(functions/tokens.py — lowercased str.split()); ``n_hits`` counts the
DISTINCT blocklist words present in the document (the same
distinctness convention as contamination's gram hits), ``flagged`` is
n_hits > 0. The blocklist is matched lowercase.

Scale shape: the blocklist rides inline as an array literal inside ONE
pure-Column projection (``array_intersect`` — whole-stage codegen, no
Python, no shuffle, no broadcast variable needed at realistic
blocklist sizes of 10^2-10^4 words). The report form keeps every
document (clean rows say 0); the removal form is a codegen filter.

Reference parity note: the reference service has no corpus hygiene;
this is part of the training-data layer (SURVEY §2 "beyond the
reference").
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.tokens import py_tokens_col


def wordlist_flags(
    df: DataFrame,
    words: Iterable[str],
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """(key, n_hits, flagged) for EVERY document — n_hits = distinct
    blocklist words present (0 for clean docs), flagged = n_hits > 0."""
    wl = sorted({(w or "").lower() for w in words} - {""})
    banned = F.array(*[F.lit(w) for w in wl])
    hits = F.size(F.array_intersect(py_tokens_col(F.col(text_col)), banned))
    return df.select(
        F.col(key_col).alias("key"),
        hits.cast("long").alias("n_hits"),
        (hits > 0).alias("flagged"),
    )


def drop_by_wordlist(
    df: DataFrame,
    words: Iterable[str],
    text_col: str = "text",
) -> DataFrame:
    """The corpus with flagged documents REMOVED (all original columns)
    — a single codegen filter, no join."""
    wl = sorted({(w or "").lower() for w in words} - {""})
    banned = F.array(*[F.lit(w) for w in wl])
    return df.filter(
        F.size(F.array_intersect(py_tokens_col(F.col(text_col)), banned)) == 0
    )
