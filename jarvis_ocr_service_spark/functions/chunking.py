"""Sliding-window document chunking — the long-document preprocessing
op every RAG index and long-context training pipeline needs: split each
document's token stream into fixed-size windows advancing by ``stride``
(overlap = size - stride), full coverage, deterministic.

Distinct from :mod:`packing` (which packs many documents into fixed
training containers): chunking splits ONE document into overlapping
windows; no cross-document state exists, so the whole op is a map-only
projection — zero shuffles at any corpus size.

Pinned chunk rule (engine-exact, all integer):

    n       = token count
    k_max   = 0 if n <= size else ceil((n - size) / stride)
    chunk i = tokens[i*stride : i*stride + min(size, n - i*stride)]
              for i in 0..k_max

Full coverage by construction (the last window ends at the last token);
the final chunk's length lands in (size - stride, size] when n > size.
Token-less documents emit ONE empty chunk row (chunk_idx 0, n_toks 0,
chunk_text "") — the repo's report-don't-drop rule.

Tokens are the repo's pinned py-token class (functions/tokens.py), so
chunk_text round-trips through the same tokenizer.

Reference parity note: the reference service has no chunker; this is
part of the training-data layer (SURVEY §2 "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.tokens import py_tokens_col as _tokens


def chunk_sliding(
    df: DataFrame,
    size: int,
    stride: int,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Split each document into sliding token windows. Returns
    ``(key, chunk_idx, start_tok, n_toks, chunk_text)`` — one row per
    window under the pinned rule above. ``stride <= size`` keeps
    coverage gap-free; ``stride == size`` is the non-overlapping case.

    Plan: ONE codegen projection — tokens, k_max, explode(sequence),
    slice, array_join are all JVM expressions; no Python, no shuffle,
    no window. Explode factor is exactly ceil(n/stride)-ish per doc,
    i.e. output size is bounded by (overlap factor) x corpus tokens —
    linear, partition-local, safe at any scale."""
    if size < 1 or stride < 1:
        raise ValueError("size and stride must be >= 1")
    if stride > size:
        raise ValueError("stride > size would leave coverage gaps")
    toks = _tokens(F.col(text_col))
    base = df.select(
        F.col(key_col).alias("key"),
        toks.alias("_toks"),
        F.size(toks).cast("long").alias("_n"),
    )
    kmax = F.when(
        F.col("_n") <= size, F.lit(0).cast("long")
    ).otherwise(F.expr(f"CAST((_n - {int(size)} + {int(stride)} - 1) AS BIGINT) div {int(stride)}"))
    exploded = base.select(
        "key",
        "_toks",
        "_n",
        F.explode(F.sequence(F.lit(0).cast("long"), kmax)).alias("chunk_idx"),
    )
    start = (F.col("chunk_idx") * stride).cast("long")
    n_toks = F.least(F.lit(size).cast("long"), F.col("_n") - start)
    return exploded.select(
        "key",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.alias("start_tok"),
        n_toks.alias("n_toks"),
        F.array_join(
            F.slice(F.col("_toks"), start.cast("int") + F.lit(1), n_toks.cast("int")),
            " ",
        ).alias("chunk_text"),
    )
