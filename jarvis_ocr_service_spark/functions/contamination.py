"""Benchmark decontamination: flag corpus documents that share long
token n-grams with an evaluation/benchmark set — the standard
training-data hygiene pass (13-gram collision, the GPT-3/PaLM-style
decontamination rule) that must run before a corpus ships.

Semantics (pinned, shared pure-Python — the byte-identity discipline):
tokens are lowercased Python-``str.split()`` whitespace tokens (the
repo's py-token class); a document is contaminated iff it contains at
least ``min_hits`` DISTINCT token ``n``-grams that appear anywhere in
the benchmark set. Documents shorter than ``n`` tokens cannot collide.

Scale shape (the part that matters at 10^12 rows): the benchmark side
is SMALL by definition (eval sets are thousands of rows, not billions),
so its distinct gram set is built driver-side from the shared pure
function and broadcast to executors; the corpus side is ONE Arrow
stage doing set lookups per batch — no explode, no join, ZERO shuffles
for the report. The explode-join alternative ships n_tokens rows per
document through the plan, and generating grams with an interpreted
``F.transform`` lambda never enters codegen (~1 µs/element — the exact
trap that DNF'd the old minhash signatures, see CLAUDE.md); set lookup
in a batch loop is an order of magnitude cheaper and stays map-only.

Reference parity note: the reference service has no corpus hygiene;
this is part of the training-data layer (SURVEY §2 "beyond the
reference").
"""

from __future__ import annotations

from typing import Iterable, Set

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def text_ngrams(text: str, n: int) -> Set[str]:
    """Distinct lowercased n-token grams — THE pinned semantics, used by
    the executors, the tests, and (in spirit) the DuckDB oracle."""
    toks = (text or "").lower().split()
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def benchmark_gram_set(texts: Iterable[str], n: int) -> Set[str]:
    """Union of the benchmark rows' gram sets (driver-side; eval sets
    are small by contract — thousands of rows, not billions)."""
    out: Set[str] = set()
    for t in texts:
        out |= text_ngrams(t, n)
    return out


def contamination_hits(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """(key, n_hits, contaminated) for EVERY corpus document — n_hits =
    number of distinct n-grams shared with the benchmark set (0 for
    clean docs; a decontamination report must say "clean", not omit),
    contaminated = n_hits >= min_hits.

    Plan: one Arrow map stage over (key, text); the benchmark gram set
    rides a Spark broadcast variable. No shuffle anywhere."""
    spark = df.sparkSession
    bench = benchmark_gram_set(
        (r[0] for r in benchmark.select(bench_text_col).collect()), n
    )
    bc = spark.sparkContext.broadcast(bench)
    key_field = df.schema[key_col]
    out_schema = T.StructType(
        [
            T.StructField("key", key_field.dataType, key_field.nullable),
            T.StructField("n_hits", T.LongType(), False),
            T.StructField("contaminated", T.BooleanType(), False),
        ]
    )
    nn, mh = int(n), int(min_hits)

    def gen(batches):
        import pandas as pd

        grams = bc.value
        for b in batches:
            if not len(b):
                continue
            hits = [
                sum(1 for g in text_ngrams(t, nn) if g in grams)
                for t in b[text_col]
            ]
            yield pd.DataFrame(
                {
                    "key": b[key_col],
                    "n_hits": hits,
                    "contaminated": [h >= mh for h in hits],
                }
            )

    return df.select(key_col, text_col).mapInPandas(gen, schema=out_schema)


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """The corpus with contaminated documents REMOVED (all original
    columns) — the shippable-output form of :func:`contamination_hits`.
    The dirty key set is benchmark-adjacent and therefore small, so the
    anti-join broadcasts it (no corpus shuffle)."""
    flags = contamination_hits(
        df, benchmark, text_col, key_col, bench_text_col, n, min_hits
    )
    dirty = flags.filter(F.col("contaminated")).select(
        F.col("key").alias(key_col)
    )
    return df.join(F.broadcast(dirty), key_col, "left_anti")
