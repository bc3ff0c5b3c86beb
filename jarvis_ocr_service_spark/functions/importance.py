"""DSIR-style importance weighting for data selection.

Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) scores raw-corpus documents by the log-likelihood
ratio between a TARGET distribution (the high-quality data you want
more of) and the RAW distribution, both modeled as bag-of-hashed-
n-gram multinomials: hash each unigram and bigram into B buckets,
estimate per-bucket probabilities on each corpus, and weight a doc by
sum over its grams of ``log p_target(bucket) - log p_raw(bucket)``.
Docs that look like the target float up; boilerplate sinks.

No counterpart in the reference (alexberardi/jarvis-ocr-service has
no corpus-selection layer) — this is the LLM-pipeline brief's data-
mixing op, composing with hash_sample/stratified_take for the actual
resampling step.

All-integer scoring (the repo's standing oracle rule): the per-bucket
score is ``bl(c_t + 1) - bl(c_r + 1)`` where ``bl`` is the exact
floor-log2 bucket (report.size_bucket_col — bit-length of the binary
form, no floating log) and ``c_t``/``c_r`` are the target/raw bucket
counts; add-one smoothing keeps zero-count buckets finite. This is
DSIR's LLR up to (a) log2 units, (b) floor quantization, and (c) the
additive constant ``m * (bl-ish(T_r) - bl-ish(T_t))`` from the two
normalizing masses, which is a pure function of the doc's gram count
``m`` — emitted as ``n_grams`` so callers can re-add or
length-normalize. Ranking between equal-length docs is preserved
exactly; any engine reproduces every score bit-for-bit.

Gram hashing reuses the repo's salted-md5 signed-int64 family
(sampling._shifted / shifted_hash_duck_sql) — bit-identical in Spark
and DuckDB — reduced mod ``n_buckets`` (nonnegative pmod). Bigram
string = ``tok_a || ' ' || tok_b``; unigrams contain no whitespace
(the shared py-token class), so the two gram kinds cannot collide.

Scale shape: gram stream = explode (map-only, no Python); both count
tables are ONE partial-agg shuffle each and are bounded by B (the
whole point of hashed features — B ~ 10^4-10^6 regardless of corpus
size); the score table joins the raw gram stream UNHINTED (B rows —
AQE broadcasts it in practice; the decontaminate rule says never
force it); the per-doc sum is one (key, long) shuffle. Counting the
target corpus costs one extra pass over it only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.report import size_bucket_col
from jarvis_ocr_service_spark.functions.sampling import _shifted
from jarvis_ocr_service_spark.functions.tokens import py_tokens_col


def _gram_stream(
    df: DataFrame, text_col: str, key_col: str
) -> DataFrame:
    """(key, gram) stream of unigrams + adjacent bigrams. Built as a
    UNION of two explodes with the string assembly AFTER the explode
    (plain codegen concat_ws on struct fields) — no interpreted
    higher-order lambda ever maps over the token array (the
    >100-element-array eval hazard; same shape as vocab's
    token_pair_counts)."""
    toks = py_tokens_col(F.col(text_col))
    uni = df.select(
        F.col(key_col).alias("key"), F.explode(toks).alias("gram")
    )
    n = F.size(toks)
    bi = (
        df.select(
            F.col(key_col).alias("key"),
            F.explode(
                F.arrays_zip(
                    F.slice(toks, 1, F.greatest(n - 1, F.lit(0))).alias("a"),
                    F.slice(toks, 2, F.greatest(n - 1, F.lit(0))).alias("b"),
                )
            ).alias("p"),
        )
        .select("key", F.concat_ws(" ", F.col("p.a"), F.col("p.b")).alias("gram"))
    )
    return uni.unionByName(bi)


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_buckets: int = 4096,
    salt: str = "dsir",
) -> DataFrame:
    """(key, n_grams, weight): integer DSIR importance weight of every
    ``raw`` document against the ``target`` corpus distribution.

    ``weight`` = sum over the doc's hashed grams of
    ``bl(c_target[bucket] + 1) - bl(c_raw[bucket] + 1)``; higher means
    more target-like. Zero-gram documents report (0, 0). Compose with
    e.g. ``stratified_take`` on a weight-derived stratum, or a top-k,
    for the selection step."""
    if n_buckets < 1:
        raise ValueError("n_buckets >= 1 required")

    def grams(df: DataFrame) -> DataFrame:
        return _gram_stream(df, text_col, key_col).select(
            "key",
            F.pmod(_shifted(F.col("gram"), salt), F.lit(int(n_buckets)))
            .cast("long")
            .alias("bucket"),
        )

    raw_grams = grams(raw)
    c_raw = raw_grams.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("c_raw")
    )
    c_tgt = grams(target).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("c_tgt")
    )
    # score table: <= n_buckets rows; raw-side buckets drive (a bucket
    # absent from raw cannot appear in the stream being scored)
    scores = (
        c_raw.join(c_tgt, "bucket", "left")
        .select(
            "bucket",
            (
                size_bucket_col(F.coalesce("c_tgt", F.lit(0)) + F.lit(1))
                - size_bucket_col(F.col("c_raw") + F.lit(1))
            ).alias("s"),
        )
    )
    per_doc = (
        raw_grams.join(scores, "bucket")
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("s").cast("long").alias("weight"),
        )
    )
    return (
        raw.select(F.col(key_col).alias("key"))
        .join(per_doc, "key", "left")
        .select(
            "key",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("weight", F.lit(0)).cast("long").alias("weight"),
        )
    )
