"""End-to-end training-data preparation: the composed pipeline a 100-TB
corpus actually runs.

    pages -> extraction cascade -> keep valid text
          -> quality gate (lang-id + quality score + token bounds)
          -> [optional] banned-wordlist drop (functions/wordfilter)
          -> exact dedup (content digest)
          -> near-dup collapse (MinHash-LSH, keep min url per cluster)
          -> [optional] corpus-level line dedup (functions/dedup.dedup_lines)
          -> [optional] CCNet LM-quality gates: perplexity-tertile keep-set
             (vocab.surprisal_buckets) and/or reference-trained NB
             classifier (functions/classifier)
          -> [optional] benchmark decontamination (functions/contamination)
          -> [optional] PII redaction (functions/pii)
          -> clean corpus (url, text, lang_guess, quality, n_tokens)

Shuffle budget: extraction is a pure map; the quality gate and wordlist
drop are map-side; exact dedup is one shuffle on a 16-byte digest;
near-dup adds the banded self-join on already-deduped survivors (a
small fraction of input); line dedup adds a line-level partial-agg
shuffle + anti-join over the surviving set; PII redaction is a codegen
projection and decontamination an AQE-decided anti-join — the hygiene
tail runs AFTER dedup so the expensive text passes touch the smallest
surviving set.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prepare_training_data(
    pages: DataFrame,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: float = 0.5,
    near_dup_threshold: Optional[float] = 0.85,
    pdf_mode: str = "parse",
    redact_pii: bool = False,
    benchmark: Optional[DataFrame] = None,
    contamination_ngram: int = 13,
    blocklist=None,
    line_dedup_max_count: int = 0,
    near_dup_mode: str = "pairs",
    keep_ppl_buckets: Optional[tuple] = None,
    classifier_reference: Optional[DataFrame] = None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> deduplicated clean corpus.

    ``redact_pii=True`` rewrites ``text`` through functions/pii's pinned
    rule chain (a pure projection — off by default to preserve the
    byte-identity contract with the extraction goldens). ``benchmark``
    (a DataFrame with a ``text`` column) enables 13-gram decontamination:
    corpus rows sharing any ``contamination_ngram``-token gram with it
    are dropped (functions/contamination). ``blocklist`` (an iterable of
    banned words) drops documents containing any of them BEFORE dedup —
    a codegen filter, C4's cleanup rule. ``line_dedup_max_count > 0``
    additionally removes every line repeated corpus-wide more than that
    many times from the surviving documents (dedup_lines — the
    C4/RefinedWeb boilerplate-line rule; n_tokens/quality reflect the
    pre-line-dedup text, as in those pipelines).

    ``near_dup_mode`` selects the collapse strategy:
      * ``"pairs"`` (default) — banded LSH candidate pairs, EXACT
        shingle-Jaccard verification at ``near_dup_threshold``, then
        connected components over the verified pair graph. Exact
        semantics, but the pair graph is quadratic in clique size: a
        templated corpus with w-document boilerplate cliques
        materializes ~w²/2 edges per clique (a 1M-page run exhausted
        75 GB of shuffle scratch in the CC phase; 300k fit).
      * ``"buckets"`` — dedup.minhash_bucket_clusters: member→bucket-min
        edges (≤ docs × bands total, linear regardless of clique
        shape), signature-ESTIMATED Jaccard trim at the threshold.
        Coarser semantics (bucket transitivity + estimator, see its
        docstring) — the trade every trillion-row pipeline makes; use
        it when the corpus has template-heavy mass.

    CCNet-style LM-quality tail (both off by default):
    ``keep_ppl_buckets`` — e.g. ``("head", "middle")`` — buckets the
    SURVIVING corpus by integer per-token unigram surprisal
    (vocab.surprisal_buckets, equal-population tertiles) and keeps only
    the named buckets; CCNet keeps head(+middle) per language — here
    the bucketing is corpus-global (the per-language refinement is a
    groupBy away; documented, not hidden). ``classifier_reference`` —
    a trusted corpus (any DataFrame with a ``text`` column) — trains
    the quantized NB classifier (functions/classifier) with
    reference-vs-corpus labels, the literal CCNet wiki-vs-crawl
    design, and keeps the corpus documents scored reference-like
    (pred == score >= 0). Gates run on the post-line-dedup text (the
    bytes that ship), before decontamination/PII."""
    from jarvis_ocr_service_spark.functions.dedup import (
        minhash_lsh_pairs,
        text_digest,
    )
    from jarvis_ocr_service_spark.functions.textstats import with_text_stats
    from jarvis_ocr_service_spark.plans.pipeline import run_pipeline

    if keep_ppl_buckets:
        # validate against the 3-bucket domain up front (the CLI already
        # does; the library API is a production entry point too and an
        # unchecked typo like ('Head',) would silently shrink or empty
        # the output corpus — r6 ADVICE item)
        bad = set(keep_ppl_buckets) - {"head", "middle", "tail"}
        if bad:
            raise ValueError(
                f"unknown keep_ppl_buckets {sorted(bad)} — "
                "valid names: head, middle, tail"
            )

    extracted = run_pipeline(pages, pdf_mode=pdf_mode).filter(F.col("is_valid"))

    # token split staged once (with_text_stats), not re-split per stat
    scored = with_text_stats(
        extracted.select("url", "text"),
        stats=("n_tokens", "lang_guess", "quality"),
    ).filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("quality") >= min_quality)
    )
    if blocklist:
        from jarvis_ocr_service_spark.functions.wordfilter import (
            drop_by_wordlist,
        )

        scored = drop_by_wordlist(scored, blocklist, text_col="text")

    # exact dedup: keep the lexicographically-first url per digest — a
    # min_by aggregate (one shuffle, partial agg map-side, no per-group
    # sort of full-text rows like a Window would need)
    cols = scored.columns
    exact = (
        scored.groupBy(text_digest(F.col("text")).alias("_digest"))
        .agg(F.min_by(F.struct(*cols), F.col("url")).alias("_row"))
        .select(*[F.col(f"_row.{c}").alias(c) for c in cols])
    )

    # persisted frames created inside finish's gates, propagated onto the
    # returned plan so the caller's release_cached() covers them
    tail_caches: list = []

    def finish(corpus: DataFrame) -> DataFrame:
        # line dedup FIRST in the tail: decontamination grams and PII
        # spans should be evaluated on the text that actually ships
        if line_dedup_max_count:
            from jarvis_ocr_service_spark.functions.dedup import dedup_lines

            deduped_text = dedup_lines(
                corpus, text_col="text", key_col="url",
                max_count=line_dedup_max_count,
            ).withColumnRenamed("key", "url").withColumnRenamed("text", "_ld")
            corpus = (
                corpus.drop("text")
                .join(deduped_text, "url")
                .withColumnRenamed("_ld", "text")
            )
        # CCNet-style LM-quality gates on the shipping text: perplexity
        # tertile keep-set, then the reference-trained NB classifier
        if keep_ppl_buckets:
            from jarvis_ocr_service_spark.functions.vocab import (
                surprisal_buckets,
            )
            from jarvis_ocr_service_spark.plans.caching import carried_cached

            sb = surprisal_buckets(corpus, text_col="text", key_col="url")
            # .filter()/.select() strip the cached-deps attribute — hoist
            # the attachments onto tail_caches BEFORE deriving from sb
            tail_caches.extend(carried_cached(sb))
            keep = sb.filter(
                F.col("bucket_name").isin(*keep_ppl_buckets)
            ).select(F.col("key").alias("url"))
            corpus = corpus.join(keep, "url", "left_semi")
        if classifier_reference is not None:
            from jarvis_ocr_service_spark.functions.classifier import (
                nb_score,
                nb_train,
            )
            from jarvis_ocr_service_spark.plans.caching import carried_cached

            train = (
                classifier_reference.select(F.col("text"))
                .withColumn("_ref", F.lit(True))
                .unionByName(
                    corpus.select(F.col("text")).withColumn(
                        "_ref", F.lit(False)
                    )
                )
            )
            # nb_train runs its two bounded driver aggregates here (at
            # plan-build time) and leaves its counts frame persisted —
            # carried on `weights`; propagate it to the returned plan so
            # the caller's release_cached() contract covers it
            weights, params = nb_train(train, "_ref")
            tail_caches.extend(carried_cached(weights))
            keep = (
                nb_score(corpus, weights, params, key_col="url")
                .filter(F.col("pred"))
                .select(F.col("key").alias("url"))
            )
            corpus = corpus.join(keep, "url", "left_semi")
        # decontaminate BEFORE redaction: collision grams must be
        # matched against the original bytes, not [EMAIL]-rewritten ones
        if benchmark is not None:
            from jarvis_ocr_service_spark.functions.contamination import (
                decontaminate,
            )

            corpus = decontaminate(
                corpus,
                benchmark,
                text_col="text",
                key_col="url",
                n=contamination_ngram,
            )
        if redact_pii:
            from jarvis_ocr_service_spark.functions.pii import redact_pii_col

            corpus = corpus.withColumn("text", redact_pii_col(F.col("text")))
        return corpus

    if not near_dup_threshold:
        from jarvis_ocr_service_spark.plans.caching import attach_cached

        if keep_ppl_buckets or classifier_reference is not None:
            # the gates run eager plan-build jobs (counts collects, the
            # rank offsets) plus the final action — persist the shared
            # upstream so extraction runs once, same as the cluster routes
            exact = exact.persist()
            tail_caches.append(exact)
        return attach_cached(finish(exact), tail_caches)

    # near-dup collapse: true connected components over the verified pair
    # graph (dup_clusters) — every transitive chain collapses to its
    # smallest member, exact for clusters of any shape (greedy pair-drop
    # would over-keep on A-B, B-C chains where A,C aren't directly paired)
    from jarvis_ocr_service_spark.functions.dedup import dup_clusters
    from jarvis_ocr_service_spark.plans.caching import attach_cached, carried_cached

    # the cluster routes iterate with actions, and the final anti-join
    # reads `exact` again — persist it so extraction runs once, not per pass
    exact = exact.persist()
    if near_dup_mode == "buckets":
        from jarvis_ocr_service_spark.functions.dedup import (
            minhash_bucket_clusters,
        )

        clusters = minhash_bucket_clusters(
            exact, text_col="text", key_col="url",
            verify_threshold=near_dup_threshold,
        )
        carried = [exact] + carried_cached(clusters)
    elif near_dup_mode == "pairs":
        # max_bucket: hot-band guard (minhash_lsh_pairs docstring) — without
        # it a heavy shingle atom (templated boilerplate) makes the candidate
        # join quadratic; 1000 keeps any single bucket's pair contribution
        # under ~500k while real near-dup clusters (far smaller) are untouched
        pairs = minhash_lsh_pairs(
            exact, text_col="text", key_col="url",
            verify_threshold=near_dup_threshold, max_bucket=1000,
        )
        clusters = dup_clusters(pairs, key_a="key_a", key_b="key_b")
        carried = [exact] + carried_cached(pairs) + carried_cached(clusters)
    else:
        raise ValueError(
            f"near_dup_mode must be 'pairs' or 'buckets', got {near_dup_mode!r}"
        )
    losers = (
        clusters.filter(F.col("key") != F.col("cluster"))
        .select(F.col("key").alias("url"))
    )
    return attach_cached(
        finish(exact.join(losers, "url", "left_anti")), carried + tail_caches,
    )
