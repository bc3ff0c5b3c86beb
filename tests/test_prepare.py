"""Composed training-data preparation pipeline."""

from pyspark.sql import functions as F

from jarvis_ocr_service_spark.plans.prepare import prepare_training_data
from jarvis_ocr_service_spark.sources.pages import synthesize_pages


def test_prepare_filters_and_dedups(spark):
    pages = synthesize_pages(spark, 100, num_partitions=4)
    # duplicate the whole corpus under new urls -> near/exact dups abound
    dup = pages.withColumn("url", F.concat(F.col("url"), F.lit("-copy")))
    both = pages.unionByName(dup)

    corpus = prepare_training_data(both, min_quality=0.4, near_dup_threshold=0.85)
    rows = corpus.collect()
    urls = [r.url for r in rows]
    texts = [r.text for r in rows]

    # invalid classes (empty/pdf-less/garbled/short/png) never survive
    assert all(r.n_tokens >= 10 and r.quality >= 0.4 for r in rows)
    # exact dup collapse: no duplicated text bodies remain
    assert len(texts) == len(set(texts))
    # the -copy twins were dropped (original url sorts first)
    assert not any(u.endswith("-copy") for u in urls)
    # valid originals survived
    assert len(rows) > 0


def test_prepare_without_near_dup_stage(spark):
    pages = synthesize_pages(spark, 60, num_partitions=2)
    corpus = prepare_training_data(pages, near_dup_threshold=None)
    assert corpus.count() > 0
    assert set(corpus.columns) == {"url", "text", "n_tokens", "lang_guess", "quality"}


def test_prepare_releases_cached_blocks(spark, tmp_path):
    """Cache hygiene: after the consuming action + release_cached, the
    LSH plan's persisted intermediates must not linger in the session
    (repeated prepare runs would otherwise accumulate cached blocks)."""
    from jarvis_ocr_service_spark.plans.caching import carried_cached, release_cached
    from jarvis_ocr_service_spark.plans.prepare import prepare_training_data
    from jarvis_ocr_service_spark.sources.pages import synthesize_pages

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    corpus = prepare_training_data(synthesize_pages(spark, 100, num_partitions=4))
    corpus.write.mode("overwrite").parquet(str(tmp_path / "corpus"))
    assert carried_cached(corpus)  # the LSH persist was attached
    during = jsc.getPersistentRDDs().size()
    assert during > before  # it really was persisted during the action
    n = release_cached(corpus)
    assert n >= 1
    assert jsc.getPersistentRDDs().size() == before  # all released
    assert release_cached(corpus) == 0  # idempotent


def test_prepare_hygiene_stages(spark):
    """Wiring of the optional hygiene tail: benchmark decontamination
    drops exactly the gram-colliding survivors; redact_pii is a no-op on
    a PII-free corpus (the rules themselves are pinned in test_pii)."""
    pages = synthesize_pages(spark, 60, num_partitions=2)
    base = prepare_training_data(pages, near_dup_threshold=None)
    rows = base.orderBy("url").collect()
    victim = next(r for r in rows if r.n_tokens >= 13)

    bench = spark.createDataFrame([(victim.text,)], "text string")
    cleaned = prepare_training_data(
        pages, near_dup_threshold=None, benchmark=bench, redact_pii=True
    )
    got = cleaned.orderBy("url").collect()
    got_urls = {r.url for r in got}
    assert victim.url not in got_urls  # gram collision -> dropped
    # survivors: same rows as base minus the contaminated one(s), and the
    # PII pass left PII-free text byte-identical
    base_by_url = {r.url: r.text for r in rows}
    for r in got:
        assert r.text == base_by_url[r.url]
    dropped = {r.url for r in rows} - got_urls
    assert victim.url in dropped and len(dropped) >= 1


def test_prepare_blocklist_and_line_dedup(spark):
    """Wiring of the r5 hygiene options: a blocklist word drops its
    documents before dedup; line_dedup_max_count removes corpus-repeated
    lines from survivors while unique lines ride through unchanged."""
    from pyspark.sql import functions as F

    pages = synthesize_pages(spark, 60, num_partitions=2)
    base = prepare_training_data(pages, near_dup_threshold=None)
    rows = base.orderBy("url").collect()
    # pick a token appearing in SOME but not all survivor texts
    tokens_by_url = {r.url: set((r.text or "").lower().split()) for r in rows}
    all_tokens = set().union(*tokens_by_url.values())
    word = next(
        t for t in sorted(all_tokens)
        if 0 < sum(t in s for s in tokens_by_url.values()) < len(rows)
    )
    blocked = prepare_training_data(
        pages, near_dup_threshold=None, blocklist=[word]
    )
    got_urls = {r.url for r in blocked.collect()}
    want_urls = {u for u, s in tokens_by_url.items() if word not in s}
    assert got_urls == want_urls

    # line dedup vs the brute-force pinned rule over the base corpus
    # (some fixture classes carry real newlines, so lines repeat both
    # across docs and within them)
    from collections import Counter

    line_counts = Counter()
    for r in rows:
        for line in (r.text or "").split("\n"):
            if line:
                line_counts[line] += 1
    ld = prepare_training_data(
        pages, near_dup_threshold=None, line_dedup_max_count=1
    )
    got = {r.url: r.text for r in ld.collect()}
    assert set(got) == set(tokens_by_url)  # no rows dropped, text rewritten
    changed = 0
    for r in rows:
        want = "\n".join(
            line
            for line in (r.text or "").split("\n")
            if line == "" or line_counts[line] <= 1
        )
        assert got[r.url] == want, r.url
        changed += want != r.text
    assert changed > 0  # the rule actually bit somewhere


def test_prepare_bucket_mode_matches_pair_mode_on_synthetic(spark):
    """near_dup_mode='buckets' (linear-edge CC) collapses the synthetic
    corpus at least as aggressively as the exact pair route here —
    the synthetic near-dups are template twins (huge estimated Jaccard),
    exactly the mass the bucket route exists for — and keeps the same
    schema and exact-dup guarantees."""
    pages = synthesize_pages(spark, 100, num_partitions=4)
    dup = pages.withColumn("url", F.concat(F.col("url"), F.lit("-copy")))
    both = pages.unionByName(dup)

    pair_corpus = prepare_training_data(
        both, min_quality=0.4, near_dup_threshold=0.85
    )
    bucket_corpus = prepare_training_data(
        both, min_quality=0.4, near_dup_threshold=0.85,
        near_dup_mode="buckets",
    )
    pair_urls = {r.url for r in pair_corpus.select("url").collect()}
    bucket_rows = bucket_corpus.collect()
    bucket_urls = {r.url for r in bucket_rows}
    assert bucket_urls  # something survives
    assert not any(u.endswith("-copy") for u in bucket_urls)
    texts = [r.text for r in bucket_rows]
    assert len(texts) == len(set(texts))  # exact-dup collapse intact
    # bucket transitivity is coarser: it can only merge MORE than the
    # verified pair graph on this corpus, never less
    assert bucket_urls <= pair_urls


def test_prepare_rejects_unknown_near_dup_mode(spark):
    import pytest

    with pytest.raises(ValueError, match="near_dup_mode"):
        prepare_training_data(
            synthesize_pages(spark, 10), near_dup_mode="nope"
        )


def test_prepare_ppl_bucket_gate(spark):
    """keep_ppl_buckets keeps exactly the surprisal_buckets head/middle
    tertiles of the surviving corpus (the CCNet keep-set)."""
    from jarvis_ocr_service_spark.functions.vocab import surprisal_buckets
    from jarvis_ocr_service_spark.plans.caching import release_cached

    pages = synthesize_pages(spark, 60, num_partitions=2)
    base = prepare_training_data(pages, near_dup_threshold=None)
    sb = surprisal_buckets(base, text_col="text", key_col="url")
    expected_keep = {
        r.key for r in sb.filter("bucket_name != 'tail'").collect()
    }
    gated = prepare_training_data(
        pages, near_dup_threshold=None, keep_ppl_buckets=("head", "middle")
    )
    got = {r.url for r in gated.collect()}
    assert got == expected_keep
    n_base = base.count()
    # equal-population tertiles: the gate keeps ~2/3
    assert abs(len(got) - 2 * n_base / 3) <= 2
    # suite cache hygiene: release the helper frames too (sb carries the
    # surprisal counts + global_rank ranged frame; base carries `exact`)
    release_cached(sb)
    release_cached(base)
    release_cached(gated)


def test_prepare_rejects_unknown_ppl_bucket(spark):
    import pytest

    with pytest.raises(ValueError, match="keep_ppl_buckets"):
        prepare_training_data(
            synthesize_pages(spark, 10),
            near_dup_threshold=None,
            keep_ppl_buckets=("Head",),
        )


def test_prepare_classifier_gate(spark):
    """classifier_reference trains reference-vs-corpus NB and keeps the
    reference-like documents; a reference matching the corpus's own
    common vocabulary keeps plenty, and dropped docs score negative."""
    from jarvis_ocr_service_spark.functions.classifier import nb_score, nb_train
    from jarvis_ocr_service_spark.plans.caching import release_cached

    pages = synthesize_pages(spark, 60, num_partitions=2)
    base = prepare_training_data(pages, near_dup_threshold=None)
    # reference corpus: the first 10 surviving docs verbatim
    ref_texts = [r.text for r in base.orderBy("url").limit(10).collect()]
    ref = spark.createDataFrame([(t,) for t in ref_texts], "text string")

    gated = prepare_training_data(
        pages, near_dup_threshold=None, classifier_reference=ref
    )
    got = {r.url for r in gated.collect()}
    # mirror the gate by hand on the base corpus
    from pyspark.sql import functions as F

    train = ref.withColumn("_ref", F.lit(True)).unionByName(
        base.select("text").withColumn("_ref", F.lit(False))
    )
    weights, params = nb_train(train, "_ref")
    expected = {
        r.key
        for r in nb_score(base, weights, params, key_col="url")
        .filter("pred")
        .collect()
    }
    release_cached(weights)
    assert got == expected
    assert 0 < len(got) < base.count()  # the gate bites both ways
    release_cached(base)
    release_cached(gated)


def test_prepare_gates_release_cached_blocks(spark, tmp_path):
    """The LM-quality gates' persisted frames (surprisal counts, the
    global-rank ranged frame, NB counts, the gated `exact`) all ride
    the returned plan's release contract — zero retained blocks after
    release_cached (the review-pass leak fix)."""
    from jarvis_ocr_service_spark.plans.caching import carried_cached, release_cached
    from jarvis_ocr_service_spark.sources.pages import synthesize_pages

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    pages = synthesize_pages(spark, 60, num_partitions=2)
    ref = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], "text string"
    )
    corpus = prepare_training_data(
        pages,
        near_dup_threshold=None,
        keep_ppl_buckets=("head", "middle"),
        classifier_reference=ref,
    )
    corpus.write.mode("overwrite").parquet(str(tmp_path / "gated"))
    assert len(carried_cached(corpus)) >= 3  # surprisal + rank + nb + exact
    assert release_cached(corpus) >= 3
    assert jsc.getPersistentRDDs().size() == before
