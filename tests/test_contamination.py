"""Benchmark decontamination: pinned 13-gram collision semantics,
map-only plan, removal form."""

from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.contamination import (
    benchmark_gram_set,
    contamination_hits,
    decontaminate,
    text_ngrams,
)

BENCH = "the quick brown fox jumps over the lazy dog near the old river bank"


def test_text_ngrams_pinned():
    assert text_ngrams("a b c", 3) == {"a b c"}
    assert text_ngrams("a b", 3) == set()
    assert text_ngrams("A b a B", 2) == {"a b", "b a"}  # lowercased, distinct
    assert text_ngrams(None, 2) == set()
    g = text_ngrams(BENCH, 13)
    assert len(g) == 2  # 14 tokens -> two 13-grams


def test_hits_and_flags(spark):
    docs = [
        # contains a full benchmark 13-gram (prefix 13 tokens) -> hit
        (0, "intro words then " + " ".join(BENCH.split()[:13]) + " outro"),
        # the whole benchmark text -> 2 distinct gram hits
        (1, BENCH),
        # repeats the same contaminated gram twice -> still 1 DISTINCT hit
        (2, " ".join(BENCH.split()[:13]) + " x " + " ".join(BENCH.split()[:13])),
        # shares only a 12-token run -> clean at n=13
        (3, " ".join(BENCH.split()[:12]) + " something else entirely now"),
        (4, "totally unrelated text " * 10),
        (5, "short"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bench = spark.createDataFrame([(BENCH,)], "text string")
    got = {
        r.key: (r.n_hits, r.contaminated)
        for r in contamination_hits(df, bench, n=13).collect()
    }
    assert got == {
        0: (1, True),
        1: (2, True),
        2: (1, True),
        3: (0, False),
        4: (0, False),
        5: (0, False),
    }

    clean = decontaminate(df, bench, n=13)
    assert sorted(r.doc_id for r in clean.collect()) == [3, 4, 5]
    assert clean.columns == ["doc_id", "text"]


def test_benchmark_gram_set_unions():
    s = benchmark_gram_set(["a b c d", "c d e f"], 3)
    assert s == {"a b c", "b c d", "c d e", "d e f"}


def test_join_fallback_equals_broadcast_form(spark):
    """The oversized-benchmark explode+join plan must give byte-identical
    answers to the broadcast-array plan (same gram_hash64 both sides)."""
    docs = [
        (0, "intro words then " + " ".join(BENCH.split()[:13]) + " outro"),
        (1, BENCH),
        (2, " ".join(BENCH.split()[:12]) + " something else entirely now"),
        (3, "totally unrelated text " * 10),
        (4, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bench = spark.createDataFrame([(BENCH,)], "text string")
    bcast = sorted(
        (r.key, r.n_hits, r.contaminated)
        for r in contamination_hits(df, bench, n=13).collect()
    )
    joined = sorted(
        (r.key, r.n_hits, r.contaminated)
        for r in contamination_hits(
            df, bench, n=13, max_broadcast_grams=0
        ).collect()
    )
    assert bcast == joined
    assert bcast[0] == (0, 1, True) and bcast[2] == (2, 0, False)


def test_gram_hash64_deterministic_and_memory_bound():
    """Hash is pinned (any change breaks reproducibility) and the
    broadcast payload is 8 B/gram — the r4-verdict memory bound: a
    10^5-row benchmark at ~10^2 grams/row broadcasts ~80 MB instead of
    ~800 MB of Python-str set."""
    from jarvis_ocr_service_spark.functions.contamination import (
        _hashed_sorted,
        gram_hash64,
    )

    assert gram_hash64("a b c") == gram_hash64("a b c")
    assert gram_hash64("a b c") != gram_hash64("a b d")
    assert 0 <= gram_hash64("x") < 1 << 64
    grams = {f"tok{i} tok{i+1} tok{i+2}" for i in range(10_000)}
    arr = _hashed_sorted(grams)
    assert arr.nbytes == 8 * len(grams)
    assert (arr[:-1] <= arr[1:]).all()


def test_report_plan_is_map_only(spark):
    """The report must be ONE Arrow stage — no explode-join, no shuffle."""
    df = spark.createDataFrame([(0, "x y z")], "doc_id long, text string")
    bench = spark.createDataFrame([("x y z",)], "text string")
    plan = (
        contamination_hits(df, bench, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan  # no explode anywhere
