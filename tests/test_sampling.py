"""Deterministic sampling: DuckDB hash parity, rate accuracy, split
disjointness, stratified stability, codegen-only plans."""

import duckdb
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.sampling import (
    _shifted,
    hash_bucket,
    hash_sample,
    hash_split,
    mix_corpora,
    shifted_hash_duck_sql,
    shuffle_order,
    stratified_take,
)

N = 4000


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(N).selectExpr("id AS doc_id")


def test_shifted_hash_matches_duckdb(spark, ids):
    got = {
        r.doc_id: r.h
        for r in ids.select(
            "doc_id", _shifted(F.col("doc_id"), "s1").alias("h")
        ).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT i, {shifted_hash_duck_sql('i', 's1')} FROM "
        f"(SELECT unnest(range({N})) AS i)"
    ).fetchall()
    assert len(rows) == N
    for i, h in rows:
        assert got[i] == h, i


def test_hash_sample_rate_and_determinism(spark, ids):
    kept = hash_sample(ids, 0.25, salt="r4")
    ks = sorted(r.doc_id for r in kept.collect())
    assert ks == sorted(r.doc_id for r in hash_sample(ids, 0.25, salt="r4").collect())
    assert abs(len(ks) / N - 0.25) < 0.03  # uniform hash, tight at 4000
    # monotone nesting: a 10% sample is a subset of the 25% sample
    k10 = set(r.doc_id for r in hash_sample(ids, 0.10, salt="r4").collect())
    assert k10 <= set(ks)
    # different salt -> a (near-)independent sample
    other = set(r.doc_id for r in hash_sample(ids, 0.25, salt="other").collect())
    assert other != set(ks)


def test_hash_sample_boundary_rates(spark, ids):
    # rate=1.0 keeps everything (no LongType overflow — ADVICE r4), and
    # rate just under 1.0 must not overflow the clamped threshold either
    assert hash_sample(ids, 1.0).count() == N
    assert hash_sample(ids, 0.0).count() == 0
    near_one = hash_sample(ids, 1.0 - 2**-53).count()  # largest double < 1
    assert near_one == N  # threshold 2^64-2^11: P(drop) ~ N * 2^-53
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hash_sample(ids, 1.5).count()


def test_hash_split_disjoint_complete_and_sized(spark, ids):
    out = hash_split(ids, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    assert len(out) == N
    counts = {}
    for r in out:
        counts[r.split] = counts.get(r.split, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / N - 0.8) < 0.03
    assert abs(counts["val"] / N - 0.1) < 0.02
    with pytest.raises(ValueError):
        hash_split(ids, {"a": 0.5, "b": 0.3})


def test_stratified_take_quota_and_growth_stability(spark):
    rows = [(i, f"lang{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    taken = stratified_take(df, quota=20, strata_col="lang")
    got = {}
    for r in taken.collect():
        got.setdefault(r.lang, set()).add(r.doc_id)
    assert all(len(v) == 20 for v in got.values())
    # growth stability: adding docs only displaces hash-maxima — the
    # new selection differs from the old by AT MOST the added docs
    bigger = spark.createDataFrame(
        rows + [(1000 + i, f"lang{i % 3}") for i in range(30)],
        "doc_id long, lang string",
    )
    got2 = {}
    for r in stratified_take(bigger, quota=20, strata_col="lang").collect():
        got2.setdefault(r.lang, set()).add(r.doc_id)
    for lang in got:
        assert len(got2[lang]) == 20
        assert got[lang] >= got2[lang] - {d for d in got2[lang] if d >= 1000}


def test_hash_bucket_range_and_parity(spark, ids):
    out = hash_bucket(ids, 16).collect()
    assert all(0 <= r.bucket < 16 for r in out)
    # all buckets populated and roughly balanced at N=4000
    counts = {}
    for r in out:
        counts[r.bucket] = counts.get(r.bucket, 0) + 1
    assert len(counts) == 16
    assert max(counts.values()) < 2.0 * min(counts.values())
    with pytest.raises(ValueError):
        hash_bucket(ids, 0)


def test_shuffle_order_is_permutation_and_matches_global_window(spark, ids):
    out = shuffle_order(ids, salt="e0", num_partitions=8).collect()
    poss = sorted(r.pos for r in out)
    assert poss == list(range(N))  # an exact permutation
    # identical to the naive 1-task global window it avoids
    naive = {
        r.doc_id: r.pos
        for r in ids.select(
            "doc_id",
            (
                F.row_number().over(
                    Window.orderBy(_shifted(F.col("doc_id"), "e0"), "doc_id")
                )
                - 1
            ).cast("long").alias("pos"),
        ).collect()
    }
    assert {r.doc_id: r.pos for r in out} == naive
    # different salt -> different permutation (a fresh epoch)
    other = {r.doc_id: r.pos for r in shuffle_order(ids, salt="e1").collect()}
    assert other != {r.doc_id: r.pos for r in out}
    # plan: the ranking window is partitioned (parallel), never global
    plan = (
        shuffle_order(ids, salt="e0", num_partitions=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition(_pid" in plan, plan


def test_mix_corpora_rates_and_determinism(spark, ids):
    srcs = {
        "a": ids.filter(F.col("doc_id") % 2 == 0),
        "b": ids.filter(F.col("doc_id") % 2 == 1),
    }
    out = mix_corpora(srcs, {"a": 0.25, "b": 1.0}, salt="m1").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    assert by_src["b"] == {i for i in range(N) if i % 2 == 1}  # rate 1.0
    assert abs(len(by_src["a"]) / (N / 2) - 0.25) < 0.05
    # fates are independent per source: same keys, different salts
    again = mix_corpora(srcs, {"a": 0.25, "b": 1.0}, salt="m1").collect()
    assert {(r.doc_id, r.source) for r in again} == {
        (r.doc_id, r.source) for r in out
    }
    with pytest.raises(ValueError):
        mix_corpora(srcs, {"a": 0.25})  # rates keys mismatch


def test_sample_plan_is_codegen_filter(spark, ids):
    plan = (
        hash_sample(ids, 0.5)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestSelectToBudget:
    def _base(self, spark):
        # (key, score, sz): scores force order 4,3,2,1,0; sizes 10 each
        rows = [(i, i * 100, 10) for i in range(5)]
        return spark.createDataFrame(rows, "key long, score long, sz long")

    def test_greedy_prefix_exact_cut(self, spark):
        from jarvis_ocr_service_spark.functions.sampling import (
            select_to_budget,
        )

        out = select_to_budget(
            self._base(spark), 25, size_col="sz", score_col="score",
            key_col="key",
        ).collect()
        # budget 25 fits exactly the two best (cum 10, 20); the third
        # would reach 30 > 25 and stops the prefix
        assert sorted(r.key for r in out) == [3, 4]
        assert {r.key: r.cum_size for r in out} == {4: 10, 3: 20}

    def test_budget_zero_and_oversized(self, spark):
        from jarvis_ocr_service_spark.functions.sampling import (
            select_to_budget,
        )

        base = self._base(spark)
        assert select_to_budget(
            base, 0, size_col="sz", score_col="score", key_col="key"
        ).count() == 0
        assert select_to_budget(
            base, 10**9, size_col="sz", score_col="score", key_col="key"
        ).count() == 5

    def test_tie_breaks_on_key_ascending(self, spark):
        from jarvis_ocr_service_spark.functions.sampling import (
            select_to_budget,
        )

        rows = [(i, 7, 10) for i in range(4)]  # all scores tie
        df = spark.createDataFrame(rows, "key long, score long, sz long")
        out = select_to_budget(
            df, 20, size_col="sz", score_col="score", key_col="key"
        ).collect()
        assert sorted(r.key for r in out) == [0, 1]  # lowest keys win

    def test_matches_naive_window(self, spark):
        from pyspark.sql import Window

        from jarvis_ocr_service_spark.functions.sampling import (
            select_to_budget,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select(
            F.col("doc_id").alias("key"),
            F.col("n_chars").cast("long").alias("score"),
            (F.col("n_chars") % 97 + 1).cast("long").alias("sz"),
        )
        got = {
            r.key: r.cum_size
            for r in select_to_budget(
                docs, 5000, size_col="sz", score_col="score", key_col="key"
            ).collect()
        }
        w = Window.orderBy(F.desc("score"), F.asc("key")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        naive = (
            docs.withColumn("cum", F.sum("sz").over(w))
            .filter(F.col("cum") <= 5000)
            .collect()
        )
        assert got == {r.key: r.cum for r in naive}
        assert 0 < len(got) < docs.count()  # the budget bites

    def test_negative_budget_raises(self, spark):
        from jarvis_ocr_service_spark.functions.sampling import (
            select_to_budget,
        )

        with pytest.raises(ValueError, match="budget"):
            select_to_budget(self._base(spark), -1, size_col="sz",
                             score_col="score", key_col="key")


def test_upsample_epochs_brute_parity(spark):
    from jarvis_ocr_service_spark.functions.sampling import (
        _shifted,
        _threshold_signed,
        upsample_epochs,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    # ground truth for the fractional selection from the same hash family
    thr = _threshold_signed(0.45)
    sel = {
        r.doc_id
        for r in df.select("doc_id", _shifted(F.col("doc_id"), "epochs").alias("h"))
        .filter(F.col("h") < thr)
        .collect()
    }
    got = {}
    for r in upsample_epochs(df, 2.45).collect():
        got.setdefault(r.doc_id, []).append(r.epoch)
    for k in got:
        got[k].sort()
    assert got == {
        i: list(range(3 if i in sel else 2)) for i in range(200)
    }
    # the fraction is about right on 200 keys
    assert 0.30 * 200 < len(sel) < 0.60 * 200


def test_upsample_epochs_edge_cases(spark):
    from jarvis_ocr_service_spark.functions.sampling import upsample_epochs

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    # integer epochs: exactly n copies each, no hash branch
    rows = upsample_epochs(df, 2.0).collect()
    assert len(rows) == 200 and {r.epoch for r in rows} == {0, 1}
    # epochs < 1: plain sampling, epoch always 0
    sub = upsample_epochs(df, 0.3).collect()
    assert 0 < len(sub) < 100 and all(r.epoch == 0 for r in sub)
    # epochs = 0 drops everything; negative rejected
    assert upsample_epochs(df, 0.0).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        upsample_epochs(df, -0.1)


def test_upsample_epochs_plan_map_only(spark):
    from jarvis_ocr_service_spark.functions.sampling import upsample_epochs

    df = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    plan = upsample_epochs(df, 1.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
