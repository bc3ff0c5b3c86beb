"""End-to-end golden test: Spark pipeline output is byte-identical per url
to the pure-Python oracle; fused == staged; aggregates follow the
reference rules."""

import pytest
from pyspark.sql import functions as F

from jarvis_ocr_service_spark.plans.pipeline import (
    batch_escalation_gate,
    error_counters,
    run_pipeline,
    status_by_host,
)
from jarvis_ocr_service_spark.sources.pages import (
    expected_result,
    synthesize_pages,
)

N = 200  # covers every content class 20x with varied hosts/langs


@pytest.fixture(scope="module")
def results(spark):
    pages = synthesize_pages(spark, N, seed=42, num_partitions=4)
    return {r["url"]: r for r in run_pipeline(pages).collect()}


def test_row_count_and_url_uniqueness(results):
    assert len(results) == N


def test_byte_identical_text_per_url(results):
    """THE correctness gate (BASELINE.json): extracted text per url must
    equal the oracle byte-for-byte."""
    for i in range(N):
        exp = expected_result(i, seed=42)
        got = results[exp["url"]]
        assert got.text.encode("utf-8") == exp["text"].encode("utf-8"), exp["url"]


def test_full_result_fields_match_oracle(results):
    for i in range(N):
        exp = expected_result(i, seed=42)
        got = results[exp["url"]]
        assert got.truncated == exp["truncated"]
        assert got.is_valid == exp["is_valid"]
        assert got.tier == exp["tier"]
        assert got.error_code == exp["error_code"]
        assert got.error_message == exp["error_message"]
        assert got.validation_reason == exp["validation_reason"]
        assert got.text_len == exp["text_len"]
        assert got.confidence == pytest.approx(exp["confidence"], abs=0)
        assert got.content_kind == exp["content_kind"]
        assert [(s.start, s.end, s.tag) for s in got.spans] == [
            tuple(t) for t in exp["spans"]
        ]


def test_staged_strategy_equals_fused(spark):
    pages = synthesize_pages(spark, 60, seed=42, num_partitions=2)
    fused = {r["url"]: r for r in run_pipeline(pages, strategy="fused").collect()}
    staged = {r["url"]: r for r in run_pipeline(pages, strategy="staged").collect()}
    assert set(fused) == set(staged)
    for url, f in fused.items():
        s = staged[url]
        assert (f.text, f.tier, f.is_valid, f.error_code, f.validation_reason) == (
            s.text, s.tier, s.is_valid, s.error_code, s.validation_reason
        ), url


def test_dedup_extract_strategy_equals_fused(spark):
    """dedup_extract (one extraction per distinct payload+lang, joined
    back) must be row-for-row identical to fused — extraction is a pure
    function. The synth corpus repeats payloads heavily (PNG/empty/short
    classes), so the distinct side really is smaller."""
    pages = synthesize_pages(spark, 80, seed=42, num_partitions=4)
    fused = {r["url"]: r for r in run_pipeline(pages, strategy="fused").collect()}
    dd = {
        r["url"]: r
        for r in run_pipeline(pages, strategy="dedup_extract").collect()
    }
    assert set(fused) == set(dd) and len(dd) == 80
    for url, f in fused.items():
        d = dd[url]
        assert (f.text, f.tier, f.is_valid, f.error_code, f.confidence,
                f.text_len, f.truncated, f.spans) == (
            d.text, d.tier, d.is_valid, d.error_code, d.confidence,
            d.text_len, d.truncated, d.spans
        ), url


def test_staged_handles_multiple_snapshots_per_url(spark):
    """A crawl can hold several snapshots of one url (that's why the schema
    carries warc_ts). The staged strategy's cursor joins must key on
    (url, warc_ts) — a url-only join would fan out and diverge from fused."""
    base = synthesize_pages(spark, 40, seed=42, num_partitions=2)
    dup = base.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAY")
    )
    pages = base.unionByName(dup)  # every url twice, distinct warc_ts
    fused = {
        (r["url"], r["warc_ts"]): r
        for r in run_pipeline(pages, strategy="fused").collect()
    }
    staged = {
        (r["url"], r["warc_ts"]): r
        for r in run_pipeline(pages, strategy="staged").collect()
    }
    assert len(fused) == 80 and set(fused) == set(staged)
    for key, f in fused.items():
        s = staged[key]
        assert (f.text, f.tier, f.is_valid, f.error_code) == (
            s.text, s.tier, s.is_valid, s.error_code
        ), key


def test_status_by_host_bool_or_rule(spark):
    pages = synthesize_pages(spark, N, seed=42, num_partitions=4)
    res = run_pipeline(pages)
    status = {r["host"]: r for r in status_by_host(res).collect()}
    # recompute from oracle
    from collections import defaultdict
    from urllib.parse import urlparse

    per_host = defaultdict(list)
    for i in range(N):
        exp = expected_result(i, seed=42)
        per_host[urlparse(exp["url"]).netloc].append(exp["is_valid"])
    for host, valids in per_host.items():
        row = status[host]
        assert row.status == ("success" if any(valids) else "failed")
        assert row.valid_count == sum(valids)
        assert row.total_count == len(valids)


def test_error_counters(spark, results):
    pages = synthesize_pages(spark, N, seed=42, num_partitions=4)
    counts = {r["code"]: r["n"] for r in error_counters(run_pipeline(pages)).collect()}
    from collections import Counter

    exp = Counter(
        (expected_result(i, seed=42)["error_code"] or "ok") for i in range(N)
    )
    assert counts == dict(exp)


def test_batch_escalation_gate_bool_and(spark):
    pages = synthesize_pages(spark, 50, seed=42, num_partitions=2)
    gate = {r["lang"]: r for r in batch_escalation_gate(run_pipeline(pages)).collect()}
    from collections import defaultdict

    exp = defaultdict(list)
    for i in range(50):
        e = expected_result(i, seed=42)
        exp[e["language"]].append(e["is_valid"])
    for lang, valids in exp.items():
        assert gate[lang].all_valid == all(valids), lang
        assert gate[lang].batch_size == len(valids)
    assert sum(r.batch_size for r in gate.values()) == 50


def test_refresh_pages_text_write_back(spark):
    from jarvis_ocr_service_spark.plans.pipeline import refresh_pages_text

    pages = synthesize_pages(spark, 50, seed=42, num_partitions=2)
    res = run_pipeline(pages)
    updated = refresh_pages_text(pages, res)
    assert updated.columns == ["url", "warc_ts", "html", "text", "lang", "spans"]
    rows = {r.url: r for r in updated.collect()}
    assert len(rows) == 50
    for i in range(50):
        exp = expected_result(i, seed=42)
        got = rows[exp["url"]]
        if exp["is_valid"]:
            assert got.text == exp["text"]
        else:
            assert got.text == ""


def test_extraction_plan_is_shuffle_free(spark):
    """The fused pipeline must be a pure map job: no Exchange in the plan."""
    pages = synthesize_pages(spark, 10, seed=42, num_partitions=2)
    plan = run_pipeline(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
