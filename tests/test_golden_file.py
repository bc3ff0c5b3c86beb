"""Stored-golden regression gate.

Unlike the oracle tests (which compare the Spark pipeline against the
*shared* pure-Python implementation and thus can't notice a consistent
semantic drift in that shared code), this test pins the pipeline output to
a golden file committed at tests/golden/pipeline_golden.json. Any change
to extraction/normalize/validate/truncate semantics fails here and forces
a deliberate golden regeneration."""

import hashlib
import json
import pathlib

import pytest

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "golden" / "pipeline_golden.json").read_text()
)


@pytest.fixture(scope="module")
def results(spark):
    from jarvis_ocr_service_spark.plans.pipeline import run_pipeline
    from jarvis_ocr_service_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, len(GOLDEN), seed=42, num_partitions=4)
    return {r["url"]: r for r in run_pipeline(pages).collect()}


def test_pipeline_matches_committed_golden(results):
    assert len(results) == len(GOLDEN)
    for g in GOLDEN:
        got = results[g["url"]]
        assert hashlib.sha256(got.text.encode("utf-8")).hexdigest() == g["text_sha256"], g["url"]
        assert got.text_len == g["text_len"]
        assert got.tier == g["tier"]
        assert got.is_valid == g["is_valid"]
        assert got.truncated == g["truncated"]
        assert got.error_code == g["error_code"]
        assert repr(got.confidence) == g["confidence"]
        assert len(got.spans) == g["n_spans"]
