"""Completion-message assembly: nested envelope, index-ordered results,
any-valid status (reference queue_schemas.create_completion_message),
and the 8-images-per-job cap that keeps hot hosts from building
unbounded collect_list rows (reference queue_schemas.py:67-68)."""

from collections import defaultdict

from jarvis_ocr_service_spark.plans.pipeline import completion_messages, run_pipeline
from jarvis_ocr_service_spark.sources.pages import synthesize_pages


def test_completion_envelope_shape_and_rules(spark):
    results = run_pipeline(synthesize_pages(spark, 100, num_partitions=2))
    msgs = completion_messages(results).collect()
    assert msgs, "at least one job"
    total_images = sum(len(m.payload.results) for m in msgs)
    assert total_images == 100

    per_host = defaultdict(int)
    for m in msgs:
        assert m.schema_version == 1 and m.job_type == "ocr.completed"
        assert m.attempt == 1
        assert len(m.job_id) == 36  # uuid
        res = m.payload.results
        # the reference's job cap: never more than 8 images per envelope
        assert 1 <= len(res) <= 8
        # results[] aligned and ordered by index (reference worker.py:309)
        assert [r["index"] for r in res] == list(range(len(res)))
        # any-valid rule (queue_schemas.py:139-147), per envelope
        any_valid = any(r.meta.is_valid for r in res)
        assert m.payload.status == ("success" if any_valid else "failed")
        for r in res:
            assert r.meta.text_len == len(r.ocr_text.encode("utf-8"))
        per_host[m.workflow_id] += len(res)

    # hot host (20% of the corpus) exists, has many images, and is CHUNKED
    # into multiple bounded envelopes instead of one giant array row
    assert per_host["hot.example.com"] >= 10
    n_hot_envelopes = sum(
        1 for m in msgs if m.workflow_id == "hot.example.com"
    )
    assert n_hot_envelopes >= 2


def test_completion_unbounded_compat_mode(spark):
    """max_per_job=0 restores the one-envelope-per-host form (compat)."""
    results = run_pipeline(synthesize_pages(spark, 60, num_partitions=2))
    msgs = completion_messages(results, max_per_job=0).collect()
    by_wf = {m.workflow_id: m for m in msgs}
    assert len(by_wf) == len(msgs)  # exactly one envelope per host
    hot = by_wf["hot.example.com"]
    assert len(hot.payload.results) >= 10
    assert [r["index"] for r in hot.payload.results] == list(
        range(len(hot.payload.results))
    )


def test_completion_meta_only_drops_text(spark):
    """include_text=False: bookkeeping envelopes don't carry full texts
    through the shuffle — meta (with text_len) is kept."""
    results = run_pipeline(synthesize_pages(spark, 40, num_partitions=2))
    msgs = completion_messages(results, include_text=False).collect()
    assert sum(len(m.payload.results) for m in msgs) == 40
    for m in msgs:
        for r in m.payload.results:
            assert "ocr_text" not in r.asDict()
            assert r.meta.text_len is not None


def test_completion_deterministic_modulo_stamps(spark):
    results = run_pipeline(synthesize_pages(spark, 40, num_partitions=2))
    a = completion_messages(results).collect()
    b = completion_messages(results).collect()
    strip = lambda ms: sorted(
        (m.workflow_id, m.payload.status, tuple((r["index"], r.url, r.ocr_text) for r in m.payload.results))
        for m in ms
    )
    assert strip(a) == strip(b)  # uuid/created_at differ, content identical
