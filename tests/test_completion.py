"""Completion-message assembly: nested envelope, index-ordered results,
any-valid status (reference queue_schemas.create_completion_message)."""

from jarvis_ocr_service_spark.plans.pipeline import completion_messages, run_pipeline
from jarvis_ocr_service_spark.sources.pages import synthesize_pages


def test_completion_envelope_shape_and_rules(spark):
    results = run_pipeline(synthesize_pages(spark, 100, num_partitions=2))
    msgs = completion_messages(results).collect()
    assert msgs, "at least one job"
    by_wf = {m.workflow_id: m for m in msgs}
    total_images = sum(len(m.payload.results) for m in msgs)
    assert total_images == 100

    for m in msgs:
        assert m.schema_version == 1 and m.job_type == "ocr.completed"
        assert m.attempt == 1
        assert len(m.job_id) == 36  # uuid
        res = m.payload.results
        # results[] aligned and ordered by index (reference worker.py:309)
        assert [r["index"] for r in res] == list(range(len(res)))
        # any-valid rule (queue_schemas.py:139-147)
        any_valid = any(r.meta.is_valid for r in res)
        assert m.payload.status == ("success" if any_valid else "failed")
        for r in res:
            assert r.meta.text_len == len(r.ocr_text.encode("utf-8"))

    # hot host job exists and has many images
    hot = by_wf.get("hot.example.com")
    assert hot is not None and len(hot.payload.results) >= 10


def test_completion_deterministic_modulo_stamps(spark):
    results = run_pipeline(synthesize_pages(spark, 40, num_partitions=2))
    a = completion_messages(results).collect()
    b = completion_messages(results).collect()
    strip = lambda ms: sorted(
        (m.workflow_id, m.payload.status, tuple((r["index"], r.url, r.ocr_text) for r in m.payload.results))
        for m in ms
    )
    assert strip(a) == strip(b)  # uuid/created_at differ, content identical
