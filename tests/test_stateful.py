"""Pending-validation state machine via applyInPandasWithState."""

from jarvis_ocr_service_spark.streaming.stateful import run_pending_validation_stream


def test_pending_validation_completions(spark, tmp_path):
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    rows = []
    # job A: 3 images, one valid -> success
    for idx, ok in enumerate([False, True, False]):
        rows.append(("job-A", idx, ok, 3))
    # job B: 2 images, none valid -> failed
    for idx in range(2):
        rows.append(("job-B", idx, False, 2))
    # job C: expects 3 but only 1 arrives -> stays pending (no completion yet)
    rows.append(("job-C", 0, True, 3))
    df = spark.createDataFrame(
        rows, "job_id string, image_index long, is_valid boolean, n_images long"
    )
    df.coalesce(1).write.parquet(inp)

    q = run_pending_validation_stream(spark, inp, out, ckpt)
    q.awaitTermination(120)

    got = {r.job_id: r for r in spark.read.parquet(out).collect()}
    assert got["job-A"].status == "success" and got["job-A"].n_valid == 1
    assert got["job-B"].status == "failed" and got["job-B"].n_received == 2
    assert "job-C" not in got  # pending in state, awaiting images or TTL

    # late arrivals for job C complete it on the next trigger
    late = spark.createDataFrame(
        [("job-C", 1, False, 3), ("job-C", 2, False, 3)],
        "job_id string, image_index long, is_valid boolean, n_images long",
    )
    late.coalesce(1).write.mode("append").parquet(inp)
    q2 = run_pending_validation_stream(spark, inp, out, ckpt)
    q2.awaitTermination(120)
    got2 = {r.job_id: r for r in spark.read.parquet(out).collect()}
    assert got2["job-C"].status == "success"  # image 0 was valid
    assert got2["job-C"].n_received == 3 and got2["job-C"].timed_out == "false"
