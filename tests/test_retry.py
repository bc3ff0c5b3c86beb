"""Retry flow: taxonomy column, attempt stamping, flaky-tier convergence."""

import pytest
from pyspark.sql import functions as F

from jarvis_ocr_service_spark.config import should_retry
from jarvis_ocr_service_spark.plans.retry import (
    run_with_retries,
    should_retry_col,
    split_retryable,
)


def test_should_retry_taxonomy_scalar():
    assert should_retry("ocr_engine_error", 1)
    assert should_retry("redis_error", 2)
    assert not should_retry("ocr_engine_error", 3)  # budget exhausted
    assert not should_retry("bad_request", 1)  # never retryable
    assert not should_retry("unsupported_media", 1)
    assert not should_retry("image_not_found", 1)
    assert not should_retry("ocr_no_valid_output", 1)  # not in retryable set


def test_should_retry_col_matches_scalar(spark):
    codes = [
        "ocr_engine_error", "file_read_error", "redis_error", "internal_error",
        "bad_request", "image_not_found", "schema_invalid", "unsupported_media",
        "ocr_no_valid_output",
    ]
    rows = [(c, a) for c in codes for a in (1, 2, 3)]
    df = spark.createDataFrame(rows, "error_code string, attempt int")
    got = df.withColumn("r", should_retry_col(F.col("error_code"), F.col("attempt"))).collect()
    for r in got:
        assert r.r == should_retry(r.error_code, r.attempt), (r.error_code, r.attempt)


def test_split_retryable_stamps_attempt(spark):
    df = spark.createDataFrame(
        [("a", "ocr_engine_error", 1), ("b", None, 1), ("c", "bad_request", 1)],
        "url string, error_code string, attempt int",
    )
    final, retry = split_retryable(df)
    assert {r.url for r in final.collect()} == {"b", "c"}
    r = retry.collect()
    assert [x.url for x in r] == ["a"] and r[0].attempt == 2


def test_flaky_tier_converges(spark):
    """A pipeline that fails transiently on pass 1 must succeed on pass 2
    with attempt=2 recorded."""
    pages = spark.createDataFrame(
        [("u1", "good"), ("u2", "flaky")], "url string, text string"
    )
    calls = {"n": 0}

    def pipeline_fn(df):
        # pass 1: 'flaky' rows fail with a transient code; pass 2+: succeed
        calls["n"] += 1
        first = calls["n"] == 1
        err = F.when(
            (F.col("text") == "flaky") & F.lit(first), F.lit("ocr_engine_error")
        ).otherwise(F.lit(None).cast("string"))
        return df.select("url", err.alias("error_code"))

    out = run_with_retries(pages, pipeline_fn).collect()
    got = {r.url: (r.error_code, r.attempt) for r in out}
    assert got["u1"] == (None, 1)
    assert got["u2"] == (None, 2)  # succeeded on retry, attempt stamped
