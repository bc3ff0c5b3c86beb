"""Whole-batch escalation mode (the reference's HTTP-batch semantic)."""

import pytest
from pyspark.sql import functions as F

from jarvis_ocr_service_spark.plans.pipeline import run_batch_escalation


def _mk_pages(spark, rows):
    return spark.createDataFrame(
        [(u, None, bytearray(h), "", b) for (u, h, b) in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


CLEAN = b"<html><body><article><p>Readable paragraph with plenty of words for validation to accept.</p></article></body></html>"
NAV = ("<html><body><nav><ul>"
       + "".join(f'<li><a href="/c{k}">Cat {k}</a></li>' for k in range(25))
       + "</ul></nav><article><p>Real content paragraph with readable words in it for scoring.</p></article></body></html>").encode()
GARBLED = b"xkcd qwrtz bcdfg hjklm npqrst wvxz brrr kpft"


def test_whole_batch_escalates_on_any_invalid(spark):
    # batch A: clean + boilerplate -> tier1 fails the nav page -> the
    # WHOLE batch (clean page included) re-runs and accepts at tier2.
    # batch B: all clean -> accepted at tier1.
    rows = [
        ("https://a/1", CLEAN, "A"),
        ("https://a/2", NAV, "A"),
        ("https://b/1", CLEAN, "B"),
        ("https://b/2", CLEAN, "B"),
    ]
    res = {
        r.url: r
        for r in run_batch_escalation(
            _mk_pages(spark, rows), F.col("lang")
        ).collect()
    }
    assert res["https://b/1"].tier == "tesseract"  # batch B never escalated
    assert res["https://b/2"].tier == "tesseract"
    # batch A: every row carries the tier-2 result — including the clean
    # page that tier-1 would have accepted (reference semantics)
    assert res["https://a/1"].tier == "easyocr"
    assert res["https://a/2"].tier == "easyocr"
    assert all(res[u].is_valid for u, _, _ in rows)


def test_unsatisfiable_batch_keeps_last_tier_rows(spark):
    rows = [
        ("https://c/1", CLEAN, "C"),
        ("https://c/2", GARBLED, "C"),  # fails every tier
    ]
    res = {
        r.url: r
        for r in run_batch_escalation(_mk_pages(spark, rows), F.col("lang")).collect()
    }
    assert len(res) == 2
    assert not res["https://c/2"].is_valid
    assert res["https://c/2"].error_code == "ocr_no_valid_output"
    # the clean row reports the last tier tried, valid per-row
    assert res["https://c/1"].is_valid


def test_terminal_errors_do_not_block_the_batch(spark):
    rows = [
        ("https://d/1", CLEAN, "D"),
        ("https://d/2", b"", "D"),  # empty payload: terminal, not tier-fixable
    ]
    res = {
        r.url: r
        for r in run_batch_escalation(_mk_pages(spark, rows), F.col("lang")).collect()
    }
    assert res["https://d/1"].tier == "tesseract"  # no pointless escalation
    assert res["https://d/2"].error_code == "image_not_found"
