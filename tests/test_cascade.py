"""Per-document cascade semantics (pure-Python oracle level)."""

import pytest

from jarvis_ocr_service_spark.config import MAX_TEXT_BYTES
from jarvis_ocr_service_spark.operators.cascade import (
    PDF_MODE_REJECT,
    extract_document,
)
from jarvis_ocr_service_spark.operators.extract_pdf import build_minimal_pdf
from jarvis_ocr_service_spark.sources.pages import _PNG_BYTES


def test_clean_html_accepted_at_tier1():
    html = b"<html><body><article><p>A real paragraph of readable words for the validator to accept.</p></article></body></html>"
    r = extract_document(html, "en")
    assert r["is_valid"] and r["tier"] == "tesseract"
    assert r["error_code"] is None
    assert r["text_len"] == len(r["text"].encode("utf-8"))
    assert r["spans"] and r["spans"][0][2] == "article" or r["spans"]


def test_boilerplate_html_escalates_to_tier2():
    nav = "".join(f'<li><a href="/c{k}">Cat {k}</a></li>' for k in range(25))
    html = (
        "<html><body><nav><ul>" + nav + "</ul></nav><article>"
        "<p>Real content paragraph with plenty of readable words inside it.</p>"
        "<p>Another real paragraph with readable content for scoring well.</p>"
        "</article></body></html>"
    ).encode()
    r = extract_document(html, "en")
    assert r["is_valid"] and r["tier"] == "easyocr"
    assert "Cat 0" not in r["text"]
    assert "Real content paragraph" in r["text"]


def test_pdf_parse_mode():
    pdf = build_minimal_pdf(["Extracted line one of content", "And line two here"])
    r = extract_document(pdf, "en")
    assert r["is_valid"] and r["tier"] == "paddleocr"
    assert r["text"].splitlines()[0] == "Extracted line one of content"


def test_pdf_reject_mode_reference_v1():
    pdf = build_minimal_pdf(["anything"])
    r = extract_document(pdf, "en", pdf_mode=PDF_MODE_REJECT)
    assert r["error_code"] == "unsupported_media"
    assert r["error_message"] == "PDF files are not supported in v1"
    assert r["validation_reason"] == "PDF files are not supported in v1"
    assert r["tier"] == "unknown" and not r["is_valid"] and r["text"] == ""


def test_image_without_ocr_backend_all_tiers_skipped():
    r = extract_document(_PNG_BYTES, "en")
    assert r["error_code"] == "ocr_no_valid_output"
    assert r["tier"] == "unknown"  # no tier attempted -> reference last_tier None
    assert r["validation_reason"] == "All tiers failed validation"


def test_garbled_text_fails_with_last_tier():
    r = extract_document(b"xkcd qwrtz bcdfg hjklm npqrst wvxz brrr", "en")
    assert r["error_code"] == "ocr_no_valid_output"
    assert r["tier"] == "tesseract"  # the tier that attempted and rejected
    assert "Garbled" in r["validation_reason"]
    assert r["confidence"] == 0.0


def test_empty_payload():
    r = extract_document(b"", "en")
    assert r["error_code"] == "image_not_found"
    r2 = extract_document(None, "en")
    assert r2["error_code"] == "image_not_found"


def test_truncation_flag_and_byte_cap():
    big = ("word " * (MAX_TEXT_BYTES // 4)).encode()
    r = extract_document(big, "en")
    assert r["is_valid"] and r["truncated"]
    assert r["text_len"] <= MAX_TEXT_BYTES
    r["text"].encode("utf-8").decode("utf-8")


def test_enabled_tiers_filter_preserves_order():
    html = b"<html><body><p>Readable words in a paragraph for validation.</p></body></html>"
    # only tier2 enabled -> accepted at easyocr
    r = extract_document(html, "en", enabled_tiers=["easyocr"])
    assert r["tier"] == "easyocr"
    # order filtering: bogus names ignored
    r2 = extract_document(html, "en", enabled_tiers=["easyocr", "tesseract", "nope"])
    assert r2["tier"] == "tesseract"  # DEFAULT_TIER_ORDER wins, not list order


def test_language_hint_mapping():
    """T6/O4: 2->3-letter tesseract map, first-3 slice, '+' join,
    pass-through lowercase default (tesseract_provider.py:42-46)."""
    from jarvis_ocr_service_spark.operators.extract_image import map_language_hints

    assert map_language_hints(["en"]) == "eng"
    assert map_language_hints(["EN", "fr", "de"]) == "eng+fra+deu"
    assert map_language_hints(["en", "fr", "de", "es"]) == "eng+fra+deu"  # [:3]
    assert map_language_hints(["zz"]) == "zz"  # unknown passes through
    assert map_language_hints([]) == ""


def test_total_function_on_junk():
    for junk in (b"\x00\xff\xfe", b"<" * 10000, bytes(range(256)) * 4):
        r = extract_document(junk, "en")
        assert isinstance(r["text"], str)


def test_spans_clipped_on_truncation():
    big = ("word " * (MAX_TEXT_BYTES // 4)).encode()
    r = extract_document(big, "en")
    for s, e, _ in r["spans"]:
        assert e <= len(r["text"])


# --- specific-provider (pinned) mode: validation bypassed --------------------

def test_pinned_tier_skips_validation():
    """Reference provider_manager.py:329-345: a pinned provider's output is
    returned as-is — no validity loop. Garbled text that the cascade would
    reject must come back accepted."""
    from jarvis_ocr_service_spark.operators.cascade import extract_document

    garbled = b"xkcd qwrtz bcdfg hjklm npqrst wvxz brrr kpft"
    cascade = extract_document(garbled, "en")
    assert not cascade["is_valid"]  # the validator rejects it...
    pinned = extract_document(garbled, "en", pinned_tier="tesseract")
    assert pinned["is_valid"]  # ...but the pinned path returns it anyway
    assert pinned["text"] == garbled.decode()
    assert pinned["tier"] == "tesseract"
    assert pinned["validation_reason"] is None
    assert pinned["error_code"] is None


def test_pinned_tier_unavailable_maps_to_bad_request():
    from jarvis_ocr_service_spark.operators.cascade import extract_document

    r = extract_document(b"some text here", "en", pinned_tier="llm_cloud")
    assert r["error_code"] == "bad_request"
    assert "not available" in r["error_message"]
    # inapplicable kind (PDF tier pinned on plain text) is also unavailable
    r2 = extract_document(b"some text here", "en", pinned_tier="paddleocr")
    assert r2["error_code"] == "bad_request"


def test_pinned_tier_distributed(spark):
    from jarvis_ocr_service_spark.plans.pipeline import run_pipeline
    from jarvis_ocr_service_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, 30, num_partitions=2)
    res = run_pipeline(pages, pinned_tier="easyocr").collect()
    assert len(res) == 30
    for r in res:
        # every HTML row comes back from easyocr unvalidated; non-HTML
        # kinds map to bad_request/terminal codes
        if r.tier == "easyocr":
            assert r.is_valid and r.validation_reason is None
