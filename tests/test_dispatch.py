"""Content-kind sniffing: pure function == Column expression."""

import pytest

from jarvis_ocr_service_spark.operators.dispatch import content_kind_col, sniff_kind
from jarvis_ocr_service_spark.operators.extract_pdf import build_minimal_pdf
from jarvis_ocr_service_spark.sources.pages import _PNG_BYTES

import codecs

CASES = [
    (b"", "empty"),
    (codecs.BOM_UTF16_LE + "<html>x</html>".encode("utf-16-le"), "html"),
    (codecs.BOM_UTF16_BE + "  <html>x</html>".encode("utf-16-be"), "html"),
    (codecs.BOM_UTF8 + b"<html>x</html>", "html"),
    (codecs.BOM_UTF16_LE + "plain words".encode("utf-16-le"), "text"),
    (b"\x00<html>", "text"),  # NUL without BOM stays text
    (b"junk \xff\xfe mid", "text"),  # BOM bytes mid-payload: not a BOM
    (b"%PDF-1.4 rest", "pdf"),
    (_PNG_BYTES, "image"),
    (b"\xff\xd8\xff\xe0jpeg", "image"),
    (b"GIF89a....", "image"),
    (b"<!DOCTYPE html><html></html>", "html"),
    (b"  \n\t <html>x</html>", "html"),
    (b"plain old text", "text"),
    (b"\x01\x02binary junk", "text"),
    (build_minimal_pdf(["x"]), "pdf"),
]


@pytest.mark.parametrize("payload,kind", CASES)
def test_sniff_kind(payload, kind):
    assert sniff_kind(payload) == kind


def test_column_form_matches_pure_function(spark):
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, (p, _) in enumerate(CASES)], "i int, b binary"
    )
    rows = df.select("i", content_kind_col("b").alias("k")).orderBy("i").collect()
    for (payload, kind), row in zip(CASES, rows):
        assert row.k == kind, payload[:20]
