"""Minimal PDF parse: builder round-trip, escapes, spans."""

from jarvis_ocr_service_spark.operators.extract_pdf import (
    build_minimal_pdf,
    extract_pdf_text,
)


def test_round_trip():
    lines = ["Hello world", "Second line of text", "Third"]
    pdf = build_minimal_pdf(lines)
    assert pdf.startswith(b"%PDF-")
    text, spans = extract_pdf_text(pdf)
    assert text == "\n".join(lines)
    assert [text[s:e] for s, e, _ in spans] == lines
    assert all(tag == "line" for _, _, tag in spans)


def test_escaped_parens_and_backslash():
    lines = [r"func(x) returns (a\b)", "plain"]
    text, _ = extract_pdf_text(build_minimal_pdf(lines))
    assert text.splitlines()[0] == r"func(x) returns (a\b)"


def test_empty_lines_skipped():
    text, spans = extract_pdf_text(build_minimal_pdf(["a", "", "  ", "b"]))
    assert text == "a\nb"
    assert len(spans) == 2


def test_garbage_never_raises():
    for junk in (b"%PDF-1.4 garbage no streams", b"%PDF-", b"%PDF-\x00\xff" * 100):
        text, spans = extract_pdf_text(junk)
        assert isinstance(text, str)


def test_layout_positions():
    from jarvis_ocr_service_spark.operators.extract_pdf import extract_pdf_layout

    lines = ["first line", "second line", "third"]
    layout = extract_pdf_layout(build_minimal_pdf(lines))
    assert [t for t, _, _ in layout] == lines
    xs = [x for _, x, _ in layout]
    ys = [y for _, _, y in layout]
    assert xs == [72.0, 72.0, 72.0]
    assert ys == [720.0, 706.0, 692.0]  # T* advances by the 14pt leading
    # bottom-left origin: later lines are lower on the page
    assert ys == sorted(ys, reverse=True)


def test_layout_tm_and_td():
    from jarvis_ocr_service_spark.operators.extract_pdf import extract_pdf_layout

    content = b"BT 1 0 0 1 100 500 Tm (at tm) Tj 10 -20 Td (moved) Tj ET"
    pdf = b"%PDF-1.4\n" + content + b"\n%%EOF"
    layout = extract_pdf_layout(pdf)
    assert layout == [("at tm", 100.0, 500.0), ("moved", 110.0, 480.0)]


def test_flate_stream():
    import zlib

    content = b"BT (compressed text here) Tj ET"
    pdf = (
        b"%PDF-1.4\n1 0 obj << /Filter /FlateDecode /Length 99 >>\nstream\n"
        + zlib.compress(content)
        + b"\nendstream\nendobj\n%%EOF"
    )
    text, _ = extract_pdf_text(pdf)
    assert text == "compressed text here"
