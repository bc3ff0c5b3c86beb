"""HTML block extraction: raw tier, main-content tier, spans contract."""

from jarvis_ocr_service_spark.operators.extract_html import (
    extract_main,
    extract_raw,
    parse_blocks,
)
from jarvis_ocr_service_spark.operators.textops import normalize_text

PAGE = b"""<!DOCTYPE html><html><head><title>T</title>
<script>var x = "<p>not text</p>";</script>
<style>p{color:red}</style></head>
<body>
<nav><a href="/a">Home</a><a href="/b">Shop</a></nav>
<article>
<p>First paragraph with enough words to be a real block of content.</p>
<p>Second &amp; final paragraph &#8212; with entities.</p>
</article>
<div><a href="/x">Pure link block</a></div>
<footer><a href="/about">About us</a></footer>
</body></html>""".decode().encode()


def test_raw_includes_boilerplate():
    text, spans = extract_raw(PAGE.decode())
    assert "Home" in text and "About us" in text
    assert "First paragraph" in text
    assert "not text" not in text  # script content skipped
    assert "color:red" not in text  # style skipped
    assert "T" == text.splitlines()[0][:1] or "T" not in text.splitlines()[0]


def test_main_strips_boilerplate_and_link_blocks():
    text, spans = extract_main(PAGE.decode())
    assert "First paragraph" in text
    assert "Second & final paragraph" in text  # entity decoded
    assert "—" in text  # &#8212; decoded
    assert "Home" not in text  # nav stripped
    assert "About us" not in text  # footer stripped
    assert "Pure link block" not in text  # link density 1.0


def test_spans_index_into_text():
    for fn in (extract_raw, extract_main):
        text, spans = fn(PAGE.decode())
        for start, end, tag in spans:
            assert 0 <= start < end <= len(text)
            assert text[start:end].strip()
        # spans are ordered and non-overlapping
        for (s1, e1, _), (s2, e2, _) in zip(spans, spans[1:]):
            assert e1 < s2


def test_output_is_normalize_stable():
    for fn in (extract_raw, extract_main):
        text, _ = fn(PAGE.decode())
        assert normalize_text(text) == text


def test_malformed_html_never_raises():
    for junk in ("<div><p>unclosed", "<<<<>>>>", "a<b>c</q></p>", "<a href=>x", ""):
        extract_raw(junk)
        extract_main(junk)


def test_link_density_feature():
    blocks = parse_blocks('<body><p>Plain words here</p><p><a href="/">all link</a></p></body>')
    assert blocks[0].link_density == 0.0
    assert blocks[1].link_density == 1.0


def test_nested_boilerplate_blocks_tagged():
    blocks = parse_blocks("<body><nav><ul><li>One</li><li>Two</li></ul></nav><p>Body</p></body>")
    boiler = [b for b in blocks if b.boiler]
    content = [b for b in blocks if not b.boiler]
    assert {b.text.strip() for b in boiler} == {"One", "Two"}
    assert [b.text.strip() for b in content] == ["Body"]


def test_text_directly_inside_nav_not_merged_into_content():
    blocks = parse_blocks("<body><p>Article</p><nav>Menu text</nav></body>")
    art = [b for b in blocks if b.text.strip() == "Article"]
    nav = [b for b in blocks if b.text.strip() == "Menu text"]
    assert art and not art[0].boiler
    assert nav and nav[0].boiler
