"""Charset sniffing: BOMs, strict UTF-8, meta charset, fallbacks — and
the cascade extracting non-UTF-8 pages correctly."""

import codecs

from jarvis_ocr_service_spark.operators.cascade import extract_document
from jarvis_ocr_service_spark.operators.charset import decode_payload, sniff_charset


def test_utf8_and_ascii():
    assert sniff_charset("héllo".encode("utf-8")) == "utf-8"
    assert sniff_charset(b"plain ascii") == "utf-8"


def test_boms():
    assert sniff_charset(codecs.BOM_UTF8 + b"x") == "utf-8-sig"
    assert sniff_charset("hé".encode("utf-16-le") and codecs.BOM_UTF16_LE + "hé".encode("utf-16-le")) == "utf-16-le"
    assert decode_payload(codecs.BOM_UTF8 + "hé".encode("utf-8")) == "hé"
    assert decode_payload(codecs.BOM_UTF16_LE + "hé".encode("utf-16-le")) == "hé"
    assert decode_payload(codecs.BOM_UTF16_BE + "hé".encode("utf-16-be")) == "hé"


def test_meta_charset_latin1():
    html = '<html><head><meta charset="iso-8859-1"></head><body><p>caf\xe9 cr\xe8me</p></body></html>'
    payload = html.encode("latin-1")
    assert sniff_charset(payload) == "latin-1"
    assert "café crème" in decode_payload(payload)


def test_meta_http_equiv():
    html = '<meta http-equiv="Content-Type" content="text/html; charset=windows-1252"><p>d\x92accord</p>'
    payload = html.encode("latin-1")
    assert sniff_charset(payload) == "cp1252"
    assert "d’accord" in decode_payload(payload)  # cp1252 0x92 = ’


def test_unknown_declared_charset_falls_back():
    payload = '<meta charset="not-a-charset"><p>x\xe9</p>'.encode("latin-1")
    assert sniff_charset(payload) == "latin-1"
    decode_payload(payload)


def test_undeclared_binaryish_falls_back_total():
    payload = b"<html>\xff\xfe\xfa garbled bytes \xee</html>"
    assert sniff_charset(payload) == "latin-1"
    decode_payload(payload)


def test_cascade_extracts_latin1_page():
    body = "Le caf\xe9 et la cr\xe8me sont pr\xeats pour le client ce matin."
    html = (
        '<html><head><meta charset="iso-8859-1"><title>t</title></head>'
        f"<body><article><p>{body}</p></article></body></html>"
    ).encode("latin-1")
    r = extract_document(html, "fr")
    assert r["is_valid"]
    assert r["text"] == body  # accents decoded correctly, not mojibake


def test_cascade_extracts_utf16_page():
    body = "Readable words in a paragraph for validation to accept here."
    html = (codecs.BOM_UTF16_LE + f"<html><body><p>{body}</p></body></html>".encode("utf-16-le"))
    # NB: utf-16 payload starts with the BOM bytes, not '<' — dispatch
    # sniffs it as 'text' kind? The BOM is \xff\xfe which is not '<'.
    from jarvis_ocr_service_spark.operators.dispatch import sniff_kind

    kind = sniff_kind(html)
    r = extract_document(html, "en")
    # Whatever the dispatch kind, decoding must produce the words, not
    # NUL-interleaved mojibake.
    assert body.split()[0] in r["text"]
