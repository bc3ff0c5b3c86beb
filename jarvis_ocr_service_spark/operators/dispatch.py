"""Content-kind dispatch: classify a page payload by magic bytes.

The reference routes by ``kind``/content-type and rejects PDFs by suffix or
header (/root/reference/app/image_resolver.py:25-57, worker.py:82-141). In
a web corpus the payload *is* the bytes, so we sniff magic bytes instead —
available both as a pure function (oracle / inside the Arrow stage) and as
a JVM-side Column expression (so Catalyst can prune branches before any
Python runs).

Kinds: ``html | pdf | image | text | empty``.
"""

from __future__ import annotations

_PDF_MAGIC = b"%PDF-"
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_MAGIC = b"\xff\xd8\xff"
_GIF_MAGICS = (b"GIF87a", b"GIF89a")

KIND_HTML = "html"
KIND_PDF = "pdf"
KIND_IMAGE = "image"
KIND_TEXT = "text"
KIND_EMPTY = "empty"


_BOM_UTF8 = b"\xef\xbb\xbf"
_BOM_UTF16_LE = b"\xff\xfe"
_BOM_UTF16_BE = b"\xfe\xff"


def sniff_kind(payload: bytes) -> str:
    """Classify payload bytes. Pure function; total (never raises)."""
    if not payload:
        return KIND_EMPTY
    if payload.startswith(_PDF_MAGIC):
        return KIND_PDF
    if (
        payload.startswith(_PNG_MAGIC)
        or payload.startswith(_JPEG_MAGIC)
        or payload.startswith(_GIF_MAGICS)
    ):
        return KIND_IMAGE
    head = payload[:128]
    # See through Unicode BOMs so UTF-16/BOM'd HTML routes to the DOM tier.
    # UTF-16: skip whitespace *pairs* in the BOM's byte order, then expect
    # the '<' pair (same pattern as the hex-based Column form below).
    if head.startswith(_BOM_UTF16_LE):
        return _u16_head_is_html(head[2:], le=True)
    if head.startswith(_BOM_UTF16_BE):
        return _u16_head_is_html(head[2:], le=False)
    if head.startswith(_BOM_UTF8):
        head = head[3:]
    if head.lstrip()[:1] == b"<":
        return KIND_HTML
    return KIND_TEXT


_WS_BYTES = frozenset(b" \t\n\r\x0b\x0c")


def _u16_head_is_html(body: bytes, le: bool) -> str:
    i = 0
    while i + 1 < len(body):
        ch, nul = (body[i], body[i + 1]) if le else (body[i + 1], body[i])
        if nul != 0:
            return KIND_TEXT
        if ch in _WS_BYTES:
            i += 2
            continue
        return KIND_HTML if ch == ord("<") else KIND_TEXT
    return KIND_TEXT


def content_kind_col(col):
    """Same classification as a Column expression over a binary column.

    JVM-side (whole-stage codegen) — lets the pipeline partition-prune /
    branch *before* crossing into Python, e.g. route only HTML rows into
    the DOM stage.
    """
    from pyspark.sql import functions as F

    return (
        F.when(F.coalesce(F.octet_length(col), F.lit(0)) == 0, KIND_EMPTY)
        .when(F.substring(col, 1, 5) == F.lit(_PDF_MAGIC), KIND_PDF)
        .when(F.substring(col, 1, 8) == F.lit(_PNG_MAGIC), KIND_IMAGE)
        .when(F.substring(col, 1, 3) == F.lit(_JPEG_MAGIC), KIND_IMAGE)
        .when(F.substring(col, 1, 6) == F.lit(_GIF_MAGICS[0]), KIND_IMAGE)
        .when(F.substring(col, 1, 6) == F.lit(_GIF_MAGICS[1]), KIND_IMAGE)
        .when(_html_head_col(col), KIND_HTML)
        .otherwise(KIND_TEXT)
    )


def _html_head_col(col):
    """Mirror of the pure function's '<'-sniff, built on hex() so it is
    total on arbitrary binary (Spark 4's string `decode` THROWS on
    malformed UTF-8 — MALFORMED_CHARACTER_CODING — so no decode here).
    Pattern: optional BOM, then whitespace bytes in the BOM's encoding,
    then '<'."""
    from pyspark.sql import functions as F

    h = F.hex(F.substring(col, 1, 128))  # uppercase hex pairs
    ws = "(20|09|0A|0D|0B|0C)"
    ws_le = "(2000|0900|0A00|0D00|0B00|0C00)"
    ws_be = "(0020|0009|000A|000D|000B|000C)"
    return (
        h.rlike(f"^(EFBBBF)?{ws}*3C")  # plain / UTF-8(-BOM)
        | h.rlike(f"^FFFE{ws_le}*3C00")  # UTF-16 LE BOM
        | h.rlike(f"^FEFF{ws_be}*003C")  # UTF-16 BE BOM
    )
