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
    head = payload[:256].lstrip()
    if head[:1] == b"<":
        return KIND_HTML
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
        .when(
            # decode is lossy on arbitrary binary, but the '<' sniff only
            # needs the ASCII prefix, which UTF-8 decodes stably.
            F.decode(F.substring(col, 1, 256), "UTF-8").rlike(r"^\s*<"),
            KIND_HTML,
        )
        .otherwise(KIND_TEXT)
    )
