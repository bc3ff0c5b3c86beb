"""Charset detection for web payloads — deterministic, stdlib-only.

Real Common-Crawl HTML is not reliably UTF-8. Decode order:

  1. Unicode BOM (UTF-8 / UTF-16 LE / UTF-16 BE) — authoritative.
  2. Strict UTF-8 — the common case; succeeding strictly means either
     true UTF-8 or pure ASCII, both safe.
  3. Declared charset: ``<meta charset=...>`` or
     ``<meta http-equiv="Content-Type" content="...charset=...">`` in the
     first 2048 bytes (scanned on a latin-1 view, which can't fail).
  4. latin-1 fallback — total (every byte sequence decodes), matching the
     reference's never-crash-per-row stance (P8).

Pure function of the bytes — shared by oracle and UDF, so a charset
decision is part of the golden semantics, not an environment accident.
"""

from __future__ import annotations

import codecs
import re

_META_CHARSET = re.compile(
    r"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)

# Common web aliases that stdlib codecs may not map as-is.
_ALIASES = {
    "unicode": "utf-8",
    "utf8": "utf-8",
    "iso-8859-1": "latin-1",
    "windows-1252": "cp1252",
    "win-1252": "cp1252",
    "gb2312": "gb18030",  # superset; the standard web practice
    "gbk": "gb18030",
    "shift-jis": "shift_jis",
}


def sniff_charset(payload: bytes) -> str:
    """Best-effort charset name for an HTML/text payload."""
    if payload.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    if payload.startswith(codecs.BOM_UTF16_LE):
        return "utf-16-le"
    if payload.startswith(codecs.BOM_UTF16_BE):
        return "utf-16-be"
    try:
        payload.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        pass
    head = payload[:2048].decode("latin-1")
    m = _META_CHARSET.search(head)
    if m:
        name = _ALIASES.get(m.group(1).lower(), m.group(1).lower())
        try:
            codecs.lookup(name)
            return name
        except LookupError:
            pass
    return "latin-1"


def decode_payload(payload: bytes) -> str:
    """Decode with the sniffed charset; total (falls back to latin-1 and,
    as a last resort, utf-8/replace — never raises)."""
    cs = sniff_charset(payload)
    if cs in ("utf-16-le", "utf-16-be"):
        payload = payload[2:]  # strip BOM
    try:
        return payload.decode(cs)
    except (UnicodeDecodeError, LookupError):
        try:
            return payload.decode("latin-1")
        except Exception:  # pragma: no cover — latin-1 is total
            return payload.decode("utf-8", errors="replace")
