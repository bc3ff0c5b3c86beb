"""Deterministic synthetic Common-Crawl-style pages source.

Input-table shape is exactly BASELINE.json's input_hint:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
Content is a pure function of ``(i, seed)`` — no RNG state, no wall clock —
so goldens are byte-reproducible anywhere (FIXTURES.md requirement), and
generation distributes as ``spark.range(n) -> mapInPandas`` with no driver
loop and no shuffle.

The ten content classes of FIXTURES.md §1 are assigned by ``i % 10``:
 0 clean HTML           5 too-short text
 1 boilerplate HTML     6 oversize text (> MAX_TEXT_BYTES -> truncated)
 2 PDF payload          7 multibyte-boundary text
 3 PNG payload          8 whitespace/CRLF-noisy text
 4 garbled text         9 empty payload

Hosts come from a 50-host pool where host[0] is "hot" (~20% of rows) —
the documented skew fixture for salted-bucketing evidence.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import struct
import zlib
from typing import Dict, Iterator, List, Tuple

import pandas as pd

from jarvis_ocr_service_spark.config import MAX_TEXT_BYTES

N_CLASSES = 10
_EPOCH = dt.datetime(2024, 1, 1, 0, 0, 0)
_LANGS = ["en", "fr", "de", "es", "it"]

_WORDS = (
    "stream table query filter window batch merge join order scan part "
    "vector column value group data spark engine page text block score "
    "parse host shard byte token index cache plan stage task core"
).split()

_HOSTS = ["hot.example.com"] + [f"site{k:02d}.example.org" for k in range(1, 50)]


def _h(i: int, seed: int, tag: str) -> int:
    """Deterministic 64-bit stream per (row, seed, purpose)."""
    d = hashlib.sha256(f"{seed}:{i}:{tag}".encode()).digest()
    return int.from_bytes(d[:8], "big")


def host_for(i: int, seed: int) -> str:
    """Zipf-ish host pool: host[0] owns ~20% of rows."""
    r = _h(i, seed, "host") % 100
    if r < 20:
        return _HOSTS[0]
    return _HOSTS[1 + (_h(i, seed, "host2") % (len(_HOSTS) - 1))]


def _sentence(i: int, seed: int, j: int, n_words: int) -> str:
    base = _h(i, seed, f"s{j}")
    words = [_WORDS[(base + 7 * k) % len(_WORDS)] for k in range(n_words)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _paragraphs(i: int, seed: int, n_paras: int, words_per: int = 24) -> List[str]:
    return [
        " ".join(_sentence(i, seed, j * 10 + s, words_per // 3) for s in range(3))
        for j in range(n_paras)
    ]


def _minimal_png() -> bytes:
    """Hand-built 1x1 white PNG — same construction as the reference's
    fixture (tests/conftest.py:35-58)."""
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype: bytes, data: bytes) -> bytes:
        cd = ctype + data
        return struct.pack(">I", len(data)) + cd + struct.pack(
            ">I", zlib.crc32(cd) & 0xFFFFFFFF
        )

    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
    idat = chunk(b"IDAT", zlib.compress(b"\x00\xff\xff\xff"))
    return sig + ihdr + idat + chunk(b"IEND", b"")


_PNG_BYTES = _minimal_png()

_GARBLED_CONSONANTS = "bcdfghjklmnpqrstvwxz"


def _garbled(i: int, seed: int, n_words: int = 40) -> str:
    words = []
    for k in range(n_words):
        base = _h(i, seed, f"g{k}")
        n = 4 + base % 5
        words.append(
            "".join(
                _GARBLED_CONSONANTS[(base >> (4 * j)) % len(_GARBLED_CONSONANTS)]
                for j in range(n)
            )
        )
    return " ".join(words)


def _html_page(title: str, paras: List[str], nav_links: int = 0) -> bytes:
    parts = [
        "<!DOCTYPE html><html><head><title>",
        title,
        "</title><style>body{margin:0}</style>",
        "<script>var x=1;</script></head><body>",
    ]
    if nav_links:
        parts.append("<nav><ul>")
        for k in range(nav_links):
            parts.append(f'<li><a href="/cat{k}">Category {k}</a></li>')
        parts.append("</ul></nav>")
        parts.append('<div><a href="/promo">Promo link</a> <a href="/deal">Deal</a></div>')
    parts.append("<article>")
    for p in paras:
        parts.append(f"<p>{p}</p>")
    parts.append("</article>")
    if nav_links:
        parts.append("<footer><a href='/about'>About</a> <a href='/tos'>Terms</a></footer>")
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def make_page(i: int, seed: int = 42) -> Dict:
    """Pure function (i, seed) -> pages row dict."""
    cls = i % N_CLASSES
    lang = _LANGS[i % len(_LANGS)]
    host = host_for(i, seed)
    url = f"https://{host}/doc/{cls}/page-{i}"
    warc_ts = _EPOCH + dt.timedelta(minutes=i)

    if cls == 0:  # clean HTML
        paras = _paragraphs(i, seed, 3 + _h(i, seed, "np") % 4)
        payload = _html_page(f"Doc {i}", paras)
        raw_text = " ".join(paras)
    elif cls == 1:  # boilerplate-heavy HTML
        paras = _paragraphs(i, seed, 3 + _h(i, seed, "np") % 4)
        payload = _html_page(f"Doc {i}", paras, nav_links=24)
        raw_text = " ".join(paras)
    elif cls == 2:  # PDF payload
        from jarvis_ocr_service_spark.operators.extract_pdf import build_minimal_pdf

        lines = [_sentence(i, seed, j, 8) for j in range(6)]
        payload = build_minimal_pdf(lines)
        raw_text = " ".join(lines)
    elif cls == 3:  # PNG payload
        payload = _PNG_BYTES
        raw_text = ""
    elif cls == 4:  # garbled consonant soup
        raw_text = _garbled(i, seed)
        payload = raw_text.encode("utf-8")
    elif cls == 5:  # too-short
        raw_text = "ok"[: 1 + i % 2]
        payload = raw_text.encode("utf-8")
    elif cls == 6:  # oversize -> truncated
        paras = _paragraphs(i, seed, 80, words_per=90)
        raw_text = "\n".join(paras)
        if len(raw_text.encode("utf-8")) <= MAX_TEXT_BYTES:
            raw_text = raw_text + "\n" + raw_text
        payload = raw_text.encode("utf-8")
    elif cls == 7:  # multibyte straddling the truncate boundary
        # leading 'A' (1 byte) misaligns the 2-byte 'é' run so the cut at
        # MAX_TEXT_BYTES lands mid-sequence -> exercises decode backoff
        raw_text = "A" + "é" * (MAX_TEXT_BYTES // 2 + 50) + " café emoji 😀 fin"
        payload = raw_text.encode("utf-8")
    elif cls == 8:  # whitespace/CRLF noise — exercises every normalize rule
        paras = _paragraphs(i, seed, 4)
        raw_text = (
            "\x00  " + paras[0] + "  \r\n\r\n\r\n\r" + paras[1]
            + "\n\n\n\n" + "   " + paras[2] + "   \r\n" + paras[3] + "  "
        )
        payload = raw_text.encode("utf-8")
    else:  # cls == 9: empty payload
        raw_text = ""
        payload = b""

    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": payload,
        "text": raw_text,
        "lang": lang,
    }


def make_pages_pdf(indices, seed: int = 42) -> pd.DataFrame:
    rows = [make_page(int(i), seed) for i in indices]
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def synthesize_pages(spark, n_rows: int, seed: int = 42, num_partitions: int = None):
    """Distributed deterministic pages DataFrame (no driver-side loop)."""
    from jarvis_ocr_service_spark.schema import PAGES_SCHEMA

    num_partitions = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b):
                yield make_pages_pdf(b["id"].tolist(), seed)

    return (
        spark.range(0, n_rows, numPartitions=num_partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def pages_from_documents(spark, sf_dir: str):
    """Build a deterministic pages table from the driver's ``documents``
    parquet (doc_id, text, lang, source, n_chars) — entirely JVM-side
    (format_string/encode, no Python): every third doc is wrapped in a
    boilerplate-heavy page (24-link nav + footer) so the tier cascade's
    escalation path runs; the rest are clean pages accepted at tier-1.

    Because ``documents.text`` is plain single-spaced words (no markup
    chars), extraction round-trips to ``normalize_text(text)`` exactly —
    which makes the *whole* Spark UDF chain oracle-checkable against pure
    SQL on the original table (__spark_entry__.queries: extract_clean_html
    / extract_boilerplate_strip).
    """
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    nav = "".join(
        f'<li><a href="/cat{k}">Category {k}</a></li>' for k in range(24)
    )
    boiler_head = f"<nav><ul>{nav}</ul></nav>"
    boiler_foot = "<footer><a href='/about'>About</a> <a href='/tos'>Terms</a></footer>"
    page = F.when(
        F.col("doc_id") % 3 == 0,
        F.format_string(
            "<!DOCTYPE html><html><head><title>doc %s</title></head><body>"
            + boiler_head
            + "<article><p>%s</p></article>"
            + boiler_foot
            + "</body></html>",
            F.col("doc_id"),
            F.col("text"),
        ),
    ).otherwise(
        F.format_string(
            "<!DOCTYPE html><html><head><title>doc %s</title></head><body>"
            "<article><p>%s</p></article></body></html>",
            F.col("doc_id"),
            F.col("text"),
        )
    )
    return docs.select(
        F.format_string(
            "https://site%s.example.org/docs/%s", F.col("doc_id") % 50, F.col("doc_id")
        ).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(mins=F.col("doc_id").cast("int"))
        ).alias("warc_ts"),
        F.encode(page, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def expected_result(i: int, seed: int = 42, pdf_mode: str = "parse") -> Dict:
    """Golden oracle for row i: run the shared pure-Python cascade on the
    generated payload (single shared implementation => byte-identical)."""
    from jarvis_ocr_service_spark.operators.cascade import extract_document

    page = make_page(i, seed)
    res = extract_document(page["html"], page["lang"], pdf_mode=pdf_mode)
    res["url"] = page["url"]
    return res
