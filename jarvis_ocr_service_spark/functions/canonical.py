"""Canonical text forms for robust deduplication, plus Unicode-script
composition stats — two webtext hygiene primitives:

* **Canonical dedup form** (Dolma/RefinedWeb normalize-before-dedup):
  exact dedup on raw bytes misses trivially-reformatted copies
  (case, punctuation, whitespace). The pinned ASCII-canonical chain

      lower -> [^a-z0-9\\s]+ -> ' ' -> \\s+ -> ' ' -> trim

  collapses those variants to one form. ASCII classes ONLY — Unicode
  property classes (\\p{L}) bind to each engine's Unicode table
  version and would break value-exactness; non-ASCII letters are
  treated as separators (documented, not hidden). Pure codegen.

* **Script ratios** (the CCNet/FineWeb script filter's statistic):
  per-document counts of code points in pinned Unicode blocks
  (latin letters, digits, CJK Unified Ideographs, Cyrillic, Arabic,
  Hangul) — filter non-target-script documents, detect mixed-script
  spam. Counting is ``length(regexp_replace(text, '[^block]', ''))``
  with explicit BMP ranges, where Spark (UTF-16 units) and DuckDB
  (code points) agree. Pure codegen, zero shuffles.

Reference parity note: no counterpart in the reference service; part
of the training-data layer (SURVEY §2 "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# pinned BMP blocks: (column name, regex character-class body)
SCRIPT_BLOCKS = (
    ("latin", "a-zA-Z"),
    ("digit", "0-9"),
    ("cjk", "一-鿿"),
    ("cyrillic", "Ѐ-ӿ"),
    ("arabic", "؀-ۿ"),
    ("hangul", "가-힯"),
)


def canonical_text_col(col):
    """The pinned ASCII-canonical form (see module docstring). NULL -> ''."""
    t = F.lower(F.coalesce(col, F.lit("")))
    t = F.regexp_replace(t, r"[^a-z0-9\s]+", " ")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


# Java \s = [ \t\n\x0B\f\r]; RE2 \s EXCLUDES vertical tab — every DuckDB
# mirror must use this explicit class, never RE2 '\s' (the repo's pinned
# _DUCK_WS lesson, __spark_entry__.py)
_JAVA_WS = " \\t\\n\\x0b\\f\\r"


def canonical_text_duck_sql(expr: str) -> str:
    """EXACT DuckDB mirror of :func:`canonical_text_col` (RE2 'g' flag —
    DuckDB replaces only the first match without it; explicit Java-\\s
    whitespace class so \\x0B behaves identically)."""
    return (
        "trim(regexp_replace(regexp_replace("
        f"lower(coalesce({expr}, '')), '[^a-z0-9{_JAVA_WS}]+', ' ', 'g'), "
        f"'[{_JAVA_WS}]+', ' ', 'g'))"
    )


def dedup_canonical(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup on the canonical form: one surviving row per distinct
    canonical text — the smallest key wins (the repo's pinned survivor
    rule). Returns ``(key, canon_len, n_variants)``: the survivor, its
    canonical length, and how many raw documents collapsed into it
    (n_variants > 1 == reformatting-only duplicates caught that raw
    exact dedup misses).

    Scale shape: the canonical projection is codegen; ONE shuffle on a
    16-ish-byte md5 of the canonical form (never the text itself), with
    map-side partial agg — the same unit economics as raw exact dedup."""
    canon = canonical_text_col(F.col(text_col))
    return (
        df.select(
            F.col(key_col).alias("key"),
            F.md5(F.encode(canon, "UTF-8")).alias("_ch"),
            F.length(canon).cast("long").alias("_cl"),
        )
        .groupBy("_ch")
        .agg(
            F.min("key").alias("key"),
            F.min("_cl").cast("long").alias("canon_len"),
            F.count(F.lit(1)).cast("long").alias("n_variants"),
        )
        .select("key", "canon_len", "n_variants")
    )


def script_ratios(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-document script composition: ``(key, n_chars, n_latin,
    n_digit, n_cjk, n_cyrillic, n_arabic, n_hangul)`` — exact integer
    code-point counts in the pinned blocks (n_chars counts non-
    whitespace code points). Callers derive ratios; keeping counts
    integer keeps the report engine-exact. ONE codegen projection."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    cols = [
        F.col(key_col).alias("key"),
        F.length(F.regexp_replace(t, r"\s+", "")).cast("long").alias("n_chars"),
    ]
    for name, block in SCRIPT_BLOCKS:
        cols.append(
            F.length(F.regexp_replace(t, f"[^{block}]+", ""))
            .cast("long")
            .alias(f"n_{name}")
        )
    return df.select(*cols)


def script_ratios_duck_sql(table: str = "documents", key: str = "doc_id") -> str:
    """EXACT DuckDB mirror of :func:`script_ratios`."""
    parts = [
        f"{key} AS key",
        f"CAST(length(regexp_replace(coalesce(text, ''), '[{_JAVA_WS}]+',"
        " '', 'g')) AS BIGINT) AS n_chars",
    ]
    for name, block in SCRIPT_BLOCKS:
        parts.append(
            f"CAST(length(regexp_replace(coalesce(text, ''), '[^{block}]+',"
            f" '', 'g')) AS BIGINT) AS n_{name}"
        )
    return f"SELECT {', '.join(parts)} FROM {table}"
