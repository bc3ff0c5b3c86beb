"""PII detection + redaction for training-data pipelines — the scrub
pass a web corpus needs before text ships into a training set.

The rule set is PINNED (deterministic, deliberately regex-only and
RE2-safe — no lookaround, no backrefs — so the DuckDB oracle mirrors it
exactly; the module ships its own mirror, urls.py-style, so the two
rule chains cannot drift):

    email : [A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}   -> [EMAIL]
    ssn   : \\b\\d{3}-\\d{2}-\\d{4}\\b                         -> [SSN]
    phone : \\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}\\b            -> [PHONE]
    ipv4  : \\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b    -> [IP]

Applied IN THIS ORDER (pinned): emails first (they contain digit runs a
later rule could nibble), then SSN (3-2-4 — disjoint from phone's
3-3-4), then phone, then IP. Counts are measured per rule on the
ORIGINAL text, independently — a deliberate, documented choice (counts
answer "what does this doc contain", redaction answers "what ships").

This is a practical scrubber, not a PII oracle: precision/recall trades
(e.g. dotted phone numbers that look like version strings) are accepted
and pinned rather than heuristically patched.

Everything is pure Column regexp (whole-stage codegen, zero Python).

Reference parity note: the reference service has no corpus hygiene;
this is part of the training-data layer (SURVEY §2 "beyond the
reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — order is part of the pinned semantics.
PII_RULES = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def redact_pii_col(col):
    """Redacted form of a text column (rules above, in order)."""
    u = F.coalesce(col, F.lit(""))
    for _, pat, repl in PII_RULES:
        u = F.regexp_replace(u, pat, repl.replace("$", r"\$"))
    return u


def pii_count_cols(col):
    """dict name -> count Column, each measured on the ORIGINAL text."""
    u = F.coalesce(col, F.lit(""))
    return {
        name: F.regexp_count(u, F.lit(pat)).cast("long")
        for name, pat, _ in PII_RULES
    }


def with_pii_stats(
    df: DataFrame, text_col: str = "text", redact: bool = True
) -> DataFrame:
    """df + n_<rule> counts + has_pii (+ redacted text when ``redact``).

    Scale shape: a pure projection — no shuffle, no Python; Catalyst
    fuses the whole rule chain into one codegen stage."""
    counts = pii_count_cols(F.col(text_col))
    out = df
    for name, c in counts.items():
        out = out.withColumn(f"n_{name}", c)
    out = out.withColumn(
        "has_pii",
        sum(F.col(f"n_{n}") for n, _, _ in PII_RULES) > 0,
    )
    if redact:
        out = out.withColumn(
            "text_redacted", redact_pii_col(F.col(text_col))
        )
    return out


def redact_pii_duck_sql(expr: str) -> str:
    """The EXACT DuckDB mirror of :func:`redact_pii_col`."""
    u = f"coalesce({expr}, '')"
    for _, pat, repl in PII_RULES:
        p = pat.replace("'", "''")
        u = f"regexp_replace({u}, '{p}', '{repl}', 'g')"
    return u


def pii_count_duck_sql(expr: str) -> dict:
    """name -> DuckDB count expression mirroring :func:`pii_count_cols`."""
    u = f"coalesce({expr}, '')"
    return {
        name: f"CAST(len(regexp_extract_all({u}, '{pat}')) AS BIGINT)"
        for name, pat, _ in PII_RULES
    }
