"""PII scrub: pinned rules, Spark/DuckDB parity, codegen-only plan."""

import duckdb

from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.pii import (
    pii_count_duck_sql,
    redact_pii_col,
    redact_pii_duck_sql,
    with_pii_stats,
)

CASES = [
    ("mail me at bob.smith+x@corp.example.co thanks", "mail me at [EMAIL] thanks"),
    ("ssn 123-45-6789 on file", "ssn [SSN] on file"),
    ("call (555) 123-4567 now", "call [PHONE] now"),
    ("call 555.123.4567 now", "call [PHONE] now"),
    ("call 555-123-4567 now", "call [PHONE] now"),
    ("host 192.168.1.10 is up", "host [IP] is up"),
    # order: email absorbs its digits before phone/ip could nibble
    ("a1.2.3.4@x.io and 10.0.0.1", "[EMAIL] and [IP]"),
    # ssn (3-2-4) is disjoint from phone (3-3-4)
    ("123-45-6789 vs 123-456-7890", "[SSN] vs [PHONE]"),
    # no separators -> pinned miss (documented precision trade)
    ("raw 5551234567 digits", "raw 5551234567 digits"),
    ("clean text, no pii at all", "clean text, no pii at all"),
    ("", ""),
]


def test_pinned_redaction(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(CASES)], "i long, text string"
    )
    got = {
        r.i: r.red
        for r in df.select(
            "i", redact_pii_col(F.col("text")).alias("red")
        ).collect()
    }
    for i, (t, want) in enumerate(CASES):
        assert got[i] == want, (t, got[i], want)


def test_counts_and_flag(spark):
    rows = [
        (0, "a@b.co and c@d.io, ssn 111-22-3333, 10.0.0.1 10.0.0.2 10.0.0.3"),
        (1, "nothing here"),
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    got = {r.i: r for r in with_pii_stats(df).collect()}
    assert (got[0].n_email, got[0].n_ssn, got[0].n_phone, got[0].n_ip) == (
        2, 1, 0, 3,
    )
    assert got[0].has_pii and not got[1].has_pii
    assert got[1].text_redacted == "nothing here"


def test_duckdb_mirror_is_identical(spark):
    texts = [t for t, _ in CASES] + [
        f"user{k}@ex{k}.org or 555-000-{1000 + k} at 10.0.{k}.1 ssn 900-1{k % 10}-000{k % 10}"
        for k in range(30)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    counts = pii_count_duck_sql("text")
    sdf = with_pii_stats(df).select(
        "i", "text_redacted", "n_email", "n_ssn", "n_phone", "n_ip"
    )
    got = {r.i: tuple(r)[1:] for r in sdf.collect()}
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT i, {redact_pii_duck_sql('text')} AS red,"
        f" {counts['email']} AS e, {counts['ssn']} AS s,"
        f" {counts['phone']} AS p, {counts['ip']} AS ip FROM "
        f"(SELECT unnest(range({len(texts)})) AS i,"
        f" unnest(?::VARCHAR[]) AS text)",
        [texts],
    ).fetchall()
    for i, *vals in rows:
        assert got[i] == tuple(vals), (texts[i], got[i], vals)


def test_plan_is_codegen_only(spark):
    df = spark.createDataFrame([(1, "a@b.co")], "i long, text string")
    plan = (
        with_pii_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
