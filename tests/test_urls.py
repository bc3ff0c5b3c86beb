"""URL canonicalization: pinned rules, Spark/DuckDB parity, dedup shape."""

import duckdb
import pytest

from pyspark.sql import functions as F

from jarvis_ocr_service_spark.functions.urls import (
    canonical_url_col,
    canonical_url_duck_sql,
    dedup_by_canonical_url,
)

CASES = [
    ("HTTP://Site3.Example.COM:80/Path/To/Doc7", "http://site3.example.com/Path/To/Doc7"),
    ("https://site4.example.com:443/path/doc8/", "https://site4.example.com/path/doc8"),
    ("http://SITE5.example.com/p?utm_source=x&utm_medium=y", "http://site5.example.com/p"),
    ("http://site6.EXAMPLE.com/p?a=1&utm_campaign=z&b=2", "http://site6.example.com/p?a=1&b=2"),
    ("https://Site0.example.com/Doc11#frag-11", "https://site0.example.com/Doc11"),
    ("http://site1.example.com/doc12///", "http://site1.example.com/doc12"),
    ("https://site2.example.com/", "https://site2.example.com/"),  # root slash kept
    ("http://h.com/x?utm_a=1&utm_b=2&utm_c=3&utm_d=4&utm_e=5&keep=1", "http://h.com/x?keep=1"),
    ("  http://h.com/y  ", "http://h.com/y"),
    ("http://h.com:8080/z", "http://h.com:8080/z"),  # non-default port kept
    ("ftp://H.COM:80/z", "ftp://h.com:80/z"),  # :80 only stripped for http
    ("http://h.com/p?utm=notreally", "http://h.com/p?utm=notreally"),  # not utm_
    ("", ""),
    ("not a url", "not a url"),
]


def test_pinned_rules(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string"
    )
    got = {
        r.i: r.c
        for r in df.select("i", canonical_url_col(F.col("url")).alias("c")).collect()
    }
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, (u, got[i], want)


def test_duckdb_mirror_is_identical(spark):
    """The library ships its own DuckDB mirror; the two rule chains must
    produce identical output on every case (plus a generated corpus)."""
    urls = [u for u, _ in CASES] + [
        f"HTTP://Host{k}.COM:80/p{k}?utm_a={k}&utm_b=2&x={k}#f" for k in range(40)
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    got = {
        r.i: r.c
        for r in df.select("i", canonical_url_col(F.col("url")).alias("c")).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT i, {canonical_url_duck_sql('url')} AS c FROM "
        f"(SELECT unnest(range({len(urls)})) AS i, unnest(?::VARCHAR[]) AS url)",
        [urls],
    ).fetchall()
    for i, c in rows:
        assert got[i] == c, (urls[i], got[i], c)


def test_dedup_by_canonical_url(spark):
    rows = [
        (1, "HTTP://A.COM:80/x"),
        (2, "http://a.com/x"),
        (3, "http://a.com/x?utm_source=s"),
        (4, "http://a.com/y"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = dedup_by_canonical_url(df).collect()
    assert len(out) == 2
    winners = {r.id for r in out}
    # min raw URL wins deterministically within each canonical family
    assert 4 in winners and len(winners & {1, 2, 3}) == 1


def test_canonicalize_is_codegen_only(spark):
    """Canonicalization must stay JVM-side: no Python eval node, no
    exchange — it's a project over the scan."""
    df = spark.createDataFrame([(1, "http://a.com/x")], "id long, url string")
    plan = (
        df.select(canonical_url_col(F.col("url")).alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
