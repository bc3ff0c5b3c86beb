"""Randomized Spark-vs-oracle equivalence: 120 seeded-random payloads
(html with random structure, pdf, text, junk) run through the Spark
pipeline in one job and compared byte-for-byte against the shared
pure-Python cascade — the golden test's fixture classes, generalized."""

import random

from jarvis_ocr_service_spark.operators.cascade import extract_document
from jarvis_ocr_service_spark.operators.extract_pdf import build_minimal_pdf
from jarvis_ocr_service_spark.plans.pipeline import run_pipeline

WORDS = "alpha beta gamma delta epsilon words content paragraph real data".split()


def _random_payload(rng: random.Random) -> bytes:
    kind = rng.randrange(5)
    if kind == 0:  # structured html
        parts = ["<html><body>"]
        for _ in range(rng.randrange(1, 6)):
            tag = rng.choice(["p", "div", "li", "h2", "td"])
            words = " ".join(rng.choice(WORDS) for _ in range(rng.randrange(0, 30)))
            parts.append(f"<{tag}>{words}</{tag}>")
        if rng.random() < 0.5:
            parts.append("<nav>" + "".join(f'<a href="/{i}">L{i}</a>' for i in range(rng.randrange(1, 20))) + "</nav>")
        parts.append("</body></html>")
        return "".join(parts).encode()
    if kind == 1:  # malformed html
        return ("<" + "".join(rng.choice("<>/abp \n'\"=") for _ in range(rng.randrange(0, 200)))).encode()
    if kind == 2:  # pdf
        return build_minimal_pdf(
            [" ".join(rng.choice(WORDS) for _ in range(rng.randrange(0, 12)))
             for _ in range(rng.randrange(0, 5))]
        )
    if kind == 3:  # text with noisy whitespace
        return (
            "  " + "\r\n".join(
                " ".join(rng.choice(WORDS) for _ in range(rng.randrange(0, 15)))
                for _ in range(rng.randrange(1, 6))
            ) + "\n\n\n\n"
        ).encode()
    return bytes(rng.randrange(256) for _ in range(rng.randrange(0, 120)))  # junk


def test_spark_equals_oracle_on_random_payloads(spark):
    rng = random.Random(1234)
    rows = [
        (f"https://rnd.example.org/p{i}", _random_payload(rng), "en")
        for i in range(120)
    ]
    pages = spark.createDataFrame(
        [(u, None, bytearray(p), "", l) for (u, p, l) in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    got = {r.url: r for r in run_pipeline(pages).collect()}
    assert len(got) == 120
    for url, payload, lang in rows:
        exp = extract_document(payload, lang)
        g = got[url]
        assert g.text.encode() == exp["text"].encode(), url
        assert (g.tier, g.is_valid, g.truncated, g.error_code) == (
            exp["tier"], exp["is_valid"], exp["truncated"], exp["error_code"]
        ), url
        assert [(s.start, s.end, s.tag) for s in g.spans] == [tuple(t) for t in exp["spans"]], url
