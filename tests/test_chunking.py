"""Sliding-window chunking (functions/chunking.py): brute-force parity,
coverage/overlap invariants, empty-doc reporting, plan shape."""

import pytest

from jarvis_ocr_service_spark.functions.chunking import chunk_sliding


def _brute_chunks(docs, size, stride):
    out = {}
    for k, t in docs:
        toks = (t or "").lower().split()
        n = len(toks)
        kmax = 0 if n <= size else -(-(n - size) // stride)
        rows = []
        for i in range(kmax + 1):
            s = i * stride
            m = min(size, n - s)
            rows.append((i, s, m, " ".join(toks[s : s + m])))
        out[k] = rows
    return out


@pytest.mark.parametrize("size,stride", [(8, 4), (8, 8), (5, 2), (1, 1)])
def test_chunk_brute_parity(spark, size, stride):
    docs = [
        (i, " ".join(f"t{j}" for j in range(i))) for i in range(0, 30, 3)
    ] + [(100, None), (101, "  "), (102, "one")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in chunk_sliding(df, size, stride).collect():
        got.setdefault(r.key, []).append(
            (r.chunk_idx, r.start_tok, r.n_toks, r.chunk_text)
        )
    for k in got:
        got[k].sort()
    assert got == _brute_chunks(docs, size, stride)


def test_chunk_coverage_and_overlap(spark):
    toks = [f"w{j}" for j in range(23)]
    df = spark.createDataFrame([(0, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        chunk_sliding(df, 8, 4).collect(), key=lambda r: r.chunk_idx
    )
    # full coverage: union of [start, start+n) is 0..23
    covered = set()
    for r in rows:
        covered |= set(range(r.start_tok, r.start_tok + r.n_toks))
    assert covered == set(range(23))
    # last chunk ends exactly at the last token; length in (size-stride, size]
    last = rows[-1]
    assert last.start_tok + last.n_toks == 23 and 4 < last.n_toks <= 8
    # every chunk's text round-trips through the tokenizer
    for r in rows:
        assert r.chunk_text == " ".join(toks[r.start_tok : r.start_tok + r.n_toks])


def test_chunk_empty_doc_reported(spark):
    df = spark.createDataFrame([(7, "")], "doc_id long, text string")
    rows = chunk_sliding(df, 8, 4).collect()
    assert [(r.key, r.chunk_idx, r.start_tok, r.n_toks, r.chunk_text) for r in rows] == [
        (7, 0, 0, 0, "")
    ]


def test_chunk_validation(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_sliding(df, 0, 1)
    with pytest.raises(ValueError):
        chunk_sliding(df, 4, 0)
    with pytest.raises(ValueError):
        chunk_sliding(df, 4, 5)


def test_chunk_plan_map_only(spark):
    df = spark.createDataFrame([(0, "a b c d e f")], "doc_id long, text string")
    plan = chunk_sliding(df, 4, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
