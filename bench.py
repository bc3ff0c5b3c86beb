#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric: docs/sec through the fused extraction cascade on a
deterministic synthetic pages table (seed 42, row count scaled by sf).
Pages are materialized to parquet once (cached in /tmp, keyed by size) so
the timed region measures scan -> extract -> sink, not generation.
Sink is the noop format (measures compute, not disk).

Env:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     cores (default 32)
  BENCH_PAGES          override synthetic page count
  BENCH_RUNS           timed runs per query (default 2; min reported —
                       see BENCH/BASELINE.md environment note)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def get_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("jarvis-ocr-service-spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "48g"))
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _control_worker(n_iter: int) -> None:
    import hashlib

    buf = b"x" * (1 << 20)
    for _ in range(n_iter):
        hashlib.md5(buf).digest()


def cpu_control(nprocs: int, iters_per_proc: int = 400) -> float:
    """In-window no-Spark CPU control: md5 over 1 MiB x iters in
    ``nprocs`` parallel processes; returns MiB hashed per second. A
    contaminated BENCH sample is self-labeling (r4 verdict item 6): if
    the 8-proc control is far under ~4x the 2-proc control (or both are
    far below this host's usual ~500 MiB/s/core), the sample ran in bad
    host weather and suite timings should be read against the
    committed-best record, not as a regression."""
    import multiprocessing as mp
    import time as _time

    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(target=_control_worker, args=(iters_per_proc,))
        for _ in range(nprocs)
    ]
    t0 = _time.time()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    dt = _time.time() - t0
    return round(nprocs * iters_per_proc / dt, 1)


def ensure_pages(spark, n_pages: int, parts: int) -> str:
    from jarvis_ocr_service_spark.sources.pages import synthesize_pages

    path = f"/tmp/spark_graft_bench_pages_n{n_pages}"
    marker = f"{path}/_SUCCESS"
    if not os.path.exists(marker):
        synthesize_pages(spark, n_pages, num_partitions=parts).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("BENCH_RUNS", "2"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.1
    n_pages = int(os.environ.get("BENCH_PAGES", max(2000, int(sf * 1_000_000))))

    spark = get_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from jarvis_ocr_service_spark.functions.dedup import (
        dedup_exact,
        minhash_lsh_pairs,
        simhash_near_pairs,
    )
    from jarvis_ocr_service_spark.functions.graph import pagerank_quantized
    from jarvis_ocr_service_spark.functions.lexsearch import (
        bm25_topk_quantized,
        tfidf_topk_quantized,
    )
    from jarvis_ocr_service_spark.functions.urls import outlinks_col
    from jarvis_ocr_service_spark.plans.caching import release_cached
    from jarvis_ocr_service_spark.functions.repetition import with_repetition_stats
    from jarvis_ocr_service_spark.functions.simsearch import cosine_topk
    from jarvis_ocr_service_spark.functions.textstats import text_stats
    from jarvis_ocr_service_spark.functions.urls import canonical_url_col

    def _pagerank_iters():
        # 3 quantized authority rounds over a dense docs-derived edge
        # table (synthetic pages carry only relative links, so the
        # host-level graph is empty there — measured the hard way);
        # collect is nodes-sized, cache released per run
        edges = docs.select(
            (F.col("doc_id") % 1000).alias("src"),
            (F.col("doc_id") % 357).alias("dst"),
        ).filter("src != dst")
        # shuffle_partitions=8: on a ~1k-node graph the default 32 is
        # pure task-scheduling overhead (measured 3.7s -> 1.65s)
        out = pagerank_quantized(edges, iters=3, shuffle_partitions=8)
        out.collect()
        release_cached(out)
    from jarvis_ocr_service_spark.plans.pipeline import run_pipeline, status_by_host
    from jarvis_ocr_service_spark.sources.pages import pages_from_documents

    pages_path = ensure_pages(spark, n_pages, parts=cpus * 2)
    pages = spark.read.parquet(pages_path)
    # the sf documents parquet is a single split -> spread it like a real
    # multi-file table would be
    docs = (
        spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        .repartition(cpus)
        .persist()
    )
    docs.count()
    emb = spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).first().embedding

    # Warm up JVM JIT + all Python workers with a FULL extraction pass
    # (excluded from timings) — a small warm-up leaves the first timed run
    # measuring worker fork + JIT, not the pipeline.
    _noop(run_pipeline(pages))

    # NB: use filters, never .limit(), to subset — limit() funnels the
    # plan through a 1-partition GlobalLimit and serializes the whole
    # downstream computation (measured 65s -> 5s on minhash_lsh).
    docs_2k = docs.filter(F.col("doc_id") < 2000)

    # Small queries first: the 100k-page extraction passes bloat the JVM
    # heap with transient 50KB strings; running the light queries before
    # them keeps their timings clean of that GC shadow.
    queries = {
        "dedup_exact": lambda: _noop(dedup_exact(docs)),
        "minhash_lsh": lambda: _noop(
            minhash_lsh_pairs(docs_2k, verify_threshold=0.8)
        ),
        "simhash_pairs": lambda: _noop(
            simhash_near_pairs(docs_2k, max_hamming=3)
        ),
        "text_stats": lambda: _noop(text_stats(docs)),
        "repetition_stats": lambda: _noop(
            with_repetition_stats(docs, top_grams=(2,), dup_grams=(5,))
        ),
        "url_canonical": lambda: _noop(
            pages.select(canonical_url_col(F.col("url")).alias("curl"))
        ),
        "tfidf_topk": lambda: tfidf_topk_quantized(
            docs, "scan window merge dup", k=10
        ).collect(),
        "bm25_topk": lambda: bm25_topk_quantized(
            docs, "scan window merge dup", k=10
        ).collect(),
        "page_outlinks": lambda: _noop(
            pages.select(
                F.explode(outlinks_col(F.col("html"))).alias("link")
            )
        ),
        "pagerank_iters": _pagerank_iters,
        "cosine_topk": lambda: cosine_topk(emb, qvec, k=10).collect(),
        "extract_docs_table": lambda: _noop(run_pipeline(pages_from_documents(spark, sf_dir))),
        "extract_status_agg": lambda: _noop(status_by_host(run_pipeline(pages))),
        "extract_fused": lambda: _noop(run_pipeline(pages)),
    }

    # weather control BEFORE the timed window (and again after): a
    # no-Spark CPU baseline at 2 and 8 procs whose absolute level and
    # 2->8 ratio label host contention for this exact sample
    control_pre = {"2proc": cpu_control(2), "8proc": cpu_control(8)}

    timings = {}
    for name, fn in queries.items():
        samples = []
        for _ in range(runs):
            t0 = time.time()
            fn()
            samples.append(time.time() - t0)
        # min = capability: this sandbox's VM throughput ramps over the
        # first passes (see BENCH/BASELINE.md), and noise only adds time.
        timings[name] = round(min(samples), 3)

    control_post = {"2proc": cpu_control(2), "8proc": cpu_control(8)}

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(n_pages / timings["extract_fused"], 1)
    print(
        json.dumps(
            {
                "metric": "bench_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "n_pages": n_pages,
                "extract_docs_per_sec": docs_per_sec,
                # MiB md5-hashed/s by a plain-Python control in-window;
                # quiet host ~1000 (2 proc) / ~4000 (8 proc, ratio ~3.9)
                # — see cpu_control docstring for reading a bad sample
                "control_mibps": {"pre": control_pre, "post": control_post},
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
