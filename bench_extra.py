#!/usr/bin/env python
"""Noop-sink isolation bench (guide §1.4/§1.5) — NOT the driver metric.

Times each headline query separately with jobs labelled via
``setJobDescription`` so the timing can be attributed, using the same
session config as bench.py. Use for optimization attribution only;
``bench.py`` (frozen) remains the measured contract.

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_RUNS (default 3).
Prints one JSON line: {"queries": {name: min_sec}, "runs": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None

    import bench

    spark = bench.get_spark(cpus)
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
    from jarvis_ocr_service_spark.functions.repetition import with_repetition_stats
    from jarvis_ocr_service_spark.functions.simsearch import cosine_topk
    from jarvis_ocr_service_spark.functions.textstats import text_stats
    from jarvis_ocr_service_spark.functions.urls import (
        canonical_url_col,
        outlinks_col,
    )
    from jarvis_ocr_service_spark.plans.caching import release_cached
    from jarvis_ocr_service_spark.plans.pipeline import run_pipeline, status_by_host
    from jarvis_ocr_service_spark.sources.pages import pages_from_documents

    sf = 0.1
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        pass
    n_pages = int(os.environ.get("BENCH_PAGES", max(2000, int(sf * 1_000_000))))
    pages_path = bench.ensure_pages(spark, n_pages, parts=cpus * 2)
    pages = spark.read.parquet(pages_path)
    docs = (
        spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        .repartition(cpus)
        .persist()
    )
    docs.count()
    emb = spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).first().embedding
    docs_2k = docs.filter(F.col("doc_id") < 2000)

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    def _pagerank_iters():
        edges = docs.select(
            (F.col("doc_id") % 1000).alias("src"),
            (F.col("doc_id") % 357).alias("dst"),
        ).filter("src != dst")
        out = pagerank_quantized(edges, iters=3, shuffle_partitions=8)
        out.collect()
        release_cached(out)

    # extraction-only vs +agg split: pages_scan isolates the parquet read
    queries = {
        "pages_scan": lambda: _noop(pages.select("html")),
        "dedup_exact": lambda: _noop(dedup_exact(docs)),
        "minhash_lsh": lambda: _noop(
            minhash_lsh_pairs(docs_2k, verify_threshold=0.8)
        ),
        "simhash_pairs": lambda: _noop(simhash_near_pairs(docs_2k, max_hamming=3)),
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
            pages.select(F.explode(outlinks_col(F.col("html"))).alias("link"))
        ),
        "pagerank_iters": _pagerank_iters,
        "cosine_topk": lambda: cosine_topk(emb, qvec, k=10).collect(),
        "extract_docs_table": lambda: _noop(
            run_pipeline(pages_from_documents(spark, sf_dir))
        ),
        "extract_fused": lambda: _noop(run_pipeline(pages)),
        "extract_status_agg": lambda: _noop(status_by_host(run_pipeline(pages))),
    }
    if only:
        queries = {k: v for k, v in queries.items() if k in only}

    # full-extraction warmup (JIT + Python worker fork), as bench.py does
    spark.sparkContext.setJobDescription("warmup: full extraction")
    _noop(run_pipeline(pages))

    out = {}
    for name, fn in queries.items():
        samples = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            fn()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
    print(json.dumps({"queries": out, "runs": runs, "cpus": cpus, "sf": sf}))


if __name__ == "__main__":
    sys.exit(main())
