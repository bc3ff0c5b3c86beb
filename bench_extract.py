#!/usr/bin/env python
"""Scaling-evidence job: run the fused extraction pipeline over a
pre-materialized pages parquet and print docs/sec.

Usage (the BASELINE.md measurement plan):
    spark-submit --master local[8]  --py-files engine.zip bench_extract.py <pages_dir> [runs]
    spark-submit --master local[32] --py-files engine.zip bench_extract.py <pages_dir> [runs]

Same input bytes for both runs; first (warm-up) run discarded; median of
the remaining timed runs printed as JSON.
"""

import json
import statistics
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    pages_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from jarvis_ocr_service_spark.plans.pipeline import run_pipeline

    pages = spark.read.parquet(pages_dir)
    n = pages.count()

    def one_run() -> float:
        t0 = time.time()
        run_pipeline(pages).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    one_run()  # warm-up (python worker fork + JIT), discarded
    samples = [one_run() for _ in range(runs)]
    med = statistics.median(samples)
    print(
        json.dumps(
            {
                "cores": cores,
                "n_docs": n,
                "runs_sec": [round(s, 2) for s in samples],
                "median_sec": round(med, 2),
                "docs_per_sec": round(n / med, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
