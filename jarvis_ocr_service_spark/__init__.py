"""jarvis_ocr_service_spark — a PySpark-native extraction engine.

A brand-new, Spark-first reimplementation of the *computational semantics*
of ``alexberardi/jarvis-ocr-service`` (reference at /root/reference, studied
behaviourally only): tiered-fallback document extraction, text
normalization / UTF-8-safe truncation, deterministic validity scoring, and
job-completion aggregation — re-expressed as DataFrame operators and
vectorized pandas/Arrow UDFs over a Common-Crawl-style pages table
``(url, warc_ts, html, text, lang)``.

Design rules (enforced throughout):
  * DataFrame/SQL first; Catalyst plans everything relational.
  * Python only inside Arrow-batched UDFs (``mapInPandas``); never per-row
    driver loops, never ``collect()`` in the hot path.
  * One Python<->JVM crossing for the whole extract->normalize->validate->
    truncate cascade (fused operator), because every tier here is a local
    pure function (unlike the reference, where each tier was a separate
    process/service hop).
  * All text semantics are a single shared pure-Python implementation used
    by both the DuckDB/pytest oracle and the Spark UDFs => byte-identical
    output per url by construction, then re-proven by tests.
"""

__version__ = "0.1.0"
