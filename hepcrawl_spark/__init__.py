"""hepcrawl_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch rebuild of the query/data-processing capabilities of
inspirehep/hepcrawl (reference at /root/reference, read-only), re-expressed
Spark-first: DataFrame/Catalyst plans, broadcast Bloom (+ cuckoo) URL-seen
dedup, per-host politeness windows with salting, robots gating, vectorized
pandas/Arrow parse UDFs, and an iterative DataFrame fixpoint crawl loop over
parquet-backed (Iceberg-style snapshotted) tables of Common-Crawl-style pages.

Layout:
  session     SparkSession factory with scale-tuned configs
  schemas     canonical StructTypes (pages, frontier, url_seen, records, ...)
  functions/  scalar column functions (urls, text, hashing, latex)
  operators/  dedup (exact/bloom/cuckoo/minhash/simhash), politeness,
              similarity search, text analysis
  sources/    page-corpus synthesis + snapshotted parquet table store
  parsers/    per-format vectorized parse UDFs (arxiv OAI, JATS, Desy JSONL)
  crawl/      the frontier fixpoint driver loop (checkpoint/resume, metrics)
  streaming/  Structured Streaming ingest of the events stream
"""

__version__ = "0.1.0"
