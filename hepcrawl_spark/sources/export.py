"""JSONL shard export: deliver a corpus as size-bounded .jsonl shard
files plus a manifest — the interchange format LLM training stacks
consume (one JSON object per line, shards a few hundred MB each, a
manifest for the loader).

Spark-first shape:

- The JSON payload is built JVM-side (``to_json(struct(...))``) so byte
  sizes are exact and no Python touches the rows.
- Shard assignment IS `scrub.pack_chunks` on BYTES (the planner calls
  it): docs lay head-to-tail per bucket in deterministic (id, payload)
  order, the running byte sum cuts at ``max_bytes`` boundaries
  (``shard = bytes_before DIV max_bytes`` — exact integer division).
  Buckets (hash of the id, or an explicit column) keep the window
  per-bucket — embarrassingly parallel, one shuffle, never a
  single-task global sort. A shard can overrun its boundary by at most
  one document.
- The write is ``partitionBy(bucket, shard)`` text output straight off
  the window's partitions (already clustered by bucket and sorted, so
  file contents — including LINE ORDER — are deterministic); the
  manifest (bucket, shard, n_docs, n_bytes) is one small groupBy on the
  persisted plan, so data and manifest come from the same evaluation.

Determinism: (id -> bucket, in-bucket order, byte cut points, line
order) are pure functions of the rows, so re-running the export
reproduces the same shard layout byte-for-byte — a loader can resume
mid-corpus by (bucket, shard) or even by line offset.

Reference context: hepcrawl ships crawl results as per-record JSON lines
pushed one at a time (``hepcrawl/pipelines.py``); this is that sink
rebuilt as a bulk, size-planned, manifest-tracked export.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.scrub import pack_chunks

_RESERVED = {"__json", "bucket", "n_bytes", "shard", "start_offset", "bin"}


def plan_jsonl_shards(
    docs: DataFrame,
    max_bytes: int = 256 * 1024 * 1024,
    id_col: str = "doc_id",
    bucket_col: str | None = None,
    n_buckets: int = 16,
) -> DataFrame:
    """Append ``__json`` (the serialized line), ``bucket``, ``n_bytes``,
    and ``shard`` (0-based within the bucket). Payload = every input
    column, serialized once so planning and writing agree byte-for-byte
    (+1 per line for the trailing newline the writer emits)."""
    if max_bytes <= 0:
        raise ValueError("max_bytes must be positive")
    clash = (set(docs.columns) - {bucket_col}) & _RESERVED
    if clash:
        raise ValueError(
            f"input columns collide with planner outputs: {sorted(clash)}"
        )
    payload = F.to_json(F.struct(*[F.col(c) for c in docs.columns]))
    df = docs.withColumn("__json", payload).withColumn(
        "n_bytes", (F.octet_length("__json") + F.lit(1)).cast("long")
    )
    # pack_chunks does the pack-and-cut: per-bucket running sum over the
    # (id, __json) total order — __json as the tiebreaker keeps repeated
    # ids (chunk rows) deterministic — and bin = start_offset DIV capacity
    planned = pack_chunks(
        df,
        capacity=max_bytes,
        bucket_col=bucket_col,
        n_buckets=n_buckets,
        id_col=id_col,
        chunk_col="__json",
        tokens_col="n_bytes",
    )
    return planned.withColumnRenamed("bin", "shard").drop("start_offset")


def write_jsonl_shards(
    docs: DataFrame,
    out_dir: str,
    max_bytes: int = 256 * 1024 * 1024,
    id_col: str = "doc_id",
    bucket_col: str | None = None,
    n_buckets: int = 16,
) -> DataFrame:
    """Write ``out_dir/data/bucket=B/shard=S/*.txt`` JSONL shards and
    ``out_dir/manifest`` (bucket, shard, n_docs, n_bytes). Returns the
    manifest DataFrame (read back from disk, so callers see exactly what
    landed)."""
    planned = plan_jsonl_shards(
        docs, max_bytes, id_col, bucket_col, n_buckets
    ).persist()  # the text write and the manifest agg share one evaluation
    try:
        # no repartition: the plan's window already clustered each bucket
        # into one sorted partition, so every (bucket, shard) directory
        # receives its lines from one task in deterministic order
        planned.select(F.col("__json").alias("value"), "bucket", "shard").write.mode(
            "overwrite"
        ).partitionBy("bucket", "shard").text(f"{out_dir}/data")
        manifest = planned.groupBy("bucket", "shard").agg(
            F.count("*").alias("n_docs"), F.sum("n_bytes").alias("n_bytes")
        )
        manifest.write.mode("overwrite").parquet(f"{out_dir}/manifest")
    finally:
        planned.unpersist()
    spark = docs.sparkSession
    return spark.read.parquet(f"{out_dir}/manifest")
