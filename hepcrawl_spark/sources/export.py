"""JSONL shard export: deliver a corpus as size-bounded .jsonl shard
files plus a manifest — the interchange format LLM training stacks
consume (one JSON object per line, shards a few hundred MB each, a
manifest for the loader).

Spark-first shape:

- The JSON payload is built JVM-side (``to_json(struct(...))``) so byte
  sizes are exact and no Python touches the rows.
- Shard assignment is the `scrub.pack_chunks` pattern on BYTES: docs lay
  head-to-tail per bucket in deterministic (id) order, a running
  ``sum(octet_length) OVER`` window cuts at ``max_bytes`` boundaries
  (``shard = bytes_before DIV max_bytes``). Buckets (hash of the id, or
  an explicit column) keep the window per-bucket — embarrassingly
  parallel, one shuffle, never a single-task global sort. A shard can
  overrun its boundary by at most one document.
- The write itself is ``partitionBy(bucket, shard)`` text output — each
  (bucket, shard) directory holds exactly the lines of that shard — and
  the manifest (bucket, shard, n_docs, n_bytes) is one small groupBy on
  the already-computed columns.

Determinism: (id -> bucket, in-bucket order, byte cut points) are pure
functions of the rows, so re-running the export reproduces the same
shard layout — a loader can resume mid-corpus by (bucket, shard).

Reference context: hepcrawl ships crawl results as per-record JSON lines
pushed one at a time (``hepcrawl/pipelines.py``); this is that sink
rebuilt as a bulk, size-planned, manifest-tracked export.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
    payload = F.to_json(F.struct(*[F.col(c) for c in docs.columns]))
    b = (
        F.col(bucket_col)
        if bucket_col is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    )
    df = docs.withColumn("__json", payload).withColumn("bucket", b).withColumn(
        "n_bytes", (F.octet_length("__json") + F.lit(1)).cast("long")
    )
    # (id, payload) is a total order even when ids repeat (e.g. chunk rows
    # sharing a doc_id) — a bare id sort would leave the byte cut points
    # nondeterministic across runs
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col).asc(), F.col("__json").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bytes_before = F.sum("n_bytes").over(w) - F.col("n_bytes")
    return df.withColumn(
        "shard", F.floor(bytes_before / F.lit(int(max_bytes))).cast("long")
    )


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
    planned = plan_jsonl_shards(docs, max_bytes, id_col, bucket_col, n_buckets)
    planned.select("__json", "bucket", "shard").withColumnRenamed(
        "__json", "value"
    ).repartition("bucket", "shard").write.mode("overwrite").partitionBy(
        "bucket", "shard"
    ).text(f"{out_dir}/data")
    manifest = planned.groupBy("bucket", "shard").agg(
        F.count("*").alias("n_docs"), F.sum("n_bytes").alias("n_bytes")
    )
    manifest.write.mode("overwrite").parquet(f"{out_dir}/manifest")
    spark = docs.sparkSession
    return spark.read.parquet(f"{out_dir}/manifest")
