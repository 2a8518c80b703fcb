"""Streaming harvest ingest: pages feed -> dedup -> features -> sink.

The batch fixpoint pulls pages from a static table; when captures arrive
continuously (a WARC drop folder, a Kafka fetch feed), the same parse
pipeline runs as one Structured Streaming query:

    readStream(pages) --dropDuplicatesWithinWatermark(url)-->
        record_features (same fused Arrow pass as the batch loop)
        --writeStream parquet, exactly-once via checkpoint-->

``trigger(availableNow=True)`` makes it an INCREMENTAL BATCH: each
invocation processes exactly the files that arrived since the last
checkpoint commit and exits — the oaipmh from_date resume semantics with
the bookkeeping moved into Spark's checkpoint. Dedup state survives
restarts through the state store, so a url seen in yesterday's run (within
the watermark horizon) is dropped in today's without any url_seen table.

At scale: the sink partitions by days(warc_ts) like the batch snapshots;
state-store size is bounded by the watermark horizon, not history — the
long-horizon crawl-once gate stays the bloom/cuckoo/merge-store job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.textstats import record_features
from ..schemas import PAGES_SCHEMA


def stream_pages(
    spark: SparkSession, pages_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    r = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(pages_dir)


def harvest_features_stream(
    pages: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Dedup-within-watermark on url, then the SAME fused feature pass the
    batch crawl loop runs (bit-equality with batch pinned in test_dedup)."""
    deduped = pages.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )
    return record_features(deduped.select("url", "warc_ts", "text"),
                           keep_cols=("url", "warc_ts"))


def run_harvest_increment(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
) -> None:
    """One incremental run: process all new files, commit, exit."""
    q = (
        harvest_features_stream(stream_pages(spark, pages_dir), watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
