"""The frontier fixpoint: the engine's crawl driver loop.

Replaces the reference's Twisted-reactor + Scrapy-scheduler pipeline
(docs/overview.rst lifecycle; scheduler order = yield order per callback)
with an iterative DataFrame fixpoint — each iteration ("wave") is one
Catalyst query:

  1. politeness wave select   (P1/P2/P4: salted per-host window cap)
  2. robots gate              (P5: broadcast rules anti-join)
  3. crawl-once gate          (D1: bloom/cuckoo prefilter + exact anti-join)
  4. fetch                    (J5: equi-join wave vs pages on url)
  5. parse + outlink explode  (F5/UDTF: regexp link extraction, JVM-side)
  6. state merge              (frontier', url_seen', metrics, records)
  7. snapshot                 (parquet dir per iteration = Iceberg-snapshot
                               stand-in; manifest.json -> checkpoint/resume)

Scale shape: the only shuffles per wave are (a) the politeness window on the
salted host key, (b) the fetch join on url (bucketable at 100 TB so it
becomes a storage-partitioned join), (c) the url_seen merge (hash dedup).
The bloom prefilter keeps (c)'s probe side small. Lineage is truncated every
iteration by the snapshot write+read — mandatory in any DataFrame fixpoint
or plans grow unboundedly.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloom import build_bloom, might_contain_udf
from ..operators.cuckoo import build_cuckoo, cuckoo_might_contain_udf
from ..operators.dedup import crawl_once_gate
from ..operators.politeness import robots_gate, select_wave


@dataclass
class CrawlConfig:
    max_iterations: int = 10
    max_per_host: int = 100          # politeness cap per host per wave
    salt: int = 4                    # hot-host salting factor
    filter_mode: str = "bloom"       # 'bloom' | 'cuckoo' | 'none'
    bloom_fpp: float = 0.01
    state_dir: str | None = None     # snapshots + manifest for resume
    shuffle_partitions: int | None = None


@dataclass
class IterationStats:
    iteration: int
    scheduled: int
    fetched: int
    parsed: int
    new_urls: int
    frontier_size: int
    seen_size: int
    wall_s: float


@dataclass
class CrawlResult:
    iterations: list[IterationStats] = field(default_factory=list)

    @property
    def total_fetched(self) -> int:
        return sum(i.fetched for i in self.iterations)

    @property
    def total_scheduled(self) -> int:
        return sum(i.scheduled for i in self.iterations)

    @property
    def total_wall_s(self) -> float:
        return sum(i.wall_s for i in self.iterations)


_LINK_RE = r'href="([^"]+)"'


def extract_outlinks(fetched: DataFrame, text_col: str = "text") -> DataFrame:
    """UDTF-like link extraction (SURVEY §2.12): one page -> N outlinks.
    JVM regexp_extract_all + explode — no Python in the loop."""
    return (
        fetched.select(
            F.col("warc_ts").alias("discovered_ts"),
            F.explode(F.regexp_extract_all(F.col(text_col), F.lit(_LINK_RE), 1)).alias(
                "url"
            ),
        )
        .withColumn("host", F.lower(F.parse_url("url", F.lit("HOST"))))
        .filter(F.col("host").isNotNull())
    )


def _snapshot(df: DataFrame, path: str) -> DataFrame:
    """Write a parquet snapshot and read it back (lineage truncation +
    checkpoint). The write is the 'Iceberg snapshot commit' stand-in."""
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def _write_manifest(state_dir: str, iteration: int, extra: dict | None = None) -> None:
    manifest = {"iteration": iteration, **(extra or {})}
    tmp = os.path.join(state_dir, "_manifest.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(state_dir, "manifest.json"))  # atomic commit


def read_manifest(state_dir: str) -> dict | None:
    p = os.path.join(state_dir, "manifest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    config: CrawlConfig | None = None,
    robots: DataFrame | None = None,
    resume: bool = False,
) -> CrawlResult:
    """Run the crawl fixpoint to exhaustion or ``max_iterations``.

    ``pages``: the corpus (url, warc_ts, html, text, lang[, host]).
    ``seeds``: initial frontier (url, host, priority, discovered_ts).
    Returns per-iteration stats; all state lives in config.state_dir when
    set (making the run checkpoint-resumable), else in temp dirs.
    """
    cfg = config or CrawlConfig()
    state_dir = cfg.state_dir or f"/tmp/hepcrawl_spark_state_{os.getpid()}_{id(seeds)}"
    os.makedirs(state_dir, exist_ok=True)

    start_iter = 0
    if resume:
        m = read_manifest(state_dir)
        if m is not None:
            start_iter = m["iteration"] + 1
            frontier = spark.read.parquet(f"{state_dir}/iter_{m['iteration']:04d}/frontier")
            url_seen = spark.read.parquet(f"{state_dir}/iter_{m['iteration']:04d}/url_seen")
        else:
            resume = False
    if not resume:
        frontier = seeds.select(
            "url",
            "host",
            F.coalesce(F.col("priority"), F.lit(0.0)).alias("priority"),
            F.coalesce(F.col("discovered_ts"), F.current_timestamp()).alias(
                "discovered_ts"
            ),
        ).withColumn("attempt", F.lit(0))
        url_seen = spark.createDataFrame([], "url string, last_ts timestamp")

    # pages projected once; at 100 TB this scan is partition-pruned by the
    # fetch join keys (bucket(url)) — here a cached projection.
    corpus = pages.select("url", "warc_ts", "text")

    result = CrawlResult()
    metrics_rows = []

    for it in range(start_iter, cfg.max_iterations):
        t0 = time.monotonic()
        frontier.persist()
        frontier_size = frontier.count()
        if frontier_size == 0:
            frontier.unpersist()
            break

        # 1-2. politeness + robots
        wave = select_wave(frontier, cfg.max_per_host, cfg.salt).drop("wave_rank")
        if robots is not None:
            wave = robots_gate(wave, robots)

        # 3. crawl-once gate with membership prefilter
        seen_size = url_seen.count()
        if cfg.filter_mode == "bloom" and seen_size > 0:
            bf = build_bloom(
                url_seen.select(F.xxhash64("url").alias("url_hash")),
                n_items=seen_size,
                fpp=cfg.bloom_fpp,
            )
            probe = might_contain_udf(spark, bf)
            wave = wave.withColumn("_maybe_seen", probe(F.xxhash64("url")))
            gated = crawl_once_gate(
                wave.withColumn("warc_ts", F.col("discovered_ts")),
                url_seen,
                might_be_seen=F.col("_maybe_seen"),
            ).drop("_maybe_seen", "warc_ts")
        elif cfg.filter_mode == "cuckoo" and seen_size > 0:
            cf = build_cuckoo(
                url_seen.select(F.xxhash64("url").alias("url_hash")), n_items=seen_size
            )
            probe = cuckoo_might_contain_udf(spark, cf)
            wave = wave.withColumn("_maybe_seen", probe(F.xxhash64("url")))
            gated = crawl_once_gate(
                wave.withColumn("warc_ts", F.col("discovered_ts")),
                url_seen,
                might_be_seen=F.col("_maybe_seen"),
            ).drop("_maybe_seen", "warc_ts")
        else:
            gated = crawl_once_gate(
                wave.withColumn("warc_ts", F.col("discovered_ts")), url_seen
            ).drop("warc_ts")

        gated.persist()
        scheduled = gated.count()

        # 4. fetch join (J5)
        fetched = gated.select("url").join(corpus, "url", "inner")
        fetched.persist()
        fetched_n = fetched.count()

        # 5. parse: outlink explosion
        links = extract_outlinks(fetched)
        new_frontier_rows = (
            links.groupBy("url", "host")
            .agg(F.min("discovered_ts").alias("discovered_ts"))
            .withColumn("priority", F.lit(0.0))
            .withColumn("attempt", F.lit(0))
        )

        # 6. state merge
        new_seen = url_seen.unionByName(
            fetched.select("url", F.col("warc_ts").alias("last_ts"))
        ).groupBy("url").agg(F.max("last_ts").alias("last_ts"))

        remaining = frontier.join(gated.select("url"), "url", "left_anti")
        # drop attempted-but-unfetchable urls (not in corpus) instead of
        # retrying forever: anti-join wave too
        remaining = remaining.join(wave.select("url"), "url", "left_anti")
        candidates = new_frontier_rows.join(new_seen, "url", "left_anti").join(
            remaining.select("url"), "url", "left_anti"
        )
        next_frontier = remaining.unionByName(
            candidates.select("url", "host", "priority", "discovered_ts", "attempt")
        )

        # 7. snapshot (atomic-ish: data first, manifest last)
        it_dir = f"{state_dir}/iter_{it:04d}"
        next_frontier = _snapshot(next_frontier, f"{it_dir}/frontier")
        new_seen = _snapshot(new_seen, f"{it_dir}/url_seen")

        new_frontier_size = next_frontier.count()
        new_seen_size = new_seen.count()
        new_urls = candidates.count()

        # per-partition lineage/metrics (A2 / north rule)
        part_metrics = (
            fetched.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("fetched"))
            .withColumn("iteration", F.lit(it))
            .collect()
        )
        metrics_rows.extend(
            (it, r["partition_id"], scheduled, r["fetched"], r["fetched"], 0)
            for r in part_metrics
        )

        _write_manifest(
            state_dir,
            it,
            {"frontier": f"{it_dir}/frontier", "url_seen": f"{it_dir}/url_seen"},
        )

        frontier.unpersist()
        gated.unpersist()
        fetched.unpersist()
        frontier, url_seen = next_frontier, new_seen

        # previous iteration's snapshot can be vacuumed (keep last 2)
        old = f"{state_dir}/iter_{it - 2:04d}"
        if it >= 2 and os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

        result.iterations.append(
            IterationStats(
                iteration=it,
                scheduled=scheduled,
                fetched=fetched_n,
                parsed=fetched_n,
                new_urls=new_urls,
                frontier_size=new_frontier_size,
                seen_size=new_seen_size,
                wall_s=time.monotonic() - t0,
            )
        )
        if new_frontier_size == 0:
            break

    if metrics_rows:
        spark.createDataFrame(
            metrics_rows,
            "iteration int, partition_id int, scheduled long, fetched long, parsed long, errors long",
        ).write.mode("overwrite").parquet(f"{state_dir}/metrics")
    return result
