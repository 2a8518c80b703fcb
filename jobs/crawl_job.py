"""spark-submit entrypoint for the crawl fixpoint (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

    spark-submit --py-files hepcrawl_spark.zip jobs/crawl_job.py \
        --pages  s3://bucket/pages_parquet \
        --seeds  s3://bucket/seeds_parquet \
        --state  s3://bucket/crawl_state \
        --iterations 100 --max-per-host 1000 --salt 16 \
        --filter-mode bloom_table --seen-store merge \
        --snapshot-every 5

On a cluster the session comes from the submit conf (executors, memory,
shuffle partitions); ``get_spark``'s local[] default only applies when no
master is configured. All state lives under ``--state`` so a killed driver
resumes with ``--resume``.

Build the zip with ``python tools/make_submit.py`` (writes
``dist/hepcrawl_spark.zip`` + prints the submit command).
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="hepcrawl_spark crawl fixpoint")
    p.add_argument("--pages", required=True, help="parquet/Iceberg pages table")
    p.add_argument("--seeds", required=True, help="parquet seed table")
    p.add_argument("--state", required=True, help="state dir (snapshots+manifest)")
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--max-per-host", type=int, default=100)
    p.add_argument("--salt", type=int, default=4)
    p.add_argument("--filter-mode", default="auto",
                   choices=["auto", "bloom", "bloom_table", "cuckoo", "none"])
    p.add_argument("--seen-store", default="snapshot",
                   choices=["snapshot", "merge"])
    p.add_argument("--snapshot-every", type=int, default=1)
    p.add_argument("--max-attempts", type=int, default=1)
    p.add_argument("--expected-urls", type=int, default=1_000_000)
    p.add_argument("--bloom-shards", type=int, default=32)
    p.add_argument("--recrawl-cutoff", default=None,
                   help="ISO ts: invalidate url_seen entries older than this")
    p.add_argument("--resume", action="store_true")
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> None:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession

    from hepcrawl_spark.crawl.frontier import CrawlConfig, run_crawl
    from hepcrawl_spark.session import get_spark

    # under spark-submit an active session/conf already carries the cluster
    # master; only fall back to the tuned local builder otherwise
    active = SparkSession.getActiveSession()
    spark = active if active is not None else get_spark(app_name="crawl-job")

    pages = spark.read.parquet(args.pages)
    seeds = spark.read.parquet(args.seeds)
    cfg = CrawlConfig(
        max_iterations=args.iterations,
        max_per_host=args.max_per_host,
        salt=args.salt,
        filter_mode=args.filter_mode,
        seen_store=args.seen_store,
        snapshot_every=args.snapshot_every,
        max_attempts=args.max_attempts,
        n_expected_urls=args.expected_urls,
        bloom_shards=args.bloom_shards,
        recrawl_cutoff=args.recrawl_cutoff,
        state_dir=args.state,
    )
    res = run_crawl(spark, pages, seeds, cfg, resume=args.resume)
    print(
        json.dumps(
            {
                "iterations": len(res.iterations),
                "scheduled": res.total_scheduled,
                "fetched": res.total_fetched,
                "wall_s": round(res.total_wall_s, 2),
                "urls_per_sec": round(
                    (res.total_scheduled + res.total_fetched)
                    / max(res.total_wall_s, 1e-9),
                    1,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
