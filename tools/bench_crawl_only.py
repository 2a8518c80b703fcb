"""Run ONLY the default-profile crawl-fixpoint bench (the headline metric)
against an arbitrary checkout — the instrument for bisecting cross-round
throughput questions (round-4 verdict #5: crawl_fixpoint −11 % in a single
r04 measurement, host noise suspected, needed re-confirmation under the
pinned best-of-N protocol on one host window).

Env: SPARK_GRAFT_REPO=/root/repo   (tree whose code to benchmark)
     SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1   SPARK_GRAFT_CPUS=32
     TRIALS=2

Prints one JSON line per trial plus a `best` summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = os.environ.get("SPARK_GRAFT_REPO", "/root/repo")
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("TRIALS", "2"))

    import pyspark.sql.functions as F

    from hepcrawl_spark.crawl.frontier import CrawlConfig, run_crawl
    from hepcrawl_spark.session import get_spark
    from hepcrawl_spark.sources.pages import synthesize_corpus

    spark = get_spark(
        app_name="hepcrawl-crawl-only",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    lineitem_rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    n_pages = max(5_000, lineitem_rows // 12)
    corpus = synthesize_corpus(
        spark, n_pages=n_pages, n_hosts=64, links_per_page=4
    ).persist()
    corpus.count()
    seeds = corpus.filter(F.col("page_id") % 100 == 0).select(
        "url", "host", F.lit(1.0).alias("priority"),
        F.col("warc_ts").alias("discovered_ts"),
    )
    best = None
    for t in range(trials):
        state_dir = f"/tmp/hepcrawl_crawlonly_{os.getpid()}_{t}"
        t0 = time.monotonic()
        res = run_crawl(
            spark, corpus, seeds,
            CrawlConfig(
                max_iterations=4, max_per_host=2000, salt=4,
                filter_mode="bloom", state_dir=state_dir, snapshot_every=2,
            ),
        )
        wall = time.monotonic() - t0
        urls = res.total_scheduled + res.total_fetched
        steady = [i for i in res.iterations if i.iteration >= 1]
        s_urls = sum(i.scheduled + i.fetched for i in steady)
        s_wall = sum(i.wall_s for i in steady)
        row = {
            "repo": repo, "trial": t, "wall_s": round(wall, 2),
            "urls_per_sec": round(urls / wall, 1),
            # a crawl that reaches fixpoint during iteration 0 has no
            # steady-state window
            "urls_per_sec_steady": round(s_urls / s_wall, 1) if s_wall else None,
        }
        print(json.dumps(row), flush=True)
        if best is None or row["urls_per_sec"] > best["urls_per_sec"]:
            best = row
    print(json.dumps({"best": best}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
