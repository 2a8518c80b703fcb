"""Measure the url_seen durable-commit crossover: full snapshot rewrite
(seen_store='snapshot', the default) vs touched-buckets-only MERGE
(seen_store='merge') as |seen| grows — round-4 verdict item #4: the 100-TB
claim for the production profile was design-argued but only measured at a
scale where the merge store LOSES (fixed costs dominate). This publishes
the per-iteration durable-commit wall vs |seen| so the crossover is a
measurement, not an assertion.

What is timed is exactly the per-iteration durable commit the two profiles
differ on (frontier.py `_snapshot` vs `_merge_seen`): everything else in a
wave (politeness window, fetch join, parse, bloom delta) is
profile-independent.

  default:  read prev snapshot -> union wave -> full O(|seen|) rewrite
  merge:    merge_upsert(wave) -> touched-buckets-only rewrite,
            O(|wave| + touched_buckets x bucket_size)

Env: SEEN_SIZES=1000000,4000000,8000000  WAVES=500,2000,8000
     BUCKETS=4096  CPUS=8  OUT_DIR=/tmp/seen_crossover

Usage: python tools/bench_seen_crossover.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def synth_seen(spark, n: int):
    """(url, last_ts) rows shaped like crawl state: ~60-byte urls over 1000
    hosts, deterministic."""
    return spark.range(0, n).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % 1000).cast("string"),
            F.lit(".example.org/path/seg/"), F.md5(F.col("id").cast("string")),
        ).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("last_ts"),
    )


def synth_wave(spark, seen_n: int, wave_n: int):
    """Half recrawls (ids inside the seen range), half fresh urls — the
    realistic delta mix."""
    lo = seen_n - wave_n // 2
    return spark.range(lo, lo + wave_n).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % 1000).cast("string"),
            F.lit(".example.org/path/seg/"), F.md5(F.col("id").cast("string")),
        ).alias("url"),
        F.lit("2024-06-01 00:00:00").cast("timestamp").alias("last_ts"),
    )


def main():
    from hepcrawl_spark.session import get_spark
    from hepcrawl_spark.sources import merge_store

    sizes = [int(s) for s in os.environ.get(
        "SEEN_SIZES", "1000000,4000000,8000000").split(",")]
    waves = [int(s) for s in os.environ.get("WAVES", "500,2000,8000").split(",")]
    buckets = int(os.environ.get("BUCKETS", "4096"))
    cpus = os.environ.get("CPUS", "8")
    out_dir = os.environ.get("OUT_DIR", "/tmp/seen_crossover")

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    results = []
    for n in sizes:
        base = f"{out_dir}/seen_{n}"
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        seen = synth_seen(spark, n)
        seen.write.mode("overwrite").parquet(f"{base}/prev")

        row = {"seen": n, "buckets": buckets}
        # default profile: the O(|seen|) full rewrite (2 trials, min —
        # the shared host is noisy)
        for w in waves:
            wave = synth_wave(spark, n, w)
            best = None
            for _ in range(2):
                shutil.rmtree(f"{base}/next", ignore_errors=True)
                t0 = time.monotonic()
                (
                    spark.read.parquet(f"{base}/prev")
                    .unionByName(wave)
                    .groupBy("url").agg(F.max("last_ts").alias("last_ts"))
                    .write.mode("overwrite").parquet(f"{base}/next")
                )
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            row[f"default_w{w}_s"] = round(best, 3)

        # merge profile: one-off table seed (amortized over the run), then
        # per-wave touched-buckets MERGE
        t0 = time.monotonic()
        merge_store.create_table(
            spark.read.parquet(f"{base}/prev"), f"{base}/merge",
            key="url", n_buckets=buckets,
        )
        row["merge_seed_s"] = round(time.monotonic() - t0, 3)
        for w in waves:
            wave = synth_wave(spark, n, w)
            best = None
            touched = None
            for _ in range(2):
                t0 = time.monotonic()
                merge_store.merge_upsert(spark, f"{base}/merge", wave, key="url")
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            touched = (
                wave.select(
                    merge_store._bucket("url", buckets).alias("b")
                ).distinct().count()
            )
            row[f"merge_w{w}_s"] = round(best, 3)
            row[f"merge_w{w}_touched"] = touched
        results.append(row)
        print(json.dumps(row), flush=True)
        shutil.rmtree(base, ignore_errors=True)

    print(json.dumps({"metric": "url_seen durable-commit wall vs |seen|",
                      "unit": "sec", "rows": results}))
    spark.stop()


if __name__ == "__main__":
    main()
