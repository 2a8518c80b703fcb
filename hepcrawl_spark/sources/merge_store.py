"""Iceberg-shaped MERGE INTO emulation: bucketed copy-on-write upsert.

The 100-TB url_seen design (SURVEY §7; reference state = Scrapy's on-disk
seen-set, middlewares.py:125-165) is an Iceberg table partitioned by
``bucket(url)`` that each crawl iteration updates with

    MERGE INTO url_seen t USING wave s ON t.url = s.url
    WHEN MATCHED THEN UPDATE SET last_ts = greatest(t.last_ts, s.last_ts)
    WHEN NOT MATCHED THEN INSERT *

so a wave touching k of n_buckets rewrites only k data files and commits a
new manifest — never the full table. Without Iceberg in this sandbox, this
module implements exactly that storage contract on plain parquet:

- data files:   ``<dir>/data/gen-<snap>-b<bucket>/`` (one parquet dir per
  (generation, bucket); bucket = ``pmod(xxhash64(url), n_buckets)``)
- manifest:     ``<dir>/snap-<n>.json`` maps bucket -> its CURRENT data dir
- commit:       ``<dir>/HEAD`` rewritten atomically (os.replace) AFTER the
  data writes — crash-safe, readers never see a partial snapshot; old
  snapshots stay readable (time travel) until ``vacuum``.

Everything driver-side is O(n_buckets) metadata (a dict of ints->paths);
row data only moves through executor-side jobs. The only ``collect`` is
the delta's distinct bucket ids — bounded by n_buckets, not rows.

A real deployment swaps every function here for ``spark.sql("MERGE INTO
...")`` on an Iceberg catalog table; callers (crawl/frontier.py url_seen
mode ``seen_store='merge'``) do not change.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _bucket(key_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


def _head_path(table_dir: str) -> str:
    return os.path.join(table_dir, "HEAD")


def current_snapshot(table_dir: str) -> int:
    with open(_head_path(table_dir)) as f:
        return int(f.read().strip())


def _read_manifest(table_dir: str, snapshot: int | None = None) -> dict:
    snap = current_snapshot(table_dir) if snapshot is None else snapshot
    with open(os.path.join(table_dir, f"snap-{snap}.json")) as f:
        m = json.load(f)
    m["snapshot"] = snap
    return m


def _commit(table_dir: str, snap: int, manifest: dict) -> None:
    """Manifest file first, HEAD swap last — the Iceberg commit protocol."""
    with open(os.path.join(table_dir, f"snap-{snap}.json"), "w") as f:
        json.dump(manifest, f)
    tmp = _head_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(snap))
    os.replace(tmp, _head_path(table_dir))


def _write_buckets(
    df: DataFrame, table_dir: str, snap: int, key: str, n_buckets: int
) -> dict[str, str]:
    """One partitionBy write job -> per-bucket dirs; returns bucket->path.

    ``partitionBy`` lays out ``bucket=K`` subdirs in a single job (no
    per-bucket driver loop); the dirs are then mapped into the manifest.
    """
    gen = os.path.join(table_dir, "data", f"gen-{snap}")
    (
        df.withColumn("bucket", _bucket(key, n_buckets))
        .repartition(F.col("bucket"))
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(gen)
    )
    return {
        d.split("=", 1)[1]: os.path.join(gen, d)
        for d in os.listdir(gen)
        if d.startswith("bucket=")
    }


def create_table(
    df: DataFrame, table_dir: str, key: str = "url", n_buckets: int = 16
) -> None:
    os.makedirs(table_dir, exist_ok=True)
    buckets = _write_buckets(df, table_dir, 0, key, n_buckets)
    _commit(
        table_dir, 0, {"n_buckets": n_buckets, "key": key, "buckets": buckets}
    )


def read_table(
    spark: SparkSession, table_dir: str, snapshot: int | None = None
) -> DataFrame:
    """Assemble the table from the manifest's data files (time travel via
    ``snapshot``). An empty table reads as an empty DataFrame with no rows
    but callers own the schema, so we require >=1 bucket or return None-safe
    empty via the stored key column."""
    m = _read_manifest(table_dir, snapshot)
    paths = sorted(m["buckets"].values())
    if not paths:
        return spark.createDataFrame([], f"{m['key']} string, last_ts timestamp")
    return spark.read.parquet(*paths)


def merge_upsert(
    spark: SparkSession,
    table_dir: str,
    delta: DataFrame,
    key: str = "url",
) -> DataFrame:
    """MERGE INTO <table> USING <delta> ON key — matched rows keep the max
    of every non-key column (greatest-timestamp upsert), unmatched insert.

    Only buckets present in the delta are read, merged, and rewritten; all
    other manifest entries carry over untouched (copy-on-write at bucket
    granularity). Returns the merged TOUCHED partition as a DataFrame for
    callers that want to inspect it; the committed table is on disk.
    """
    m = _read_manifest(table_dir)
    n_buckets, snap = m["n_buckets"], m["snapshot"] + 1
    # a null key has no bucket; it can never be MERGE-matched either
    delta = delta.filter(F.col(key).isNotNull()).withColumn(
        "bucket", _bucket(key, n_buckets)
    )
    touched = sorted(
        r["bucket"] for r in delta.select("bucket").distinct().collect()
    )
    if not touched:
        return read_table(spark, table_dir)
    old_paths = [
        m["buckets"][str(b)] for b in touched if str(b) in m["buckets"]
    ]
    old = (
        spark.read.parquet(*old_paths)
        if old_paths
        else spark.createDataFrame([], delta.drop("bucket").schema)
    )
    value_cols = [c for c in delta.columns if c not in (key, "bucket")]
    merged = (
        old.unionByName(delta.drop("bucket"))
        .groupBy(key)
        .agg(*[F.max(c).alias(c) for c in value_cols])
    )
    new_dirs = _write_buckets(merged, table_dir, snap, key, n_buckets)
    buckets = dict(m["buckets"])
    for b in touched:
        # a bucket can vanish only via merge_delete; upsert never empties it
        buckets[str(b)] = new_dirs[str(b)]
    _commit(
        table_dir, snap, {"n_buckets": n_buckets, "key": key, "buckets": buckets}
    )
    return merged


def merge_delete(spark: SparkSession, table_dir: str, where: str) -> int:
    """MERGE ... WHEN MATCHED AND <where> THEN DELETE (e.g. the
    recrawl-cutoff invalidation, reference middlewares.py:134-155): scans
    all buckets to FIND matches but rewrites only buckets that contain one.
    Returns the number of rewritten buckets."""
    m = _read_manifest(table_dir)
    n_buckets, snap, key = m["n_buckets"], m["snapshot"] + 1, m["key"]
    full = read_table(spark, table_dir)
    hit = (
        full.filter(where)
        .select(_bucket(key, n_buckets).alias("bucket"))
        .distinct()
        .collect()
    )
    touched = sorted(r["bucket"] for r in hit)
    if not touched:
        return 0
    old_paths = [m["buckets"][str(b)] for b in touched]
    # keep rows whose predicate is FALSE **or NULL**: WHEN MATCHED AND
    # <where> only deletes rows where the predicate is definitely true —
    # a bare NOT(where) filter would silently drop NULL-predicate rows
    # (e.g. a NULL last_ts) that share a bucket with a real match
    from pyspark.sql import functions as _F

    kept = spark.read.parquet(*old_paths).filter(
        ~_F.coalesce(_F.expr(where), _F.lit(False))
    )
    new_dirs = _write_buckets(kept, table_dir, snap, key, n_buckets)
    buckets = dict(m["buckets"])
    for b in touched:
        if str(b) in new_dirs:
            buckets[str(b)] = new_dirs[str(b)]
        else:
            del buckets[str(b)]  # every row in the bucket matched `where`
    _commit(
        table_dir, snap, {"n_buckets": n_buckets, "key": key, "buckets": buckets}
    )
    return len(touched)


def rollback(table_dir: str, snapshot: int) -> None:
    """Reset HEAD to an older snapshot and abandon the forked ones after it
    (crash recovery: the crawl manifest commits every K-th iteration while
    the merge table commits every iteration — resume must rebase the table
    onto the manifest's snapshot before merging forward)."""
    head = current_snapshot(table_dir)
    if snapshot > head:
        raise ValueError(f"rollback target {snapshot} is ahead of HEAD {head}")
    keep = set(_read_manifest(table_dir, snapshot)["buckets"].values())
    for s in range(snapshot + 1, head + 1):
        p = os.path.join(table_dir, f"snap-{s}.json")
        if os.path.exists(p):
            os.remove(p)
    tmp = _head_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(snapshot))
    os.replace(tmp, _head_path(table_dir))
    # drop forked data gens no live manifest references (<= target snapshots
    # may still time-travel; their gens are untouched by construction)
    live: set[str] = set(keep)
    for s in range(0, snapshot):
        try:
            live |= set(_read_manifest(table_dir, s)["buckets"].values())
        except FileNotFoundError:
            continue
    live_gens = {os.path.dirname(p) for p in live}
    data_dir = os.path.join(table_dir, "data")
    for gen in os.listdir(data_dir):
        gen_path = os.path.join(data_dir, gen)
        if gen_path not in live_gens:
            shutil.rmtree(gen_path, ignore_errors=True)


def vacuum(table_dir: str, keep_snapshots: int = 2) -> None:
    """Drop data generations unreferenced by the newest ``keep_snapshots``
    manifests, and the expired manifests themselves."""
    head = current_snapshot(table_dir)
    live_snaps = [s for s in range(head - keep_snapshots + 1, head + 1) if s >= 0]
    referenced: set[str] = set()
    for s in live_snaps:
        try:
            referenced |= set(_read_manifest(table_dir, s)["buckets"].values())
        except FileNotFoundError:
            continue
    data_dir = os.path.join(table_dir, "data")
    ref_gens = {os.path.dirname(p) for p in referenced}
    for gen in os.listdir(data_dir):
        gen_path = os.path.join(data_dir, gen)
        if gen_path not in ref_gens and not any(
            p.startswith(gen_path + os.sep) for p in referenced
        ):
            shutil.rmtree(gen_path, ignore_errors=True)
    for f in os.listdir(table_dir):
        if f.startswith("snap-") and int(f[5:-5]) not in live_snaps:
            os.remove(os.path.join(table_dir, f))
