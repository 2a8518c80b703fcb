"""Iceberg-shaped MERGE store: bucket-granular copy-on-write correctness.

Verdict r2 order 9 "done" criterion: resume-capable crawl state where each
iteration rewrites ONLY the buckets its wave touched.
"""

import os

import pyspark.sql.functions as F
import pytest

from hepcrawl_spark.sources import merge_store as M
from hepcrawl_spark.sources.pages import synthesize_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    pages = synthesize_corpus(spark, n_pages=600, n_hosts=8, links_per_page=3)
    pages.persist()
    pages.count()
    return pages


@pytest.fixture(scope="module")
def seeds(corpus):
    return corpus.orderBy("page_id").limit(10).select(
        "url", "host", F.lit(1.0).alias("priority"),
        F.col("warc_ts").alias("discovered_ts"),
    )


def _mk(spark, rows):
    return spark.createDataFrame(rows, "url string, last_ts timestamp").select(
        "url", F.col("last_ts").cast("timestamp")
    )


def _rows(spark, table_dir, snapshot=None):
    return {
        (r["url"], r["last_ts"])
        for r in M.read_table(spark, table_dir, snapshot).collect()
    }


@pytest.fixture()
def base(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2020, 1, 1)
    rows = [(f"u{i}", t0) for i in range(200)]
    df = _mk(spark, rows)
    d = str(tmp_path / "tbl")
    M.create_table(df, d, key="url", n_buckets=8)
    return d, rows, t0


def test_upsert_matches_union_groupby_oracle(spark, base):
    import datetime as dt

    d, rows, t0 = base
    t1 = dt.datetime(2021, 6, 1)
    # 30 updates (newer ts) + 20 inserts + 5 STALE updates (older ts, must
    # NOT win: WHEN MATCHED keeps the max)
    delta = _mk(
        spark,
        [(f"u{i}", t1) for i in range(30)]
        + [(f"new{i}", t1) for i in range(20)]
        + [(f"u{i}", dt.datetime(2019, 1, 1)) for i in range(100, 105)],
    )
    M.merge_upsert(spark, d, delta, key="url")
    expect = {(f"u{i}", t1) for i in range(30)}
    expect |= {(f"u{i}", t0) for i in range(30, 200)}
    expect |= {(f"new{i}", t1) for i in range(20)}
    assert _rows(spark, d) == expect


def test_only_touched_buckets_rewrite(spark, base):
    import datetime as dt

    d, rows, t0 = base
    m_before = M._read_manifest(d)
    # a delta of ONE url touches exactly one of the 8 buckets
    delta = _mk(spark, [("u0", dt.datetime(2022, 1, 1))])
    M.merge_upsert(spark, d, delta, key="url")
    m_after = M._read_manifest(d)
    changed = [
        b
        for b in m_before["buckets"]
        if m_before["buckets"][b] != m_after["buckets"][b]
    ]
    assert len(changed) == 1
    # untouched buckets carry the ORIGINAL data paths (copy-on-write: the
    # gen-0 files were not rewritten, merely re-referenced)
    for b, p in m_after["buckets"].items():
        if b != changed[0]:
            assert p == m_before["buckets"][b]
            assert os.path.isdir(p)


def test_time_travel_and_commit_protocol(spark, base):
    import datetime as dt

    d, rows, t0 = base
    before = _rows(spark, d)
    M.merge_upsert(spark, d, _mk(spark, [("zzz", dt.datetime(2023, 1, 1))]))
    assert M.current_snapshot(d) == 1
    assert _rows(spark, d, snapshot=0) == before  # time travel
    assert _rows(spark, d) == before | {("zzz", dt.datetime(2023, 1, 1))}


def test_merge_delete_rewrites_only_matching_buckets(spark, base):
    import datetime as dt

    d, rows, t0 = base
    t1 = dt.datetime(2021, 6, 1)
    M.merge_upsert(spark, d, _mk(spark, [(f"u{i}", t1) for i in range(10)]))
    m_before = M._read_manifest(d)
    n = M.merge_delete(spark, d, "last_ts < timestamp '2021-01-01'")
    m_after = M._read_manifest(d)
    # every pre-2021 row gone, the 10 updated survive
    assert _rows(spark, d) == {(f"u{i}", t1) for i in range(10)}
    assert 0 < n <= 8
    carried = [
        b
        for b in m_after["buckets"]
        if m_before["buckets"].get(b) == m_after["buckets"][b]
    ]
    # buckets holding only updated rows carry over without a rewrite
    assert len(m_after["buckets"]) <= len(m_before["buckets"])
    # deleting everything empties the table (bucket entries drop out)
    M.merge_delete(spark, d, "last_ts >= timestamp '2000-01-01'")
    assert _rows(spark, d) == set()


def test_rollback_abandons_forked_snapshots(spark, base):
    import datetime as dt

    d, rows, t0 = base
    s0 = _rows(spark, d)
    M.merge_upsert(spark, d, _mk(spark, [("a", dt.datetime(2022, 1, 1))]))
    M.merge_upsert(spark, d, _mk(spark, [("b", dt.datetime(2022, 1, 2))]))
    assert M.current_snapshot(d) == 2
    M.rollback(d, 0)
    assert M.current_snapshot(d) == 0
    assert _rows(spark, d) == s0
    assert not os.path.exists(os.path.join(d, "snap-2.json"))
    # merging forward after rollback works and re-uses the freed snap ids
    M.merge_upsert(spark, d, _mk(spark, [("c", dt.datetime(2022, 2, 1))]))
    assert M.current_snapshot(d) == 1
    assert _rows(spark, d) == s0 | {("c", dt.datetime(2022, 2, 1))}


def test_vacuum_keeps_referenced_generations(spark, base):
    import datetime as dt

    d, rows, t0 = base
    for i in range(5):
        M.merge_upsert(
            spark, d, _mk(spark, [(f"v{i}", dt.datetime(2022, 1, 1 + i))])
        )
    live = _rows(spark, d)
    M.vacuum(d, keep_snapshots=2)
    # newest snapshots stay readable; expired manifests are gone
    assert _rows(spark, d) == live
    assert _rows(spark, d, snapshot=4) is not None
    assert not os.path.exists(os.path.join(d, "snap-0.json"))


# --- crawl integration ------------------------------------------------------


def test_crawl_merge_seen_store_equivalence_and_resume(
    spark, corpus, seeds, tmp_path
):
    """seen_store='merge' must reproduce the snapshot-mode url_seen set,
    commit per-iteration merge snapshots with untouched buckets carried
    over, and resume mid-crawl to the identical final state."""
    from hepcrawl_spark.crawl.frontier import CrawlConfig, read_manifest, run_crawl

    sd_a = str(tmp_path / "snap_mode")
    run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=3, max_per_host=20, salt=1,
                    filter_mode="none", state_dir=sd_a),
    )
    m = read_manifest(sd_a)
    seen_a = {
        r["url"]
        for r in spark.read.parquet(f"{sd_a}/iter_{m['iteration']:04d}/url_seen").collect()
    }

    sd_b = str(tmp_path / "merge_mode")
    run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=3, max_per_host=20, salt=1,
                    filter_mode="none", state_dir=sd_b,
                    seen_store="merge", seen_buckets=64),
    )
    seen_dir = f"{sd_b}/url_seen_merge"
    seen_b = {r["url"] for r in M.read_table(spark, seen_dir).collect()}
    assert seen_b == seen_a

    # bucket-granular writes: across consecutive snapshots, some bucket
    # paths must CARRY OVER (64 buckets >> wave size per bucket coverage)
    head = M.current_snapshot(seen_dir)
    assert head >= 2  # one commit per iteration
    m1 = M._read_manifest(seen_dir, head - 1)
    m2 = M._read_manifest(seen_dir, head)
    carried = [
        b for b in m1["buckets"] if m1["buckets"][b] == m2["buckets"].get(b)
    ]
    assert carried, "every bucket rewrote — not a bucket-granular merge"

    # resume: rerun over the same state_dir continues from the manifest
    res = run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=5, max_per_host=20, salt=1,
                    filter_mode="none", state_dir=sd_b,
                    seen_store="merge", seen_buckets=64),
        resume=True,
    )
    assert res.iterations, "resume ran no iterations"
    seen_resumed = {r["url"] for r in M.read_table(spark, seen_dir).collect()}

    sd_c = str(tmp_path / "straight")
    run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=5, max_per_host=20, salt=1,
                    filter_mode="none", state_dir=sd_c),
    )
    mc = read_manifest(sd_c)
    seen_c = {
        r["url"]
        for r in spark.read.parquet(f"{sd_c}/iter_{mc['iteration']:04d}/url_seen").collect()
    }
    assert seen_resumed == seen_c


def test_null_key_rows_dropped_from_delta(spark, base):
    import datetime as dt

    d, rows, t0 = base
    before = _rows(spark, d)
    delta = _mk(spark, [(None, dt.datetime(2025, 1, 1)), ("ok", dt.datetime(2025, 1, 1))])
    M.merge_upsert(spark, d, delta)
    assert _rows(spark, d) == before | {("ok", dt.datetime(2025, 1, 1))}


def test_merge_delete_keeps_null_predicate_rows(spark, tmp_path):
    """WHEN MATCHED AND <where> THEN DELETE removes only rows whose
    predicate is definitely TRUE; a NULL-predicate row (e.g. a NULL
    last_ts) sharing a bucket with a real match must survive the bucket
    rewrite."""
    from hepcrawl_spark.sources import merge_store as MS

    d = str(tmp_path / "nulldel")
    base = spark.createDataFrame(
        [("u_null", None), ("u_old", "2000-01-01 00:00:00"),
         ("u_new", "2030-01-01 00:00:00")],
        "url string, ts string",
    ).select("url", F.to_timestamp("ts").alias("last_ts"))
    MS.create_table(base, d, key="url", n_buckets=1)  # one shared bucket
    n = MS.merge_delete(spark, d, "last_ts < timestamp '2020-01-01 00:00:00'")
    assert n == 1  # one bucket rewritten
    left = {r["url"] for r in MS.read_table(spark, d).collect()}
    assert left == {"u_null", "u_new"}
