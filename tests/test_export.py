"""JSONL shard export: planning math, on-disk layout, manifest parity."""

import json

import pyspark.sql.functions as F

from hepcrawl_spark.sources.export import plan_jsonl_shards, write_jsonl_shards


def _docs(spark, n=40):
    return spark.createDataFrame(
        [(i, f"document body number {i} " + "x" * (i % 7) * 10) for i in range(n)],
        "doc_id bigint, text string",
    )


def test_plan_shards_cuts_at_byte_boundaries(spark):
    docs = _docs(spark)
    plan = plan_jsonl_shards(docs, max_bytes=500, n_buckets=2).collect()
    by_bucket = {}
    for r in sorted(plan, key=lambda r: (r["bucket"], r["doc_id"])):
        by_bucket.setdefault(r["bucket"], []).append(r)
    for rows in by_bucket.values():
        cum = 0
        for r in rows:
            assert r["shard"] == cum // 500  # bytes BEFORE this doc
            cum += r["n_bytes"]
        # a shard overruns its boundary by at most one document
        per_shard = {}
        for r in rows:
            per_shard[r["shard"]] = per_shard.get(r["shard"], 0) + r["n_bytes"]
        for s, b in per_shard.items():
            assert b <= 500 + max(r["n_bytes"] for r in rows)


def test_write_jsonl_shards_roundtrip_and_manifest(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "export")
    manifest = write_jsonl_shards(docs, out, max_bytes=600, n_buckets=2)
    m = manifest.collect()
    assert sum(r["n_docs"] for r in m) == 40

    # every line parses and every doc_id is present exactly once
    lines = spark.read.text(f"{out}/data").collect()
    parsed = [json.loads(r["value"]) for r in lines]
    assert sorted(p["doc_id"] for p in parsed) == list(range(40))
    # manifest byte counts equal actual line bytes + newline
    total_bytes = sum(len(r["value"].encode()) + 1 for r in lines)
    assert total_bytes == sum(r["n_bytes"] for r in m)

    # deterministic: re-export reproduces the identical shard layout
    m2 = write_jsonl_shards(docs, str(tmp_path / "export2"), max_bytes=600, n_buckets=2)
    assert sorted(map(tuple, m2.collect())) == sorted(map(tuple, m))


def test_write_jsonl_shards_explicit_bucket(spark, tmp_path):
    docs = _docs(spark, 10).withColumn(
        "grp", (F.col("doc_id") % 2).cast("string")
    )
    out = str(tmp_path / "exp3")
    manifest = write_jsonl_shards(
        docs, out, max_bytes=10_000, bucket_col="grp"
    ).collect()
    assert {r["bucket"] for r in manifest} == {"0", "1"}
    assert all(r["shard"] == 0 for r in manifest)  # everything fits shard 0


def test_write_jsonl_shards_empty_input(spark, tmp_path):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    m = write_jsonl_shards(empty, str(tmp_path / "e"), max_bytes=100)
    assert m.count() == 0


def test_plan_shards_rejects_reserved_columns(spark):
    import pytest

    docs = spark.createDataFrame([(1, "x", 0)], "doc_id bigint, text string, shard int")
    with pytest.raises(ValueError, match="collide"):
        plan_jsonl_shards(docs, max_bytes=100)
