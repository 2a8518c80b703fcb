"""PII redaction, deterministic mix sampling, document chunking."""

import pytest

from hepcrawl_spark.operators.scrub import (
    chunk_documents,
    redact_pii,
    sample_by_source,
    sample_hash,
)


def test_redact_pii(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@example.co.uk or call +44 (0)20 7946-0958 now"),
            (2, "server at 192.168.1.254 port 8080"),
            (3, "clean prose with numbers like 42 and 2024 stays"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert got[1]["text"] == "mail [EMAIL] or call [PHONE] now"
    assert (got[1]["n_emails"], got[1]["n_phones"]) == (1, 1)
    assert got[2]["text"] == "server at [IP] port 8080"
    assert got[2]["n_ips"] == 1
    assert got[3]["text"].startswith("clean prose")
    assert got[3]["n_phones"] == 0
    assert got[4]["text"] is None


def test_sample_by_source_deterministic_and_rate(spark):
    import pyspark.sql.functions as F

    docs = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "arxiv").otherwise("web").alias("source"),
        F.lit("t").alias("text"),
    )
    kept = sample_by_source(docs, {"arxiv": 1.0, "web": 0.25}, seed="s1")
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["arxiv"] == 2000                  # rate 1.0 keeps all
    assert 400 < counts["web"] < 600                # ~0.25 of 2000
    # decisions are a pure function of (id, seed): re-run identical; a
    # SUBSET keeps exactly the intersection (no reshuffling)
    ids = {r["doc_id"] for r in kept.collect()}
    again = {r["doc_id"] for r in sample_by_source(
        docs, {"arxiv": 1.0, "web": 0.25}, seed="s1").collect()}
    assert ids == again
    sub = {r["doc_id"] for r in sample_by_source(
        docs.filter("doc_id < 1000"), {"arxiv": 1.0, "web": 0.25}, seed="s1"
    ).collect()}
    assert sub == {i for i in ids if i < 1000}
    # different seed -> different web picks, same arxiv (rate 1.0)
    other = {r["doc_id"] for r in sample_by_source(
        docs, {"arxiv": 1.0, "web": 0.25}, seed="s2").collect()}
    assert other != ids and {i for i in other if i % 2 == 0} == {
        i for i in ids if i % 2 == 0}
    # unknown source drops by default
    assert sample_by_source(
        docs.withColumn("source", F.lit("mystery")), {"web": 0.5}
    ).count() == 0


def test_chunk_documents_windows(spark):
    text = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, text), (2, None), (3, "   ")], "doc_id long, text string"
    )
    # no overlap: 4+4+2
    got = sorted(
        (r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(docs, chunk_tokens=4).collect()
    )
    assert [g[2] for g in got] == [4, 4, 2]
    assert got[0][1] == "t0 t1 t2 t3" and got[2][1] == "t8 t9"
    # overlap=1: windows of 4 advancing by 3 -> starts 0,3,6 then tail 9
    got2 = sorted(
        (r["chunk_id"], r["chunk_text"]) for r in
        chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    )
    assert got2[0][1] == "t0 t1 t2 t3"
    assert got2[1][1] == "t3 t4 t5 t6"
    assert got2[2][1] == "t6 t7 t8 t9"
    # null and whitespace-only text -> no chunks; docs 2/3 absent
    assert {g[0] for g in got2} == {0, 1, 2}


def test_chunk_min_tokens_drops_tiny_tail(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(9)))], "doc_id long, text string"
    )
    # windows of 4 step 4: 4+4+1; the 1-token tail drops at min_tokens=2
    out = chunk_documents(docs, chunk_tokens=4, min_tokens=2).collect()
    assert sorted(r["n_tokens"] for r in out) == [4, 4]


def test_sample_hash_is_uniformish(spark):
    import pyspark.sql.functions as F

    df = spark.range(0, 20000).select(sample_hash(F.col("id"), "u").alias("h"))
    row = df.agg(F.avg("h"), F.min("h"), F.max("h")).collect()[0]
    assert abs(row[0] - 0.5) < 0.02 and row[1] >= 0.0 and row[2] < 1.0


def test_leakage_safe_split_keeps_clusters_together(spark):
    from hepcrawl_spark.operators.components import dedup_clusters
    from hepcrawl_spark.operators.scrub import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    # pairs chain 0-1-2, 10-11, rest singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    labeled = dedup_clusters(pairs, docs)
    out = leakage_safe_split(labeled, val_frac=0.3).collect()
    by_comp = {}
    for r in out:
        by_comp.setdefault(r["component"], set()).add(r["split"])
    # no component straddles the boundary
    assert all(len(v) == 1 for v in by_comp.values())
    splits = {r["split"] for r in out}
    assert splits == {"train", "val"}  # both sides populated at 30%
    # determinism
    again = {r["doc_id"]: r["split"]
             for r in leakage_safe_split(labeled, val_frac=0.3).collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in out)
