"""End-to-end serving-index build: BM25 postings + IVF-PQ codes on disk,
then a query served FROM the written artifacts."""

import numpy as np
import pyspark.sql.functions as F

from hepcrawl_spark.operators.search import BM25Index, bm25_topk
from hepcrawl_spark.operators.similarity import synthesize_clustered_embeddings


def test_index_job_roundtrip(spark, tmp_path):
    from jobs.index_job import load_ivfpq_model, parse_args, run

    docs = spark.createDataFrame(
        [(i, f"term{i % 7} common words here number {i}") for i in range(200)],
        "doc_id long, text string",
    )
    emb = synthesize_clustered_embeddings(spark, 400, dim=32, n_clusters=8)
    docs.write.parquet(str(tmp_path / "docs"))
    emb.write.parquet(str(tmp_path / "emb"))

    out = str(tmp_path / "index")
    audit = run(
        spark,
        parse_args(
            [
                "--docs", str(tmp_path / "docs"),
                "--emb", str(tmp_path / "emb"),
                "--output", out,
                "--term-buckets", "8",
                "--n-cells", "8",
                "--pq-m", "8",
                "--pq-ksub", "16",
            ]
        ),
    )
    assert audit["bm25"]["n_docs"] == 200
    assert audit["ivfpq"]["code_bytes_per_vec"] == 8

    # serve BM25 from the written postings (partition pruning on bucket)
    postings = spark.read.parquet(f"{out}/bm25_postings")
    idx = BM25Index(
        postings=postings,
        n_docs=audit["bm25"]["n_docs"],
        total_len=audit["bm25"]["total_len"],
    )
    q = spark.createDataFrame([(0, "term3")], "query_id long, term string")
    hits = bm25_topk(idx, q, k=5).collect()
    assert len(hits) == 5
    assert all(r["doc_id"] % 7 == 3 for r in hits)

    # the codes table is cell-partitioned and code-only (no float column)
    codes = spark.read.parquet(f"{out}/ivfpq_codes")
    assert set(codes.columns) == {"vec_id", "cell", "code"}
    assert codes.count() == 400
    C, books = load_ivfpq_model(spark, out)
    assert C.shape == (8, 32) and books.shape == (8, 16, 4)
    # every stored code decodes against the stored books: values in range
    row = codes.first()
    assert len(row["code"]) == 8 and all(0 <= c < 16 for c in row["code"])
