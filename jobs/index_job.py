"""spark-submit entrypoint for the SERVING-INDEX build — the retrieval
sidecar to jobs/corpus_job.py's training corpus:

    documents (doc_id, text) + embeddings (vec_id, embedding)
        -> BM25 postings  (term-bucket-partitioned parquet)
        -> IVF-PQ codes   (cell-partitioned parquet + codebook sidecar)

    spark-submit --py-files hepcrawl_spark.zip jobs/index_job.py \
        --docs s3://bucket/corpus_v1/corpus --emb s3://bucket/embeddings \
        --output s3://bucket/index_v1 --term-buckets 256 \
        --n-cells 1024 --pq-m 16 --pq-ksub 256

Layout choices ARE the scale story:

- BM25 postings are written ``partitionBy(term_bucket)`` (md5-bucketed
  term) so a query's term lookups prune to its buckets — the
  inverted-index access path on plain object storage; ``dl``/``df``
  are denormalized into the row so serving needs zero joins.
- IVF-PQ codes are written ``partitionBy(cell)`` so an nprobe-cell probe
  reads only those directories, and the rows carry 16-byte codes, not
  float vectors. The coarse centroids + codebooks land in a one-row
  parquet sidecar (the model is KBs; readers broadcast it).
- A ``stats.json`` carries N/avgdl/config so a serving session needs no
  corpus pass to start.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="hepcrawl_spark serving-index build")
    p.add_argument("--docs", default=None, help="parquet (doc_id, text)")
    p.add_argument("--emb", default=None, help="parquet (vec_id, embedding)")
    p.add_argument("--output", required=True)
    p.add_argument("--term-buckets", type=int, default=64)
    p.add_argument("--n-cells", type=int, default=64)
    p.add_argument("--pq-m", type=int, default=16)
    p.add_argument("--pq-ksub", type=int, default=64)
    return p.parse_args(argv)


def run(spark, args) -> dict:
    import numpy as np
    import pyspark.sql.functions as F

    audit: dict = {}
    if args.docs:
        from hepcrawl_spark.operators.search import build_bm25_index

        docs = spark.read.parquet(args.docs)
        idx = build_bm25_index(docs)
        postings = idx.postings.withColumn(
            "term_bucket",
            F.pmod(
                F.conv(F.substring(F.md5("term"), 1, 7), 16, 10).cast("bigint"),
                F.lit(args.term_buckets),
            ),
        )
        postings.write.mode("overwrite").partitionBy("term_bucket").parquet(
            f"{args.output}/bm25_postings"
        )
        audit["bm25"] = {
            "n_docs": idx.n_docs,
            "total_len": idx.total_len,
            "avgdl": idx.avgdl,
            "term_buckets": args.term_buckets,
        }
    if args.emb:
        from hepcrawl_spark.operators import pq as PQ

        emb = spark.read.parquet(args.emb)
        C, books, codes = PQ.ivfpq_build(
            emb, n_cells=args.n_cells, m=args.pq_m, ksub=args.pq_ksub
        )
        codes.write.mode("overwrite").partitionBy("cell").parquet(
            f"{args.output}/ivfpq_codes"
        )
        model = spark.createDataFrame(
            [(
                [float(x) for x in C.reshape(-1)],
                list(C.shape),
                [float(x) for x in books.reshape(-1)],
                list(books.shape),
            )],
            "centroids array<double>, c_shape array<int>, "
            "codebooks array<double>, b_shape array<int>",
        )
        model.coalesce(1).write.mode("overwrite").parquet(
            f"{args.output}/ivfpq_model"
        )
        audit["ivfpq"] = {
            "n_cells": args.n_cells,
            "m": args.pq_m,
            "ksub": args.pq_ksub,
            "code_bytes_per_vec": args.pq_m,
        }
    return audit


def load_ivfpq_model(spark, output: str):
    """Read back (centroids, codebooks) from the model sidecar."""
    import numpy as np

    r = spark.read.parquet(f"{output}/ivfpq_model").collect()[0]
    C = np.array(r["centroids"]).reshape(tuple(r["c_shape"]))
    books = np.array(r["codebooks"]).reshape(tuple(r["b_shape"]))
    return C, books


def main(argv=None) -> None:
    from pyspark.sql import SparkSession

    args = parse_args(argv if argv is not None else sys.argv[1:])
    spark = SparkSession.builder.appName("hepcrawl_spark_index").getOrCreate()
    audit = run(spark, args)
    os.makedirs(args.output, exist_ok=True)
    with open(f"{args.output}/stats.json", "w") as fh:
        json.dump(audit, fh, indent=2)
    print(json.dumps(audit))


if __name__ == "__main__":
    main()
