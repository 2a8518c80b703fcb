"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products via zip_with/aggregate (JVM higher-order functions, no UDF);
  top-k via window row_number per query.
- ``lsh_topk``: the scale path — random-hyperplane LSH bucketing; only
  vectors sharing a bucket pair up, turning O(N*Q) into O(N*Q/2^bits)
  expected. Hyperplane weights derive deterministically from md5 hashes so
  results (and the DuckDB oracle) are reproducible without RNG state.
- ``ivf_topk``: IVF-style variant — coarse quantizer = an existing integer
  bucket column (at scale: k-means centroid ids); probes only the query's
  cell.

At 100 TB the embedding table is bucketed by the coarse id; the probe join
is then storage-partitioned (no shuffle of the big side), and the query set
is broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dbl(c: str | Column) -> Column:
    """Cast array<float> -> array<double> so accumulation is double-precision
    (and bitwise-reproducible in the DuckDB oracle)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: str | Column, b: str | Column) -> Column:
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(c: str | Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(_dbl(c), lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    The (small) query side is broadcast; the corpus streams through one
    codegen'd stage — no shuffle of the corpus. Output:
    (query_id, neighbor_id, cosine, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot("qvec", "cvec") / (_norm("qvec") * _norm("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_signature(
    vec_col: str | Column, dim: int, bits: int = 8, seed: str = "lsh"
) -> Column:
    """Random-hyperplane sign signature as an int column.

    Hyperplane h_b weight on dimension d = ±1 chosen by a portable hash of
    (seed, b, d) — deterministic, no RNG, reproducible in SQL."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    sig = F.lit(0)
    for b in range(bits):
        # dot(vec, hyperplane_b) where weight = +1 if md5-hash bit even else -1
        terms = F.aggregate(
            F.zip_with(
                c,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, d: x
                * F.when(
                    F.conv(
                        F.substring(F.md5(F.concat_ws("_", F.lit(seed), F.lit(b), d)), 1, 8),
                        16,
                        10,
                    ).cast("long")
                    % 2
                    == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(terms > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: pair only vectors whose hyperplane signatures match, then exact
    cosine + top-k within the candidates. Recall < 1 by construction; the
    bench compares its agreement vs cosine_topk."""
    sig = hyperplane_signature(vec_col, dim, bits)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"), sig.alias("sig")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), sig.alias("sig")
    )
    scored = (
        c.join(F.broadcast(q), "sig")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot("qvec", "cvec") / (_norm("qvec") * _norm("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: restrict the search to the query's coarse cell."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.col(cell_col).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col(cell_col).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot("qvec", "cvec") / (_norm("qvec") * _norm("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
