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
    tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: pair only vectors sharing a hyperplane signature in at least one
    of ``tables`` independent hash tables, then exact cosine + top-k within
    the candidates.

    One table misses any neighbor split by a single hyperplane — recall was
    measured at ~0.13 on the synthetic embeddings with tables=1. Standard
    multi-table LSH: P(candidate) = 1-(1-p^bits)^tables, so recall climbs
    fast with tables while candidate volume grows only linearly (corpus
    rows x tables in the exploded signature set). Duplicate cross-table
    pairs collapse via a groupBy on the (query, neighbor) ids — only id
    pairs + the cosine scalar shuffle, never vectors. Recall is reported
    per-bench as ``lsh_recall_at_5`` vs cosine_topk."""
    # table 0 keeps the historical seed so single-table results (and the
    # x5c signature oracle) are unchanged
    def _sig(t: int) -> Column:
        return hyperplane_signature(
            vec_col, dim, bits, seed="lsh" if t == 0 else f"lsh{t}"
        )

    sigs = F.array(
        *[F.struct(F.lit(t).alias("t"), _sig(t).alias("s")) for t in range(tables)]
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.explode(sigs).alias("sig"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(sigs).alias("sig"),
    )
    scored = (
        c.join(F.broadcast(q), "sig")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot("qvec", "cvec") / (_norm("qvec") * _norm("cvec")))
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_centroids(
    corpus: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell mean vector, fully relational: posexplode -> (cell, dim)
    partial-aggregated avg -> re-assembled array. One shuffle of scalar
    (cell, pos, sum) triples; the output is tiny (n_cells rows) and
    broadcastable."""
    return (
        corpus.select(
            F.col(cell_col).alias("cell"), F.posexplode(_dbl(vec_col)).alias("pos", "v")
        )
        .groupBy("cell", "pos")
        .agg(F.avg("v").alias("v"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda x: x["v"]
            ).alias("centroid")
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF probe: search only the query's ``nprobe`` closest coarse cells.

    nprobe=1 keeps the historical own-cell behavior (and the x5b oracle
    semantics: the query's assigned label IS its nearest cell). nprobe>1
    ranks cells by centroid cosine (ivf_centroids — computed relationally,
    broadcast) and probes the top-n, the standard recall/latency dial:
    neighbors just across a cell boundary were the bulk of the tables=1
    misses (~0.13 recall measured)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.col(cell_col).alias("cell"),
    )
    if nprobe <= 1:
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.col(cell_col).alias("cell"),
        )
    else:
        cent = ivf_centroids(corpus, cell_col, vec_col)
        qc = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        ).crossJoin(F.broadcast(cent))
        wq = Window.partitionBy("query_id").orderBy(
            (_dot("qvec", "centroid") / (_norm("qvec") * _norm("centroid"))).desc(),
            F.col("cell"),
        )
        q = (
            qc.withColumn("cell_rank", F.row_number().over(wq))
            .filter(F.col("cell_rank") <= nprobe)
            .select("query_id", "qvec", "cell")
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
