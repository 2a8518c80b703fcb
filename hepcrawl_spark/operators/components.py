"""Connected components + dedup clustering over candidate-pair graphs.

The LLM-corpus dedup chain ends in PAIRS (MinHash-LSH, SimHash, n-gram
Jaccard — operators/dedup.py); production dedup needs the transitive
closure: group pairs into components and keep ONE canonical document per
component. This module supplies both steps Spark-first.

``connected_components`` is the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) — O(log n) rounds on any graph, each round two shuffles:

- large-star: every node points its LARGER neighbors at its smallest
  neighbor-or-self;
- small-star: every node points its smaller-or-equal neighbors and itself
  at the smallest.

Both are expressed as groupBy(min) + join — never a collect_list, so a
celebrity node (one doc near-duplicated a million times) stays a large
GROUP, not a giant in-memory array; AQE's skew handling applies to the
join. Convergence is detected by an order-insensitive edge-set checksum,
and lineage is truncated per round (mandatory in any DataFrame fixpoint).

At 100 TB: rounds are log(n) ~ 35 for 10^10 nodes in theory, in practice
<10; each round shuffles the current edge set, which large-star
monotonically shrinks toward the star graph. The checksum action per round
is one lightweight agg over the same shuffle output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return edges.unionByName(rev).filter(F.col("src") != F.col("dst")).distinct()


def _large_star(edges: DataFrame, presymmetrized: bool = False) -> DataFrame:
    """(v, m) for every neighbor v > u, where m = min(N(u) ∪ {u}).

    Operates on the SYMMETRIC neighborhood: the previous round's output is
    oriented large->small, so without re-symmetrizing, the v > u view would
    be empty and the fixpoint would silently collapse to singletons.
    ``presymmetrized`` lets the fixpoint loop pass a CACHED symmetric set —
    this function reads it twice (mins aggregate + the v>u join), so the
    caller caching it halves the per-round symmetrize work."""
    sym = edges if presymmetrized else _symmetrize(edges)
    mins = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select("src", F.least("_mn", "src").alias("m"))
    )
    return (
        sym.filter(F.col("dst") > F.col("src"))
        .join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame, preoriented: bool = False) -> DataFrame:
    """Orient edges large->small, then (v, m) for each small neighbor v and
    for u itself, m = min(N−(u) ∪ {u}) = min(dst).

    ``preoriented`` skips the orient+distinct shuffle when the caller
    already guarantees src > dst with no duplicates — true for
    ``_large_star`` output (every edge it emits is (larger neighbor ->
    component min) and it ends in ``.distinct()``), which is the only
    input the fixpoint loop feeds this function."""
    oriented = (
        edges
        if preoriented
        else edges.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        ).distinct()
    )
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    to_small = (
        oriented.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    to_self = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        to_small.unionByName(to_self)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        # shiftright 32 keeps the ANSI-mode sum far from int64 overflow
        # even at 10^9 edges (values ±2^31, sum ±2^61)
        F.coalesce(F.sum(F.shiftright(F.xxhash64("src", "dst"), 32)), F.lit(0)).alias(
            "h"
        ),
    ).collect()[0]
    return row["n"], row["h"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """-> (node, component) for every node appearing in ``edges``, where
    ``component`` is the smallest node id in its component. Node ids are any
    orderable type (long doc ids, string urls)."""
    e = _symmetrize(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = None
    for i in range(max_iterations):
        # round 0's input is the pre-loop symmetrized checkpoint — re-running
        # _symmetrize over it would be a pure no-op shuffle; later rounds get
        # small-star's large->small-oriented output and do need it
        sym = e if i == 0 else _symmetrize(e).persist()
        e = _small_star(
            _large_star(sym, presymmetrized=True), preoriented=True
        ).localCheckpoint(eager=True)
        if i > 0:
            sym.unpersist()
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )
    # converged edge set is a star graph: src -> component root. Roots
    # themselves have no outgoing edge; nodes absent from edges (isolated)
    # were never present. Left join restores every node, root maps to self.
    labels = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    return nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )


def dedup_clusters(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    left_col: str = "id_a",
    right_col: str = "id_b",
    order_col: str | None = None,
) -> DataFrame:
    """Pairs -> components -> canonical pick: returns ``docs`` plus a
    ``component`` column and ``is_canonical`` flag. The survivor per
    component is the minimum ``(order_col, id)`` — deterministic; docs not
    in any pair are their own singleton component and survive.

    This is the last stage of every near-dup chain:
    ``dedup_clusters(minhash_lsh_candidates(...), docs)`` then
    ``.filter("is_canonical")``.
    """
    cc = connected_components(pairs, src=left_col, dst=right_col)
    labeled = docs.join(
        cc.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn("component", F.coalesce("component", F.col(id_col)))
    order = (
        F.struct(F.col(order_col), F.col(id_col))
        if order_col
        else F.struct(F.col(id_col))
    )
    w_min = labeled.groupBy("component").agg(F.min(order).alias("_pick"))
    return (
        labeled.join(w_min, "component")
        .withColumn("is_canonical", order == F.col("_pick"))
        .drop("_pick")
    )
