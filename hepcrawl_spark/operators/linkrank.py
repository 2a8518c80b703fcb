"""Link-authority ranking for frontier prioritization (PageRank).

The reference crawls publisher feeds where priority is editorial (seed
order, FIFO — wsp_spider yield order); an open-web frontier at 10^10 urls
needs link-structure priority so high-authority hosts surface first (the
OPIC/PageRank role in production crawlers). This module computes damped
PageRank relationally, to feed ``frontier.priority``:

    ranks = pagerank(extract_outlinks(...))      # (node, rank)
    frontier.join(ranks, url==node, 'left')      # priority = rank

Pure DataFrame fixpoint: per iteration one join + one aggregation
(map-side combinable sum), dangling mass folded in analytically, lineage
truncated per round. No collect of ranks — the only driver values are the
two scalars (dangling mass, L1 delta). At 10^10 edges each iteration is
one shuffle of (dst, contribution) pairs; AQE handles the hub skew the
same way it handles the hot-host fetch join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    src: str = "src",
    dst: str = "dst",
    tol: float | None = None,
) -> DataFrame:
    """-> (node, rank), sum(rank) == 1. Fixed ``iterations`` by default
    (deterministic, oracle-friendly); pass ``tol`` to stop early when the
    L1 delta drops below it."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # edges annotated once with the source out-degree; reused every round
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling nodes (no out-edges) spread their rank uniformly
        dangling = (
            ranks.join(deg.select(F.col("src").alias("node")), "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        if tol is not None:
            delta = (
                new_ranks.join(ranks.withColumnRenamed("rank", "prev"), "node")
                .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))))
                .collect()[0][0]
            )
            ranks = new_ranks
            if delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks


def rank_seeds(
    seeds: DataFrame, ranks: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Overwrite seed priority with link rank (unranked urls keep their
    existing priority). Broadcast if ranks is small; at full scale this is
    an equi-join both sides bucketed by url."""
    r = ranks.select(F.col("node").alias(url_col), F.col("rank").alias("_rank"))
    return (
        seeds.join(r, url_col, "left")
        .withColumn("priority", F.coalesce(F.col("_rank"), F.col("priority")))
        .drop("_rank")
    )


def hits(
    edges: DataFrame,
    iterations: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) — the directional
    complement to :func:`pagerank` for crawl scheduling: a high-authority
    url is worth fetching, a high-hub url is worth re-parsing for
    outlinks.

    Per iteration: authority(v) = Σ hub(u) over u→v, L1-normalized;
    then hub(u) = Σ authority(v) over u→v, L1-normalized (L1 keeps the
    arithmetic a plain sum — same convergence, oracle-friendlier than an
    L2 sqrt). Fixed iteration count, deterministic. Returns
    (node, hub, authority), each column summing to 1.

    Scale shape: the deduped edge set is checkpointed once and reused;
    each half-step is one join + one groupBy shuffle on the edge key it
    aggregates — identical plan family to pagerank.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    ed = e.localCheckpoint(eager=True)
    hub = nodes.select("node", F.lit(1.0 / n).alias("v"))
    auth = None
    for _ in range(iterations):
        # checkpoint each RAW aggregate (the shuffle output) exactly once:
        # the scalar total, the normalized view, and the next half-step all
        # read the materialized rows instead of re-running the join+groupBy
        # (also truncates lineage, like pagerank)
        a_raw = (
            ed.join(hub, ed["src"] == hub["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("v").alias("raw"))
            .localCheckpoint(eager=True)
        )
        a_tot = a_raw.agg(F.sum("raw")).collect()[0][0] or 1.0
        auth = nodes.join(a_raw, "node", "left").select(
            "node", (F.coalesce(F.col("raw"), F.lit(0.0)) / a_tot).alias("v")
        )
        h_raw = (
            ed.join(auth, ed["dst"] == auth["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("v").alias("raw"))
            .localCheckpoint(eager=True)
        )
        h_tot = h_raw.agg(F.sum("raw")).collect()[0][0] or 1.0
        hub = nodes.join(h_raw, "node", "left").select(
            "node", (F.coalesce(F.col("raw"), F.lit(0.0)) / h_tot).alias("v")
        )
    return (
        nodes.join(hub.select("node", F.col("v").alias("hub")), "node")
        .join(auth.select("node", F.col("v").alias("authority")), "node")
    )
