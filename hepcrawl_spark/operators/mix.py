"""Temperature-based domain mixing: allocate a fixed sample budget across
domains with sub-linear (temperature) weighting, then fill each domain's
quota deterministically.

The standard multi-corpus training-mix recipe (the Pile, XLM-R, mT5 all
sample domain d with probability proportional to ``n_d^tau`` for a
temperature ``tau`` in (0, 1]): ``tau = 1`` reproduces the natural
distribution, smaller ``tau`` up-weights small domains so a handful of
mega-crawl hosts cannot drown out curated sources.

Pipeline shape (Spark-first):

1. Domain sizes: ONE ``groupBy(domain).count()`` — map-side partial
   aggregation reduces the shuffle to O(partitions x domains) rows.
2. Budget allocation runs DRIVER-SIDE over the collected (domain, count)
   list — O(#domains) scalars, the model not the data (same rule as the
   DSIR log-ratio and the adaptive-salt hot-host set: tiny aggregates
   become literal broadcasts, never re-executed subplans).
3. Quota fill is one shuffle on the domain key: ``row_number`` per domain
   ordered by the deterministic md5 sampling hash, keep rank <= budget.
   A doc's fate is a pure function of (id, seed, budgets) — stable across
   runs, retries, and partitionings.

Integer-exact allocation (largest-remainder / Hamilton method) so a DuckDB
oracle reproduces budgets bit-identically: weights are quantized to
``floor(n_d^tau * 1000)`` (for ``tau = 0.5`` this is ``floor(sqrt(n) *
1000)`` — IEEE sqrt is correctly rounded, so every engine computes the
same integer), quotas use integer division ``(k * w_d) DIV W``, and the
``k - sum(base)`` leftover seats go to the largest integer remainders
(ties broken by domain name). For other ``tau`` values ``pow`` is not
guaranteed correctly rounded across engines; the allocation is still
deterministic for a fixed engine, but cross-engine bit-parity is only
promised at ``tau = 0.5``.

Reference context: hepcrawl has no mixing stage (each spider's output is
kept wholesale); this joins operators/scrub.py's ``sample_by_source``
(fixed per-source rates) and ``cap_per_key`` (hard per-host cap) as the
third mixing primitive — rate-free, budget-first.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .scrub import sample_hash


def temperature_budgets(
    counts: dict[str, int], total_k: int, tau: float = 0.5
) -> dict[str, int]:
    """Largest-remainder allocation of ``total_k`` seats over domains with
    weight ``floor(count^tau * 1000)``. Pure integer arithmetic after the
    quantization step; ties go to the lexicographically smaller domain.

    A domain's budget may exceed its count (tiny domains under strong
    flattening); the quota fill below simply keeps every doc it has — the
    shortfall is reported by ``temperature_mix``'s ``budget`` column so
    callers can re-run with redistributed seats if exact totals matter.
    """
    if total_k < 0:
        raise ValueError("total_k must be >= 0")
    w = {
        d: math.floor(math.pow(n, tau) * 1000)
        for d, n in counts.items()
        if n > 0
    }
    big_w = sum(w.values())
    if big_w == 0 or total_k == 0:
        return {d: 0 for d in counts}
    base = {d: (total_k * wd) // big_w for d, wd in w.items()}
    rem = {d: (total_k * wd) % big_w for d, wd in w.items()}
    leftover = total_k - sum(base.values())
    for d in sorted(rem, key=lambda d: (-rem[d], d))[:leftover]:
        base[d] += 1
    return {d: base.get(d, 0) for d in counts}


def temperature_mix(
    docs: DataFrame,
    total_k: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "tmix",
    tau: float = 0.5,
) -> DataFrame:
    """Keep ~``total_k`` docs: per-domain budgets via ``n^tau`` largest-
    remainder allocation, filled by the deterministic md5 hash order.

    Output keeps the input columns plus ``budget`` (the domain's seat
    count) and ``domain_rank`` (this doc's position in its domain's hash
    order) for auditability. One count shuffle + one quota-fill shuffle,
    both on the domain key; the budget table is a literal broadcast.
    """
    # NULL domains (unparseable hosts) carry no meaningful mixing key —
    # exclude them up front rather than crash the sort or silently drop
    # them at the join
    docs = docs.filter(F.col(domain_col).isNotNull())
    counts = {
        r[0]: r[1]
        for r in docs.groupBy(domain_col).count().collect()
    }
    budgets = temperature_budgets(counts, total_k, tau)
    spark = docs.sparkSession
    bdf = spark.createDataFrame(
        [(d, int(b)) for d, b in sorted(budgets.items())],
        f"{domain_col} string, budget bigint",
    )
    w = Window.partitionBy(domain_col).orderBy(
        sample_hash(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        docs.join(F.broadcast(bdf), domain_col)
        .withColumn("domain_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("domain_rank") <= F.col("budget"))
    )
