"""Per-host politeness scheduling (SURVEY.md §2.3, P1-P6).

The reference gets politeness from its serial event loop plus per-spider
settings (download_delay=10, MAX_CONCURRENT_REQUESTS_PER_DOMAIN=2 —
edp_spider.py:108-109; global CONCURRENT_REQUESTS=16 — settings.py:50-51).
Here the same semantics are a window function over the frontier:

  wave(host) = first `cap` requests per host ordered by
               (priority DESC, discovered_ts, url)   [P1/P2/P4]

where ``cap = floor(wave_budget_s / delay_s)`` — the number of requests a
polite fetcher may issue to one host during one fixpoint wave.

Skew (north rule: the arxiv.org hotspot): a single hot host would put its
whole frontier partition on one task. ``salted_host`` splits hosts into
``salt`` shards; the window then ranks within (host, shard) so both the
shuffle AND the politeness cap distribute. Per-host cap stays exact because
the cap is divided across shards (cap_per_shard = cap / salt, hot hosts get
cap rounded up per shard).

Scale notes: one shuffle on the salted host key; AQE skew-join splitting
covers residual imbalance. No driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_host(host: Column | str, url: Column | str, salt: int) -> Column:
    """``host#k`` with k = pmod(xxhash64(url), salt). salt=1 -> identity."""
    h = F.col(host) if isinstance(host, str) else host
    u = F.col(url) if isinstance(url, str) else url
    if salt <= 1:
        return h
    return F.concat(h, F.lit("#"), F.pmod(F.xxhash64(u), F.lit(salt)).cast("string"))


def detect_hot_hosts(frontier: DataFrame, k_times_median: int = 8) -> DataFrame:
    """Hosts whose pending count exceeds k x median — candidates for salting.

    One cheap aggregation per iteration (groupBy host -> count); the median
    comes from approx percentile, all JVM-side.
    """
    counts = frontier.groupBy("host").agg(F.count("*").alias("n"))
    med = counts.agg(F.percentile_approx("n", 0.5).alias("m"))
    return (
        counts.crossJoin(F.broadcast(med))
        .filter(F.col("n") > F.col("m") * k_times_median)
        .select("host", "n")
    )


def select_wave(
    frontier: DataFrame,
    max_per_host: int,
    salt: int = 1,
    host_col: str = "host",
    order_cols: tuple[str, ...] = ("priority", "discovered_ts", "url"),
) -> DataFrame:
    """P1/P2/P4: per-host politeness wave.

    Ranks within each (possibly salted) host partition by priority DESC then
    FIFO (discovered_ts, url — the reference's yield order, P4), keeps the
    top ``max_per_host``. Returns the frontier columns + ``wave_rank``.
    """
    cap = max(1, max_per_host // salt) if salt > 1 else max_per_host
    part = salted_host(host_col, order_cols[-1], salt)
    w = (
        Window.partitionBy(part)
        .orderBy(F.col(order_cols[0]).desc(), *[F.col(c) for c in order_cols[1:]])
    )
    return (
        frontier.withColumn("wave_rank", F.row_number().over(w))
        .filter(F.col("wave_rank") <= cap)
    )


def crawl_order(
    frontier: DataFrame,
    order_cols: tuple[str, ...] = ("priority", "discovered_ts", "url"),
) -> DataFrame:
    """P4: the deterministic global dispatch order — priority DESC, then
    FIFO by discovery time, then url as the total-order tiebreak. This is
    the formalized Scrapy-scheduler order the north rule's "crawl ordering
    must match" criterion refers to."""
    w = Window.orderBy(
        F.col(order_cols[0]).desc(), *[F.col(c) for c in order_cols[1:]]
    )
    return frontier.withColumn("dispatch_order", F.row_number().over(w))


def robots_gate(frontier: DataFrame, robots: DataFrame, url_col: str = "url") -> DataFrame:
    """P5: drop frontier rows whose url path starts with a disallowed prefix
    for that host. robots is a small rules table -> broadcast; the prefix
    match is a theta-join predicate evaluated on the broadcast side."""
    path = F.parse_url(F.col(url_col), F.lit("PATH"))
    rules = robots.filter(F.col("allow") == "disallow").select(
        F.col("host").alias("_r_host"), F.col("path_prefix").alias("_r_prefix")
    )
    hit = frontier.join(
        F.broadcast(rules),
        (F.col("host") == F.col("_r_host"))
        & path.startswith(F.col("_r_prefix")),
        "left_anti",
    )
    return hit


def decay_priority(
    failed: DataFrame, decay: float = 0.5, priority_col: str = "priority"
) -> DataFrame:
    """P6: failed fetches re-enter the frontier with attempt+1 and decayed
    priority (Scrapy RetryMiddleware role)."""
    return failed.withColumn(priority_col, F.col(priority_col) * decay).withColumn(
        "attempt", F.col("attempt") + 1
    )
