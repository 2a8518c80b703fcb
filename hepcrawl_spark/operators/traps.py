"""Crawler-trap detection: URL-template explosion.

Calendar pages, session-id links, faceted-search grids and infinite
pagination all look the same from the frontier's side: ONE url *template*
on a host suddenly owns an outsized share of that host's distinct URLs.
The reference relies on its per-source spider scoping to avoid traps; a
generic web crawl needs the detector itself.

Template = path with every digit run collapsed to ``N`` and every long hex
run to ``H`` (session ids / content hashes). Detection is two aggregations:
distinct-url counts per (host, template), then per-host totals computed ON
THE AGGREGATED table (tiny — one row per template, not per url), joined
back. Nothing rescans or reshuffles the url corpus.

Scale shape: one shuffle of (host, template, url-dedup) for the first
aggregate; the second aggregate and the join run on the template table,
which is orders of magnitude smaller than the corpus. Skewed hosts are
fine: countDistinct partial-aggregates map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_template(path_col: Column | str) -> Column:
    """Collapse a URL path to its template: digit runs -> ``N``, hex runs of
    8+ chars -> ``H`` (session ids, content digests). Pure JVM regexps."""
    c = F.col(path_col) if isinstance(path_col, str) else path_col
    # hex FIRST (a digit pass would split hex runs), then digit runs
    return F.regexp_replace(
        F.regexp_replace(c, "[0-9a-fA-F]{8,}", "H"), "[0-9]+", "N"
    )


def detect_traps(
    urls: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    url_col: str = "url",
    min_urls: int = 20,
    min_share_ppm: int = 500_000,
) -> DataFrame:
    """Flag (host, template) groups that look like crawler traps.

    A template is a trap candidate when it owns at least ``min_urls``
    distinct URLs AND at least ``min_share_ppm`` (parts-per-million) of the
    host's distinct URLs. Share is exact integer arithmetic so the verdict
    is bit-stable. Returns one row per (host, template) with counts, share
    and the flag — annotate-then-filter so the frontier can subscribe to
    ``is_trap`` while operators audit the near-misses.
    """
    per_template = (
        urls.select(
            F.col(host_col).alias("host"),
            url_template(path_col).alias("template"),
            F.col(url_col).alias("_url"),
        )
        .groupBy("host", "template")
        .agg(F.countDistinct("_url").alias("n_urls"))
    )
    per_host = per_template.groupBy("host").agg(
        F.sum("n_urls").alias("host_urls")
    )
    out = per_template.join(per_host, "host").select(
        "host",
        "template",
        F.col("n_urls").cast("long").alias("n_urls"),
        F.col("host_urls").cast("long").alias("host_urls"),
        F.expr("n_urls * 1000000 DIV host_urls").alias("share_ppm"),
    )
    return out.withColumn(
        "is_trap",
        (F.col("n_urls") >= min_urls)
        & (F.col("share_ppm") >= min_share_ppm),
    )


def trap_gate(
    frontier: DataFrame,
    traps: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Drop frontier rows whose (host, template) is a flagged trap.

    The trap table is per-template (tiny) — broadcast anti-join; the
    frontier never shuffles. Accepts either the full detector output
    (``is_trap`` filtered here) or an already-flagged (host, template)
    table."""
    if "is_trap" in traps.columns:
        traps = traps.filter("is_trap")
    t = F.broadcast(
        traps.select(
            F.col("host").alias("_t_host"), F.col("template").alias("_t_tpl")
        )
    )
    return frontier.withColumn("_tpl", url_template(path_col)).join(
        t,
        (F.col(host_col) == F.col("_t_host")) & (F.col("_tpl") == F.col("_t_tpl")),
        "left_anti",
    ).drop("_tpl")
