"""robots.txt: raw fetched bodies -> rules table -> RFC 9309 gate.

Completes the P5 chain (reference: Scrapy's ROBOTSTXT_OBEY middleware —
hepcrawl enables per-spider politeness via settings; Scrapy's
RobotsTxtMiddleware fetches and parses per-host robots.txt): the crawl
fetches each host's ``/robots.txt`` like any other page, this module turns
those bodies into the small rules table ``operators/politeness.robots_gate``
broadcasts, and ``robots_gate_rfc`` applies full RFC 9309 precedence
(longest matching prefix wins; Allow beats Disallow on equal length).

Scale shape: robots.txt rows are one-per-HOST (10^7ish), not per-url — the
parse is a narrow mapInPandas over small texts and the resulting rules
table stays broadcastable. The RFC gate joins frontier x broadcast rules,
aggregates per url with map-side partials; no shuffle of the frontier
beyond the per-url groupBy it already needs.

Group semantics per RFC 9309: consecutive ``User-agent`` lines open a
group sharing the following rules; the group applied to a crawler is the
one naming it specifically if present, else ``*``. ``Crawl-delay`` (a
de-facto extension) is captured per group for the politeness scheduler.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

RULES_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("allow", StringType()),  # 'allow' | 'disallow'
        StructField("path_prefix", StringType()),
        StructField("crawl_delay", DoubleType()),
    ]
)


def _parse_one(text: str, agent: str) -> list[tuple[str, str, float | None]]:
    """-> [(allow|disallow, prefix, crawl_delay)] for the applicable group."""
    agent = agent.lower()
    groups: list[dict] = []  # {'agents': set, 'rules': [...], 'delay': ...}
    cur: dict | None = None
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not last_was_agent or cur is None:
                cur = {"agents": set(), "rules": [], "delay": None}
                groups.append(cur)
            cur["agents"].add(value.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if cur is None:
            continue  # rules before any User-agent line: ignored per RFC
        if field in ("allow", "disallow"):
            if value:  # empty Disallow == allow everything == no rule
                cur["rules"].append(("allow" if field == "allow" else "disallow", value))
        elif field == "crawl-delay":
            try:
                cur["delay"] = float(value)
            except ValueError:
                pass
    # specific-agent groups beat '*'; multiple matching groups MERGE
    # (RFC 9309 §2.2.1: rules in groups sharing a user-agent combine)
    matching = [g for g in groups if agent in g["agents"]]
    if not matching:
        matching = [g for g in groups if "*" in g["agents"]]
    if not matching:
        return []
    delays = [g["delay"] for g in matching if g["delay"] is not None]
    delay = max(delays) if delays else None
    out = [(a, p, delay) for g in matching for a, p in g["rules"]]
    if not out and delay is not None:  # delay-only group still yields a row
        out = [("allow", "/", delay)]
    return out


def parse_robots_txt(
    robots_pages: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    agent: str = "*",
) -> DataFrame:
    """(host, robots.txt body) -> rules rows for ``agent``:
    (host, allow, path_prefix, crawl_delay). Feeds both
    ``politeness.robots_gate`` (disallow prefixes) and ``robots_gate_rfc``.
    """

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, text in zip(pdf[host_col], pdf[text_col]):
                if text is None:
                    continue
                for allow, prefix, delay in _parse_one(str(text), agent):
                    rows.append((host, allow, prefix, delay))
            yield pd.DataFrame(
                rows, columns=["host", "allow", "path_prefix", "crawl_delay"]
            )

    return robots_pages.mapInPandas(parse, RULES_SCHEMA)


def robots_gate_rfc(
    frontier: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Full RFC 9309 precedence: among all rules whose prefix matches the
    url's path, the LONGEST wins; Allow beats Disallow at equal length; a
    url matching no rule (or whose host has no rules) is allowed.

    Zero frontier shuffle: the rules collapse to one broadcastable row per
    host carrying an array of (prefix, is_allow) structs; each frontier row
    picks its verdict with ``F.aggregate`` over the matching entries —
    max((len, is_allow)) gives longest-prefix-then-allow precedence without
    fanning the frontier out per rule or grouping it back. (The previous
    join+groupBy formulation also broke on frontiers carrying a map-typed
    ``meta`` column — maps are unorderable grouping keys.)

    RFC 9309 §2.2.3 special characters: ``*`` in a rule path matches any
    character sequence and a trailing ``$`` anchors the end of the path —
    such rules carry a pre-translated regex (``rx``, built ONCE per rule on
    the tiny broadcast side); plain rules keep the cheap ``startswith``.
    Precedence length is the rule's octet length either way (the RFC's
    most-specific-match measure)."""
    path = F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("/"))
    p = F.col("path_prefix")
    is_pat = p.contains("*") | p.endswith("$")
    # regex translation: escape metacharacters, then '*' -> '.*'; a rule-
    # final '$' becomes a real end anchor, everything is start-anchored
    esc = F.regexp_replace(p, r"([.^$*+?(){}\[\]\\|])", r"\\$1")
    wild = F.regexp_replace(esc, r"\\\*", ".*")
    rx = F.when(
        p.endswith("$"),
        F.concat(F.lit("^"), F.regexp_replace(wild, r"\\\$$", ""), F.lit("$")),
    ).otherwise(F.concat(F.lit("^"), wild))
    host_rules = rules.groupBy(F.col("host").alias("_r_host")).agg(
        F.collect_list(
            F.struct(
                p.alias("p"),
                F.when(is_pat, rx).alias("rx"),  # null = plain prefix rule
                (F.col("allow") == "allow").alias("a"),
            )
        ).alias("_rules")
    )
    best = F.aggregate(
        F.filter(
            F.col("_rules"),
            lambda s: F.when(
                s["rx"].isNull(), F.col("_path").startswith(s["p"])
            ).otherwise(F.regexp_like(F.col("_path"), s["rx"])),
        ),
        F.lit(None).cast("struct<l:int,a:boolean>"),
        lambda acc, s: F.when(
            acc.isNull()
            | (F.length(s["p"]) > acc["l"])
            | ((F.length(s["p"]) == acc["l"]) & s["a"]),
            F.struct(F.length(s["p"]).alias("l"), s["a"].alias("a")),
        ).otherwise(acc),
    )
    return (
        frontier.withColumn("_path", path)
        .join(
            F.broadcast(host_rules),
            F.col("host") == F.col("_r_host"),
            "left",
        )
        .withColumn("_best", best)
        .filter(F.col("_best").isNull() | F.col("_best.a"))
        .drop("_path", "_r_host", "_rules", "_best")
    )


def crawl_delays(rules: DataFrame) -> DataFrame:
    """(host, crawl_delay) for hosts that declare one — the politeness
    scheduler's per-host delay override (max over duplicate rows)."""
    return (
        rules.filter(F.col("crawl_delay").isNotNull())
        .groupBy("host")
        .agg(F.max("crawl_delay").alias("crawl_delay"))
    )


def sitemap_urls(
    robots_pages: DataFrame, host_col: str = "host", text_col: str = "text"
) -> DataFrame:
    """``Sitemap:`` directives (RFC 9309 §2.3 allows non-group records;
    sitemaps.org specifies this discovery path) -> (host, url) rows feeding
    ``parsers/sitemap.parse_sitemaps`` on the next fetch wave. Pure column
    expressions — regexp_extract_all over the raw text, no Python, no
    group logic (the directive is group-independent)."""
    return (
        robots_pages.select(
            F.col(host_col).alias("host"),
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(r"(?im)^\s*sitemap:\s*(\S+)\s*$"), 1
                )
            ).alias("url"),
        )
        .distinct()
    )
