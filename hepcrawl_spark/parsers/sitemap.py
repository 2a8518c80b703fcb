"""Sitemap XML -> seed rows (sitemaps.org protocol).

The reference seeds crawls from publisher feeds (OAI links, CONSYN Atom —
parsers/consyn_feed.py); the open-web equivalent every crawler also needs
is the sitemap protocol: ``<urlset>`` leaves carrying page urls with
lastmod/changefreq/priority, and ``<sitemapindex>`` nodes pointing at
child sitemaps. This parser turns fetched sitemap bodies into rows; index
rows feed the next fetch wave (the crawl fixpoint follows them like any
outlink), urlset rows become frontier seeds with their declared priority.

Same family as the other parsers: stdlib ElementTree inside a vectorized
pandas-UDF-style mapInPandas — namespace-agnostic (localname matching, the
consyn_feed.py approach) because real-world sitemaps mix default-namespace
and bare documents. Narrow plan, no shuffle; malformed XML yields an
error row (the S13/desy error-row convention) instead of failing the task.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
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

SITEMAP_SCHEMA = StructType(
    [
        StructField("sitemap_url", StringType()),
        StructField("kind", StringType()),  # 'urlset' | 'sitemapindex' | 'error'
        StructField("loc", StringType()),
        StructField("lastmod", StringType()),
        StructField("changefreq", StringType()),
        StructField("priority", DoubleType()),
        StructField("error", StringType()),
    ]
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _text(el, name: str) -> str | None:
    for child in el:
        if _local(child.tag) == name and child.text is not None:
            return child.text.strip()
    return None


def _parse_one(src_url: str, text: str):
    root = ET.fromstring(text)
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"not a sitemap root: {kind}")
    child_name = "url" if kind == "urlset" else "sitemap"
    for el in root:
        if _local(el.tag) != child_name:
            continue
        loc = _text(el, "loc")
        if not loc:
            continue
        prio = _text(el, "priority")
        yield (
            src_url,
            kind,
            loc,
            _text(el, "lastmod"),
            _text(el, "changefreq"),
            float(prio) if prio is not None else None,
            None,
        )


def parse_sitemaps(
    pages: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """(sitemap url, body) -> one row per <url>/<sitemap> entry; malformed
    bodies produce a single kind='error' row carrying the message."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in SITEMAP_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for src, text in zip(pdf[url_col], pdf[text_col]):
                if text is None:
                    rows.append((src, "error", None, None, None, None, "null body"))
                    continue
                try:
                    rows.extend(_parse_one(src, str(text)))
                except (ET.ParseError, ValueError) as exc:
                    rows.append((src, "error", None, None, None, None, str(exc)))
            yield pd.DataFrame(rows, columns=cols)

    return pages.mapInPandas(parse, SITEMAP_SCHEMA)


def sitemap_seeds(parsed: DataFrame, default_priority: float = 0.5) -> DataFrame:
    """urlset rows -> frontier-shaped seeds (url, host, priority,
    discovered_ts). lastmod feeds discovered_ts (null-safe ISO parse) so
    politeness dispatch order favors recently-changed pages; sitemap
    priority maps straight onto frontier priority."""
    return (
        parsed.filter(F.col("kind") == "urlset")
        .select(
            F.col("loc").alias("url"),
            F.lower(F.parse_url("loc", F.lit("HOST"))).alias("host"),
            F.coalesce(F.col("priority"), F.lit(default_priority)).alias("priority"),
            F.coalesce(
                F.try_to_timestamp(F.col("lastmod")),
                F.try_to_timestamp(F.col("lastmod"), F.lit("yyyy-MM-dd")),
            ).alias("discovered_ts"),
        )
        .filter(F.col("host").isNotNull())
    )


def index_children(parsed: DataFrame) -> DataFrame:
    """sitemapindex rows -> child sitemap urls to fetch next wave."""
    return parsed.filter(F.col("kind") == "sitemapindex").select(
        F.col("loc").alias("url"),
        F.lower(F.parse_url("loc", F.lit("HOST"))).alias("host"),
    )
