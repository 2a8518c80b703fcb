"""S12 — Elsevier CONSYN batch-feed parser.

Reference (reference/hepcrawl/spiders/elsevier_spider.py:115-132,
``_get_package_urls_from_elsevier``): the batch feed is an Atom document;
package names come from ``//entry/title/text()`` and urls from
``//entry/link/@href``, zipped positionally into a name->url dict (so a
duplicate package name keeps the LAST link — reproduced here).

The reference parses with ``Selector(text=...)`` (lxml HTML mode), which
ignores XML namespaces; this parser matches that behavior by comparing
local tag names only, so feeds with or without the Atom default namespace
parse identically.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_batch_feed_body(body: str | bytes) -> list[dict]:
    """One feed -> ordered [{'name', 'url'}] with dict last-wins dedup on
    name (elsevier_spider.py:130-132)."""
    root = ET.fromstring(body)
    names: list[str] = []
    links: list[str] = []
    for el in root.iter():
        if _local(el.tag) != "entry":
            continue
        for child in el:
            t = _local(child.tag)
            if t == "title":
                names.append("".join(child.itertext()).strip())
            elif t == "link":
                links.append(child.get("href") or "")
    index = dict(zip(names, links))  # positional zip + last-wins, as reference
    return [{"name": n, "url": u} for n, u in index.items()]


FEED_ENTRY_SCHEMA = StructType(
    [
        StructField("feed", StringType()),
        StructField("name", StringType()),
        StructField("url", StringType()),
    ]
)


def parse_batch_feed_pages(
    feeds: DataFrame, feed_col: str = "feed", body_col: str = "body"
) -> DataFrame:
    """(feed, body) rows -> exploded (feed, name, url) package rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for feed, body in zip(pdf[feed_col], pdf[body_col]):
                for d in parse_batch_feed_body(body):
                    rows.append((feed, d["name"], d["url"]))
            yield pd.DataFrame(rows, columns=["feed", "name", "url"])

    return feeds.mapInPandas(batches, FEED_ENTRY_SCHEMA)
