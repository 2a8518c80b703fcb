"""Anchor-text aggregation: what the web says ABOUT each page.

Inbound anchor text is the classic external description of a page (search
ranking, query-independent relevance, and LLM-corpus augmentation all use
it); at crawl scale it is a pure relational rollup over the link graph the
frontier already extracts. This module keeps the whole pass JVM-side:

- ``extract_anchors``: one page row -> N (src, target, anchor_text) rows
  via TWO ``regexp_extract_all`` calls over the same pattern (group 1 =
  href, group 2 = inner text) zipped positionally — Spark's
  ``regexp_extract_all`` returns one capture group per call, and both
  calls walk the identical match sequence, so ``arrays_zip`` realigns
  them without any Python. Inner markup is stripped and whitespace
  collapsed with ``transform`` lambdas (whole-stage codegen).
- ``anchor_text_table``: per-target rollup — total inbound anchors,
  distinct source hosts, and the dominant anchor text (max count, ties
  to the lexicographically smallest) via a ``min(struct(-cnt, text))``
  aggregate, never a ``collect_list``.

Scale shape (the 100-TB story): the explode is narrow; the rollup is two
key-partitioned aggregations (``(target, text)`` counts, then per-target
struct-min + a distinct-host count) — all map-side partial-aggregable.
The adversarial case is anchor spam: one host stamping millions of
identical links onto one target. ``per_host_unique=True`` (default)
dedupes ``(src_host, target, text)`` FIRST, so a single host contributes
each distinct phrase once — the same df-cap philosophy as
``dedup.ngram_jaccard_capped`` — bounding any host's vote at O(its
vocabulary), not O(its page count). Popular targets still aggregate to
ONE row per (target, text) per partition before the shuffle.

Reference context: hepcrawl's spiders follow links but discard anchor
text (e.g. ``hepcrawl/spiders/pos_spider.py`` link loops); the rollup is
beyond-reference, like PageRank in ``operators/linkrank.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# group 1 = attrs before href, group 2 = href, group 3 = attrs after
# href, group 4 = inner html — all four regexp_extract_all passes walk the
# SAME match sequence, so the arrays zip positionally
_ANCHOR_RE = r'(?is)<a\s([^>]*?)href="([^"]+)"([^>]*)>(.*?)</a>'

# rel="nofollow" (also rel='ugc nofollow' etc.) anywhere in the tag attrs
_NOFOLLOW_RE = r'(?i)rel\s*=\s*["\']?[^"\'>]*nofollow'


def _clean(texts: Column) -> Column:
    """Strip inner markup, collapse whitespace, trim — per array element,
    all codegen'd."""
    return F.transform(
        texts,
        lambda t: F.trim(
            F.regexp_replace(
                F.regexp_replace(t, r"<[^>]+>", " "), r"\s+", " "
            )
        ),
    )


def extract_anchors(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Pages -> (src_url, src_host, target_url, anchor_text) rows.

    Two regexp passes over the same pattern keep href and inner text
    positionally aligned; empty anchor texts (image links, spacer
    anchors) survive as '' so callers can filter or keep them.
    """
    html = F.col(html_col).cast("string")
    hrefs = F.regexp_extract_all(html, F.lit(_ANCHOR_RE), 2)
    texts = _clean(F.regexp_extract_all(html, F.lit(_ANCHOR_RE), 4))
    pre = F.regexp_extract_all(html, F.lit(_ANCHOR_RE), 1)
    post = F.regexp_extract_all(html, F.lit(_ANCHOR_RE), 3)
    return (
        pages.select(
            F.col(url_col).alias("src_url"),
            F.lower(F.parse_url(F.col(url_col), F.lit("HOST"))).alias("src_host"),
            F.explode(
                F.arrays_zip(
                    hrefs.alias("t"),
                    texts.alias("a"),
                    pre.alias("p1"),
                    post.alias("p2"),
                )
            ).alias("z"),
        )
        .select(
            "src_url",
            "src_host",
            F.col("z.t").alias("target_url"),
            F.col("z.a").alias("anchor_text"),
            F.concat(F.col("z.p1"), F.col("z.p2"))
            .rlike(_NOFOLLOW_RE)
            .alias("nofollow"),
        )
        .filter(F.col("target_url").isNotNull() & (F.col("target_url") != ""))
    )


def anchor_text_table(
    anchors: DataFrame,
    per_host_unique: bool = True,
    min_anchors: int = 1,
) -> DataFrame:
    """Per-target anchor rollup: (target_url, n_anchors, n_hosts,
    top_anchor).

    ``per_host_unique`` counts each (src_host, anchor_text) pair once per
    target — the anchor-spam guard; with it off, raw link multiplicity
    counts. ``n_hosts`` is an exact distinct count (swap in
    ``approx_count_distinct`` for trillion-edge graphs where 2 % error is
    acceptable — the rest of the plan is unchanged).
    """
    base = anchors.select("src_host", "target_url", "anchor_text")
    if per_host_unique:
        base = base.distinct()
    counts = base.groupBy("target_url", "anchor_text").agg(
        F.count("*").alias("cnt")
    )
    top = counts.groupBy("target_url").agg(
        F.sum("cnt").alias("n_anchors"),
        F.min(
            F.struct((-F.col("cnt")).alias("neg"), F.col("anchor_text").alias("t"))
        )["t"].alias("top_anchor"),
    )
    hosts = anchors.groupBy("target_url").agg(
        F.countDistinct("src_host").alias("n_hosts")
    )
    out = top.join(hosts, "target_url").select(
        "target_url",
        F.col("n_anchors").cast("long").alias("n_anchors"),
        F.col("n_hosts").cast("long").alias("n_hosts"),
        "top_anchor",
    )
    if min_anchors > 1:
        out = out.filter(F.col("n_anchors") >= min_anchors)
    return out
