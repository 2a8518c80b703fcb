"""Sitemap protocol parser: urlset, sitemapindex, namespaces, error rows."""

import pyspark.sql.functions as F
import pytest

from hepcrawl_spark.parsers.sitemap import (
    index_children,
    parse_sitemaps,
    sitemap_seeds,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://h.org/a</loc><lastmod>2024-03-01</lastmod>
       <changefreq>daily</changefreq><priority>0.9</priority></url>
  <url><loc>https://h.org/b</loc></url>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://h.org/sitemap1.xml</loc>
           <lastmod>2024-01-02T03:04:05Z</lastmod></sitemap>
  <sitemap><loc>https://h.org/sitemap2.xml</loc></sitemap>
</sitemapindex>"""


@pytest.fixture()
def parsed(spark):
    pages = spark.createDataFrame(
        [
            ("https://h.org/sitemap.xml", URLSET),
            ("https://h.org/sitemap_index.xml", INDEX),
            ("https://h.org/broken.xml", "<html>not a sitemap</html>"),
            ("https://h.org/null.xml", None),
        ],
        "url string, text string",
    )
    return parse_sitemaps(pages)


def test_urlset_and_index_rows(spark, parsed):
    rows = parsed.collect()
    by_loc = {r["loc"]: r for r in rows if r["loc"]}
    a = by_loc["https://h.org/a"]
    assert (a["kind"], a["lastmod"], a["changefreq"], a["priority"]) == (
        "urlset", "2024-03-01", "daily", 0.9,
    )
    assert by_loc["https://h.org/b"]["priority"] is None
    assert by_loc["https://h.org/sitemap1.xml"]["kind"] == "sitemapindex"
    errors = [r for r in rows if r["kind"] == "error"]
    assert {r["sitemap_url"] for r in errors} == {
        "https://h.org/broken.xml", "https://h.org/null.xml",
    }


def test_seeds_shape_feeds_run_crawl_schema(spark, parsed):
    seeds = sitemap_seeds(parsed).collect()
    assert {r["url"] for r in seeds} == {"https://h.org/a", "https://h.org/b"}
    a = next(r for r in seeds if r["url"].endswith("/a"))
    assert a["host"] == "h.org" and a["priority"] == 0.9
    assert a["discovered_ts"] is not None  # date-only lastmod parses
    b = next(r for r in seeds if r["url"].endswith("/b"))
    assert b["priority"] == 0.5 and b["discovered_ts"] is None


def test_index_children_next_wave(spark, parsed):
    kids = {r["url"] for r in index_children(parsed).collect()}
    assert kids == {"https://h.org/sitemap1.xml", "https://h.org/sitemap2.xml"}


def test_no_shuffle_in_parse(spark, parsed):
    from hepcrawl_spark.plans import exchange_count

    assert exchange_count(parsed) == 0
