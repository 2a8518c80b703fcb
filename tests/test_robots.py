"""robots.txt parse + RFC 9309 gate."""

import pyspark.sql.functions as F
import pytest

from hepcrawl_spark.crawl.robots import (
    _parse_one,
    crawl_delays,
    parse_robots_txt,
    robots_gate_rfc,
)

SIMPLE = """
# comment
User-agent: *
Disallow: /private/
Allow: /private/pub/
Crawl-delay: 2.5
"""

MULTI = """
User-agent: googlebot
Disallow: /nogoogle/

User-agent: hepbot
User-agent: otherbot
Disallow: /nohep/
Crawl-delay: 7

User-agent: *
Disallow: /all/
"""

MERGED = """
User-agent: hepbot
Disallow: /a/

User-agent: hepbot
Disallow: /b/
"""


def test_parse_one_groups_and_precedence():
    assert _parse_one(SIMPLE, "anybot") == [
        ("disallow", "/private/", 2.5),
        ("allow", "/private/pub/", 2.5),
    ]
    # specific group beats '*'; consecutive user-agent lines share a group
    assert _parse_one(MULTI, "hepbot") == [("disallow", "/nohep/", 7.0)]
    assert _parse_one(MULTI, "otherbot") == [("disallow", "/nohep/", 7.0)]
    assert _parse_one(MULTI, "unknown") == [("disallow", "/all/", None)]
    # multiple groups naming the same agent merge (RFC 9309 2.2.1)
    assert _parse_one(MERGED, "hepbot") == [
        ("disallow", "/a/", None),
        ("disallow", "/b/", None),
    ]
    # empty Disallow = no rule; rules before any User-agent ignored
    assert _parse_one("Disallow: /x/\nUser-agent: *\nDisallow:\n", "a") == []


def test_parse_to_rules_table_and_delays(spark):
    pages = spark.createDataFrame(
        [("h1.org", SIMPLE), ("h2.org", MULTI), ("h3.org", None)],
        "host string, text string",
    )
    rules = parse_robots_txt(pages, agent="hepbot")
    got = {(r["host"], r["allow"], r["path_prefix"], r["crawl_delay"])
           for r in rules.collect()}
    assert got == {
        ("h1.org", "disallow", "/private/", 2.5),
        ("h1.org", "allow", "/private/pub/", 2.5),
        ("h2.org", "disallow", "/nohep/", 7.0),
    }
    delays = {r["host"]: r["crawl_delay"] for r in crawl_delays(rules).collect()}
    assert delays == {"h1.org": 2.5, "h2.org": 7.0}


def test_rfc_gate_longest_match_allow_override(spark):
    rules = parse_robots_txt(
        spark.createDataFrame([("h.org", SIMPLE)], "host string, text string")
    )
    frontier = spark.createDataFrame(
        [
            ("https://h.org/private/secret", "h.org"),    # disallowed
            ("https://h.org/private/pub/x", "h.org"),     # longer Allow wins
            ("https://h.org/open", "h.org"),              # no matching rule
            ("https://other.org/private/x", "other.org"), # host has no rules
        ],
        "url string, host string",
    )
    kept = {r["url"] for r in robots_gate_rfc(frontier, rules).collect()}
    assert kept == {
        "https://h.org/private/pub/x",
        "https://h.org/open",
        "https://other.org/private/x",
    }


def test_rfc_gate_equal_length_allow_beats_disallow(spark):
    rules = spark.createDataFrame(
        [("h.org", "allow", "/p/", 0.0), ("h.org", "disallow", "/p/", 0.0)],
        "host string, allow string, path_prefix string, crawl_delay double",
    )
    frontier = spark.createDataFrame(
        [("https://h.org/p/x", "h.org")], "url string, host string"
    )
    assert robots_gate_rfc(frontier, rules).count() == 1


def test_rfc_gate_map_meta_column(spark):
    """run_crawl frontiers carry a map<string,string> meta column; the gate
    must not group by it (maps are unorderable grouping keys — the old
    join+groupBy formulation raised AnalysisException). Columns and row
    multiplicity must survive untouched."""
    rules = parse_robots_txt(
        spark.createDataFrame([("h.org", SIMPLE)], "host string, text string")
    )
    frontier = spark.createDataFrame(
        [
            ("https://h.org/private/secret", "h.org", {"hop": "1"}),
            ("https://h.org/open", "h.org", {"hop": "2"}),
            ("https://h.org/open", "h.org", {"hop": "3"}),  # dup url kept
        ],
        "url string, host string, meta map<string,string>",
    )
    out = robots_gate_rfc(frontier, rules)
    assert out.columns == ["url", "host", "meta"]
    rows = sorted(
        (r["url"], r["meta"]["hop"]) for r in out.collect()
    )
    assert rows == [
        ("https://h.org/open", "2"),
        ("https://h.org/open", "3"),
    ]


def test_parsed_rules_feed_legacy_gate(spark):
    """The parsed table plugs straight into politeness.robots_gate
    (disallow prefixes only — the pre-RFC fast path)."""
    from hepcrawl_spark.operators.politeness import robots_gate

    rules = parse_robots_txt(
        spark.createDataFrame([("h.org", SIMPLE)], "host string, text string")
    )
    frontier = spark.createDataFrame(
        [("https://h.org/private/x", "h.org"), ("https://h.org/ok", "h.org")],
        "url string, host string",
    )
    kept = {r["url"] for r in robots_gate(frontier, rules).collect()}
    assert kept == {"https://h.org/ok"}


def test_sitemap_directive_discovery(spark):
    from hepcrawl_spark.crawl.robots import sitemap_urls

    text = (
        "User-agent: *\nDisallow: /x/\n"
        "Sitemap: https://h.org/sitemap.xml\n"
        "sitemap:   https://h.org/sitemap2.xml\n"
        "# Sitemap: https://h.org/commented.xml is still extracted? no:\n"
        "NotASitemap: https://h.org/no.xml\n"
    )
    pages = spark.createDataFrame(
        [("h.org", text), ("empty.org", "User-agent: *\n")],
        "host string, text string",
    )
    got = {(r["host"], r["url"]) for r in sitemap_urls(pages).collect()}
    assert got == {
        ("h.org", "https://h.org/sitemap.xml"),
        ("h.org", "https://h.org/sitemap2.xml"),
    }


def test_rfc_gate_wildcard_and_anchor(spark):
    """RFC 9309 §2.2.3: '*' matches any sequence, trailing '$' anchors the
    path end; plain prefixes keep prefix semantics; longest rule (octet
    length) still wins across pattern and plain rules."""
    rules = spark.createDataFrame(
        [("h.org", "disallow", "/private*", None),
         ("h.org", "disallow", "/*.pdf$", None),
         ("h.org", "allow", "/private-ok/", None)],
        "host string, allow string, path_prefix string, crawl_delay double",
    )
    frontier = spark.createDataFrame(
        [("https://h.org/private/x", "h.org"),     # matches /private*
         ("https://h.org/private-ok/y", "h.org"),  # longer Allow wins
         ("https://h.org/doc.pdf", "h.org"),       # $-anchored match
         ("https://h.org/doc.pdfx", "h.org"),      # anchor rejects
         ("https://h.org/a/b/file.pdf", "h.org"),  # '*' spans segments
         ("https://h.org/open", "h.org")],
        "url string, host string",
    )
    kept = {r["url"] for r in robots_gate_rfc(frontier, rules).collect()}
    assert kept == {
        "https://h.org/private-ok/y",
        "https://h.org/doc.pdfx",
        "https://h.org/open",
    }
