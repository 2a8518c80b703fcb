"""Common Crawl CDX index source: capture-index lines -> frontier seeds.

At 10^10-URL scale nobody seeds a frontier by crawling from scratch — the
Common Crawl URL index (CDX/CDXJ) is the standard bootstrap: one line per
capture, keyed by SURT (Sort-friendly URI Reordering Transform) + 14-digit
timestamp, pointing into the WARC store this repo already reads
(`sources/warc.py`). This module completes the CC-native source trio
(WARC bodies S18, sitemaps S19, CDX index S20/S21):

- ``parse_cdxj``: the modern CDXJ line (``<surt> <ts> <json>``) via ONE
  JVM regexp split + ``from_json`` — no Python, fully codegen'd, schema
  errors become error rows (the S13/desy convention).
- ``parse_cdx11``: the classic 11-field space-separated CDX line.
- ``surt_key``: SURT as a pure column expression (lowercase, scheme
  dropped, ``www.`` stripped, host segments reversed comma-joined, sorted
  query params) — the canonical join/sort key for capture dedup.
- ``cdx_latest_captures``: newest capture per urlkey — ONE groupBy(urlkey)
  with a struct-max aggregate (map-side combinable; no window, no sort).
- ``cdx_seeds``: fetchable-capture filter (status/mime) + latest-capture
  dedup -> frontier seed rows matching `crawl/frontier.run_crawl` input.

Scale shape: parsing is narrow (line in, row out); the only shuffle is
the per-urlkey max, which partial-aggregates to one row per key per
partition. The index is naturally sorted by SURT, so a deployment reading
real CDX shards gets near-perfect partition pruning on host prefixes —
`surt_key` keeps that property for derived tables.

Reference context: hepcrawl seeds from publisher feeds (e.g.
`hepcrawl/spiders/arxiv_spider.py` OAI urls); the CDX bootstrap is its
open-web analog, beyond-reference like WARC/sitemap/robots.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# the JSON payload of a CDXJ line (Common Crawl index convention: numbers
# arrive as JSON strings)
CDXJ_JSON_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("mime", StringType()),
        StructField("status", StringType()),
        StructField("digest", StringType()),
        StructField("length", StringType()),
        StructField("offset", StringType()),
        StructField("filename", StringType()),
    ]
)

_CDXJ_RE = r"^(\S+) (\d{14}) (.+)$"


def surt_key(url: Column | str) -> Column:
    """Sort-friendly URI Reordering Transform of a url, as a pure column
    expression: ``org,example)/path?a=1&z=2`` — lowercase, scheme dropped,
    leading ``www.`` stripped, ports dropped (parse_url's HOST excludes
    them), host segments reversed and comma-joined, query params sorted.
    """
    u = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    raw_path = F.parse_url(u, F.lit("PATH"))
    path = F.when(
        raw_path.isNull() | (raw_path == ""), F.lit("/")
    ).otherwise(F.lower(raw_path))
    q = F.parse_url(u, F.lit("QUERY"))
    qsorted = F.when(
        q.isNull() | (q == ""), F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(q, "&")), "&")))
    return F.concat(rev, F.lit(")"), path, qsorted)


def parse_cdxj(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """CDXJ lines -> typed capture rows. One regexp split + from_json —
    all JVM; a malformed line or JSON yields an error row, never a task
    failure."""
    c = F.col(line_col)
    urlkey = F.regexp_extract(c, _CDXJ_RE, 1)
    ts_raw = F.regexp_extract(c, _CDXJ_RE, 2)
    payload = F.regexp_extract(c, _CDXJ_RE, 3)
    j = F.from_json(payload, CDXJ_JSON_SCHEMA)
    return (
        lines.select(
            F.when(urlkey == "", None).otherwise(urlkey).alias("urlkey"),
            F.to_timestamp(
                F.when(ts_raw == "", None).otherwise(ts_raw), "yyyyMMddHHmmss"
            ).alias("ts"),
            j["url"].alias("url"),
            j["mime"].alias("mime"),
            j["status"].cast("int").alias("status"),
            j["digest"].alias("digest"),
            j["length"].cast("long").alias("length"),
            j["offset"].cast("long").alias("offset"),
            j["filename"].alias("warc_filename"),
            c.alias("_line"),
        )
        .withColumn(
            "error",
            F.when(
                F.col("urlkey").isNull() | F.col("url").isNull(),
                F.concat(F.lit("malformed cdxj: "), F.substring("_line", 1, 80)),
            ),
        )
        .drop("_line")
    )


def parse_cdx11(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Classic 11-field CDX line (`urlkey timestamp original mimetype
    statuscode digest redirect metatags length offset filename`)."""
    t = F.split(F.col(line_col), " ")
    ok = F.size(t) == 11

    def fld(i: int) -> Column:
        v = F.element_at(t, i)
        return F.when(ok & (v != "-"), v)

    return lines.select(
        fld(1).alias("urlkey"),
        F.to_timestamp(fld(2), "yyyyMMddHHmmss").alias("ts"),
        fld(3).alias("url"),
        fld(4).alias("mime"),
        fld(5).cast("int").alias("status"),
        fld(6).alias("digest"),
        fld(9).cast("long").alias("length"),
        fld(10).cast("long").alias("offset"),
        fld(11).alias("warc_filename"),
        F.when(
            ~ok, F.concat(F.lit("malformed cdx11: "), F.substring(line_col, 1, 80))
        ).alias("error"),
    )


def cdx_latest_captures(cdx: DataFrame) -> DataFrame:
    """Newest capture per urlkey (url as deterministic tie-break): one
    struct-max groupBy — partial-aggregates map-side, no window/sort."""
    cols = [c for c in cdx.columns if c not in ("urlkey", "ts")]
    packed = F.struct(F.col("ts"), *[F.col(c) for c in cols])
    return (
        cdx.filter(F.col("urlkey").isNotNull() & F.col("ts").isNotNull())
        .groupBy("urlkey")
        .agg(F.max(packed).alias("_top"), F.count("*").alias("n_captures"))
        .select("urlkey", "_top.ts", *[f"_top.{c}" for c in cols], "n_captures")
    )


def cdx_seeds(
    cdx: DataFrame,
    statuses: tuple[int, ...] = (200,),
    mimes: tuple[str, ...] = ("text/html",),
    priority: float = 1.0,
) -> DataFrame:
    """Fetchable captures -> frontier seed rows (url, host, priority,
    discovered_ts) for `crawl/frontier.run_crawl`, deduped to the latest
    capture per urlkey."""
    fetchable = cdx.filter(
        F.col("error").isNull()
        & F.col("status").isin(*statuses)
        & F.col("mime").isin(*mimes)
    )
    latest = cdx_latest_captures(fetchable)
    return latest.select(
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.lit(float(priority)).alias("priority"),
        F.col("ts").alias("discovered_ts"),
        "urlkey",
        "digest",
    )
