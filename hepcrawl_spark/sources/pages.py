"""Page-corpus sources.

Two corpora:

1. ``pages_from_documents`` + friends — deterministic derivations of the
   crawl tables (pages, frontier, url_seen, robots) from the driver-provided
   ``documents.parquet``. Every derivation here has an exact SQL twin in
   ``__spark_entry__.oracle_sql`` (DuckDB), so the driver's correctness gate
   can check crawl operators end-to-end. Keep these expressions boring on
   purpose: anything used here must be bit-reproducible in ANSI SQL.

2. ``synthesize_corpus`` — a self-contained synthetic web graph (pages with
   embedded outlinks, skewed host distribution) used by the frontier-fixpoint
   crawl loop and the bench. Generated distributively from ``spark.range``:
   no driver-side loops, no external data, fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# 1. Derived crawl tables (oracle-checkable)
# ---------------------------------------------------------------------------

# DuckDB CTE twins — imported by __spark_entry__ so Spark and oracle always
# agree on the derivation.
PAGES_CTE = """
pages AS (
  SELECT 'https://' || source || '.example.org/doc/' || doc_id AS url,
         TIMESTAMP '2024-01-01 00:00:00'
           + (doc_id % 720) * INTERVAL 1 HOUR                  AS warc_ts,
         text, lang, doc_id, source
  FROM documents
)"""

FRONTIER_CTE = """
frontier AS (
  SELECT url,
         source || '.example.org'            AS host,
         (doc_id % 10) / 10.0                AS priority,
         warc_ts                             AS discovered_ts,
         doc_id
  FROM pages
)"""

URL_SEEN_CTE = """
url_seen AS (
  SELECT url,
         warc_ts + CASE WHEN doc_id % 6 = 0
                        THEN INTERVAL 1 HOUR
                        ELSE -(INTERVAL 1 HOUR) END AS last_ts
  FROM pages
  WHERE doc_id % 3 = 0
)"""

ROBOTS_CTE = """
robots AS (
  SELECT DISTINCT source || '.example.org' AS host,
         '/doc/1'                          AS path_prefix,
         'disallow'                        AS allow
  FROM documents
  WHERE length(source) % 2 = 1
)"""


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def pages_from_documents(docs: DataFrame) -> DataFrame:
    """Derive the Common-Crawl-style ``pages`` table (FIXTURES.md §1 shape).

    url host = ``<source>.example.org`` (20 hosts), warc_ts spread over 30
    days hourly, html = utf-8 bytes of text.
    """
    return docs.select(
        F.concat(
            F.lit("https://"), "source", F.lit(".example.org/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(hours=(F.col("doc_id") % 720).cast("int"))
        ).alias("warc_ts"),
        F.encode("text", "UTF-8").alias("html"),
        "text",
        "lang",
        "doc_id",
        "source",
    )


def frontier_from_pages(pages: DataFrame) -> DataFrame:
    return pages.select(
        "url",
        F.concat("source", F.lit(".example.org")).alias("host"),
        ((F.col("doc_id") % 10) / 10.0).alias("priority"),
        F.col("warc_ts").alias("discovered_ts"),
        "doc_id",
    )


def url_seen_from_pages(pages: DataFrame) -> DataFrame:
    """A url_seen store where 1/3 of urls are known; of those, half have a
    *newer* stored timestamp (must stay blocked) and half an older one
    (timestamp-invalidated -> re-crawl), exercising the D1 semantics
    (middlewares.py:134-155: re-crawl iff new_ts > last_ts)."""
    return pages.filter(F.col("doc_id") % 3 == 0).select(
        "url",
        F.when(
            F.col("doc_id") % 6 == 0,
            F.col("warc_ts") + F.make_interval(hours=F.lit(1)),
        )
        .otherwise(F.col("warc_ts") - F.make_interval(hours=F.lit(1)))
        .alias("last_ts"),
    )


def robots_from_documents(docs: DataFrame) -> DataFrame:
    """Disallow path prefix '/doc/1' on hosts whose source name has odd
    length (deterministic, oracle-replicable)."""
    return (
        docs.filter(F.length("source") % 2 == 1)
        .select(
            F.concat("source", F.lit(".example.org")).alias("host"),
            F.lit("/doc/1").alias("path_prefix"),
            F.lit("disallow").alias("allow"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# 2. Synthetic web graph for the crawl fixpoint + bench
# ---------------------------------------------------------------------------

def synthesize_corpus(
    spark: SparkSession,
    n_pages: int = 100_000,
    n_hosts: int = 64,
    links_per_page: int = 4,
    skew_host_share: int = 4,
    partitions: int | None = None,
    body_padding: int = 0,
) -> DataFrame:
    """Deterministic synthetic pages with embedded outlinks.

    - host id: ``page_id % n_hosts`` except that ``1/skew_host_share`` of all
      pages land on host 0 ("arxiv.org" stand-in) — the hot-host skew the
      north rule requires the scheduler to handle.
    - outlinks: k pseudo-random (xxhash-derived, deterministic) page ids
      embedded as ``<a href=...>`` anchors in the html body, so the crawl
      loop's link extraction is a real parse, not a lookup.

    Built entirely from ``spark.range`` column expressions: generation itself
    scales linearly with executors (no driver loop, no Python UDF).
    """
    # n_hosts=1: everything is host 0 — max(1, n_hosts-1) keeps the pmod
    # divisor nonzero (ANSI mode raises DIVIDE_BY_ZERO even on the branch
    # the when() discards); the when below then maps every page to host 0
    cold_hosts = max(1, n_hosts - 1)
    df = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    pid = F.col("id")
    hot = (F.xxhash64(pid, F.lit("hot")) % skew_host_share == 0) | F.lit(
        n_hosts <= 1
    )
    host_id = F.when(hot, F.lit(0)).otherwise(
        F.pmod(F.xxhash64(pid, F.lit("host")), F.lit(cold_hosts)) + 1
    )
    host = F.concat(F.lit("host"), host_id.cast("string"), F.lit(".example.org"))

    link_cols = []
    for i in range(links_per_page):
        tgt = F.pmod(F.xxhash64(pid, F.lit(f"link{i}")), F.lit(n_pages))
        tgt_hot = (F.xxhash64(tgt, F.lit("hot")) % skew_host_share == 0) | F.lit(
            n_hosts <= 1
        )
        tgt_host_id = F.when(tgt_hot, F.lit(0)).otherwise(
            F.pmod(F.xxhash64(tgt, F.lit("host")), F.lit(cold_hosts)) + 1
        )
        link_cols.append(
            F.concat(
                F.lit('<a href="https://host'),
                tgt_host_id.cast("string"),
                F.lit(".example.org/p/"),
                tgt.cast("string"),
                F.lit('">l</a>'),
            )
        )

    pad = (
        [F.repeat(F.concat(F.lit("w"), F.pmod(pid, F.lit(97)).cast("string"), F.lit(" ")), body_padding)]
        if body_padding
        else []
    )
    html = F.concat(
        F.lit("<html><body><h1>page "),
        pid.cast("string"),
        F.lit("</h1>"),
        *link_cols,
        *pad,
        F.lit("</body></html>"),
    )

    return df.select(
        F.concat(F.lit("https://"), host, F.lit("/p/"), pid.cast("string")).alias("url"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(mins=F.pmod(pid, F.lit(43200)).cast("int"))
        ).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        html.alias("text"),
        F.lit("en").alias("lang"),
        host.alias("host"),
        pid.alias("page_id"),
    )
