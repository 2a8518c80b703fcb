"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is a thin wrapper over the hepcrawl_spark library
(SURVEY.md §2 operator ids in the names); each ``oracle_sql()`` twin is ANSI
SQL DuckDB runs over the same parquet views. Crawl tables (pages / frontier /
url_seen / robots) are derived deterministically from ``documents`` by
hepcrawl_spark.sources.pages, with the exact same derivation inlined as CTEs
in the oracle SQL — so the gate checks real operator semantics, not table
plumbing.

Conventions that keep the value-hash compare stable:
- every oracle-checked output column is a scalar (no arrays/maps/structs)
- timestamps are formatted to strings; floats are rounded explicitly
- hashes are md5-derived (bit-identical in both engines)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hepcrawl_spark.functions import text as T
from hepcrawl_spark.functions.urls import basename_of, canonicalize_url, host_of, path_of
from hepcrawl_spark.operators import dedup as D
from hepcrawl_spark.operators import politeness as P
from hepcrawl_spark.operators import similarity as S
from hepcrawl_spark.operators import textstats as X
from hepcrawl_spark.parsers.arxiv import parse_arxiv_pages
from hepcrawl_spark.sources import pages as SRC

# ---------------------------------------------------------------------------
# shared derivations
# ---------------------------------------------------------------------------

_CTE_PREFIX = (
    "WITH "
    + ",".join(
        [SRC.PAGES_CTE, SRC.FRONTIER_CTE, SRC.URL_SEEN_CTE, SRC.ROBOTS_CTE]
    )
)

_NORM_SQL = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/documents.parquet")


def _pages(spark: SparkSession, sf: str) -> DataFrame:
    return SRC.pages_from_documents(_docs(spark, sf))


def _frontier(spark: SparkSession, sf: str) -> DataFrame:
    return SRC.frontier_from_pages(_pages(spark, sf))


def _seen(spark: SparkSession, sf: str) -> DataFrame:
    return SRC.url_seen_from_pages(_pages(spark, sf))


def _emb(spark: SparkSession, sf: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def _events(spark: SparkSession, sf: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/events.parquet")


# ---------------------------------------------------------------------------
# entry: flagship — one politeness-scheduled, dedup-gated fetch wave
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship slice of the crawl pipeline at sf0.001: politeness wave ->
    crawl-once gate -> fetch join -> per-host counters."""
    sf = "/root/testdata/sf0.001"
    pages = _pages(spark, sf)
    frontier = _frontier(spark, sf)
    seen = _seen(spark, sf)
    wave = P.select_wave(frontier, max_per_host=10, salt=1).drop("wave_rank")
    gated = D.crawl_once_gate(
        wave.withColumn("warc_ts", F.col("discovered_ts")), seen
    ).drop("warc_ts")
    fetched = gated.join(pages.select("url", "text"), "url")
    return (
        fetched.groupBy("host")
        .agg(F.count("*").alias("fetched"), F.sum(F.length("text")).alias("bytes"))
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# queries + oracles (kept adjacent per query for reviewability)
# ---------------------------------------------------------------------------

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

# per-(session, sf) memo for the two stateful gate queries (d1d's post-delete
# resident filter, d1e's merged-table dir): state setup runs once; repeat
# constructions return pure, plan-auditable DataFrames over that state
_STATE_CACHE: dict = {}
_ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def reg(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn
    return reg


# -- C1: URL canonicalization (pandas UDF) vs known canonical form ----------
@_q(
    "c1_canonicalize",
    f"""{_CTE_PREFIX}
    SELECT doc_id,
           'https://' || lower(source) || '.example.org/doc/' || doc_id
             || '?a=1&b=2' AS url_canon
    FROM documents ORDER BY doc_id""",
)
def c1_canonicalize(spark, sf):
    messy = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://"), F.upper("source"), F.lit(".Example.ORG:443/doc/"),
            F.col("doc_id").cast("string"), F.lit("?b=2&a=1#frag"),
        ).alias("url"),
    )
    return messy.select(
        "doc_id", canonicalize_url("url").alias("url_canon")
    ).orderBy("doc_id")


# -- C2/C22: host + path + basename (JVM parse_url) --------------------------
@_q(
    "c2_host_basename",
    f"""{_CTE_PREFIX}
    SELECT doc_id,
           source || '.example.org'    AS host,
           '/doc/' || doc_id           AS path,
           cast(doc_id AS varchar)     AS basename
    FROM pages ORDER BY doc_id""",
)
def c2_host_basename(spark, sf):
    return _pages(spark, sf).select(
        "doc_id",
        host_of("url").alias("host"),
        path_of("url").alias("path"),
        basename_of("url").alias("basename"),
    ).orderBy("doc_id")


# -- D1: crawl-once gate (exact anti-join path) ------------------------------
_D1_ORACLE = f"""{_CTE_PREFIX}
    SELECT f.url, f.doc_id
    FROM frontier f
    LEFT JOIN url_seen s ON f.url = s.url
    WHERE s.url IS NULL OR f.discovered_ts > s.last_ts
    ORDER BY f.doc_id"""


@_q("d1_crawl_once_gate", _D1_ORACLE)
def d1_crawl_once_gate(spark, sf):
    fr = _frontier(spark, sf)
    gated = D.crawl_once_gate(
        fr.withColumn("warc_ts", F.col("discovered_ts")), _seen(spark, sf)
    )
    return gated.select("url", "doc_id").orderBy("doc_id")


# -- D1b: same semantics through the bloom prefilter (must match exact SQL) --
@_q("d1b_crawl_once_bloom", _D1_ORACLE)
def d1b_crawl_once_bloom(spark, sf):
    from hepcrawl_spark.operators.bloom import (
        build_bloom_sharded,
        sharded_might_contain_udf,
    )

    fr = _frontier(spark, sf)
    seen = _seen(spark, sf)
    bf = build_bloom_sharded(
        seen.select(F.xxhash64("url").alias("url_hash")), n_shards=8
    )
    probe = sharded_might_contain_udf(spark, bf)
    gated = D.crawl_once_gate(
        fr.withColumn("warc_ts", F.col("discovered_ts")).withColumn(
            "_maybe", probe(F.xxhash64("url"))
        ),
        seen,
        might_be_seen=F.col("_maybe"),
    )
    return gated.select("url", "doc_id").orderBy("doc_id")


# -- D1c: same through the sharded cuckoo filter ------------------------------
@_q("d1c_crawl_once_cuckoo", _D1_ORACLE)
def d1c_crawl_once_cuckoo(spark, sf):
    from hepcrawl_spark.operators.cuckoo import build_cuckoo, cuckoo_might_contain_udf

    fr = _frontier(spark, sf)
    seen = _seen(spark, sf)
    cf = build_cuckoo(seen.select(F.xxhash64("url").alias("url_hash")), n_shards=8)
    probe = cuckoo_might_contain_udf(spark, cf)
    gated = D.crawl_once_gate(
        fr.withColumn("warc_ts", F.col("discovered_ts")).withColumn(
            "_maybe", probe(F.xxhash64("url"))
        ),
        seen,
        might_be_seen=F.col("_maybe"),
    )
    return gated.select("url", "doc_id").orderBy("doc_id")


# -- D1d: cuckoo DELETE lifecycle (middlewares.py:134-155) --------------------
# The delete-capable store: entries invalidated by the newer-capture policy
# (here: doc_id % 12 == 6, urls whose stored ts is newer and would stay
# blocked forever) are DELETED from the resident filter and removed from
# url_seen — those urls must re-enter the crawlable set. The oracle models
# the deletion as excluding the invalidated rows from the seen join.
@_q(
    "d1d_crawl_once_cuckoo_delete",
    f"""{_CTE_PREFIX}
    SELECT f.url, f.doc_id
    FROM frontier f
    LEFT JOIN url_seen s ON f.url = s.url AND f.doc_id % 12 <> 6
    WHERE s.url IS NULL OR f.discovered_ts > s.last_ts
    ORDER BY f.doc_id""",
)
def d1d_crawl_once_cuckoo_delete(spark, sf):
    # STATE SETUP (build + delete-delta) is separated from the returned
    # plan and memoized per (session, sf): constructing the DataFrame a
    # second time re-uses the post-delete filter instead of replaying the
    # mutation — so the query builder is pure and plan-auditable alongside
    # every other gate query (round-3 verdict order 8).
    import numpy as np

    from hepcrawl_spark.operators.cuckoo import build_cuckoo, cuckoo_might_contain_udf

    fr = _frontier(spark, sf)
    seen = _seen(spark, sf)
    key = ("d1d_filter", id(spark), sf)
    cf = _STATE_CACHE.get(key)
    if cf is None:
        cf = build_cuckoo(seen.select(F.xxhash64("url").alias("url_hash")), n_shards=8)
        # invalidation delta: O(|invalidated|), never a rebuild
        inval = np.array(
            [
                r["h"]
                for r in _pages(spark, sf)
                .filter((F.col("doc_id") % 12) == 6)
                .select(F.xxhash64("url").alias("h"))
                .collect()
            ],
            dtype=np.int64,
        )
        cf.delete_batch(inval)
        _STATE_CACHE[key] = cf
    inval_urls = _pages(spark, sf).filter((F.col("doc_id") % 12) == 6).select("url")
    valid_seen = seen.join(inval_urls, "url", "left_anti")
    probe = cuckoo_might_contain_udf(spark, cf)
    gated = D.crawl_once_gate(
        fr.withColumn("warc_ts", F.col("discovered_ts")).withColumn(
            "_maybe", probe(F.xxhash64("url"))
        ),
        valid_seen,
        might_be_seen=F.col("_maybe"),
    )
    return gated.select("url", "doc_id").orderBy("doc_id")


# -- D1e: Iceberg-shaped MERGE INTO url_seen (sources/merge_store.py) --------
# The 10^10-URL url_seen lifecycle: base table = current url_seen, delta =
# the wave's (url, ts). MERGE rewrites only wave-touched buckets; matched
# rows keep the greatest timestamp, unmatched insert. Oracle = the
# equivalent union-groupBy-max, which is exactly MERGE INTO's semantics.
@_q(
    "d1e_merge_upsert",
    f"""{_CTE_PREFIX}
    , merged AS (
        SELECT url, last_ts FROM url_seen
        UNION ALL
        SELECT url, discovered_ts AS last_ts FROM frontier
    )
    SELECT url, max(last_ts) AS last_ts FROM merged GROUP BY url ORDER BY url""",
)
def d1e_merge_upsert(spark, sf):
    # STATE SETUP (create + MERGE commit) runs once per (session, sf) into a
    # session-lifetime temp dir; the RETURNED DataFrame is the plain bucketed
    # read of the merged table — a real, auditable parquet-scan plan instead
    # of the round-3 localCheckpoint opaque-RDD scan (verdict order 8).
    import atexit
    import shutil
    import tempfile

    from hepcrawl_spark.sources import merge_store as MS

    key = ("d1e_dir", id(spark), sf)
    d = _STATE_CACHE.get(key)
    if d is None:
        d = tempfile.mkdtemp(prefix="merge_oracle_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        MS.create_table(_seen(spark, sf), d, key="url", n_buckets=8)
        MS.merge_upsert(
            spark,
            d,
            _frontier(spark, sf).select(
                "url", F.col("discovered_ts").alias("last_ts")
            ),
            key="url",
        )
        _STATE_CACHE[key] = d
    return MS.read_table(spark, d).orderBy("url")


# -- D2: deterministic identifier dedup --------------------------------------
@_q(
    "d2_identifier_dedup",
    f"""{_CTE_PREFIX}
    SELECT doc_id % 50 AS identifier, min(url) AS url, count(*) AS n_dups
    FROM pages GROUP BY doc_id % 50 ORDER BY identifier""",
)
def d2_identifier_dedup(spark, sf):
    return (
        _pages(spark, sf)
        .groupBy((F.col("doc_id") % 50).alias("identifier"))
        .agg(F.min("url").alias("url"), F.count("*").alias("n_dups"))
        .orderBy("identifier")
    )


# -- S3/J1: missing-files anti-join ------------------------------------------
@_q(
    "s3_missing_anti_join",
    f"""{_CTE_PREFIX}
    SELECT p.url FROM pages p
    WHERE NOT EXISTS (SELECT 1 FROM url_seen s WHERE s.url = p.url)
    ORDER BY p.url""",
)
def s3_missing_anti_join(spark, sf):
    pages = _pages(spark, sf)
    return pages.join(_seen(spark, sf), "url", "left_anti").select("url").orderBy("url")


# -- S4: zip member scan (WSP package shape, reference utils.py:44-54) -------
# Real compress -> binary column -> decompress round trip: documents pack
# into deterministic zips (one per archive_id), the member scan explodes
# them back, and the oracle predicts names + content digests from the source
# table directly.
@_q(
    "s4_zip_members",
    """SELECT doc_id % 7 AS archive_id,
           'doc_' || doc_id || '.xml' AS member_name,
           md5(text) AS content_md5
    FROM documents ORDER BY archive_id, member_name""",
)
def s4_zip_members(spark, sf):
    from hepcrawl_spark.sources import archives as ARC

    docs = _docs(spark, sf).select(
        (F.col("doc_id") % 7).alias("archive_id"),
        F.concat(
            F.lit("doc_"), F.col("doc_id").cast("string"), F.lit(".xml")
        ).alias("member_name"),
        "text",
    )
    packed = ARC.pack_zip_by_group(docs, "archive_id", "member_name", "text")
    members = ARC.explode_archive_members(packed, fmt="zip", suffix=".xml")
    return members.select(
        "archive_id", "member_name", F.md5("member_bytes").alias("content_md5")
    ).orderBy("archive_id", "member_name")


def _tar_mixed_archives(spark, sf):
    """tar.gz packages carrying BOTH xml and pdf members per doc (the EDP/IOP
    package shape), so the suffix filter is actually exercised."""
    from hepcrawl_spark.sources import archives as ARC

    docs = _docs(spark, sf)
    xml = docs.select(
        (F.col("doc_id") % 7).alias("archive_id"),
        F.concat(
            F.lit("data/doc_"), F.col("doc_id").cast("string"), F.lit(".xml")
        ).alias("member_name"),
        F.col("text").alias("content"),
    )
    pdf = docs.select(
        (F.col("doc_id") % 7).alias("archive_id"),
        F.concat(
            F.lit("data/doc_"), F.col("doc_id").cast("string"), F.lit(".pdf")
        ).alias("member_name"),
        F.concat(F.lit("%PDF-"), F.md5("text")).alias("content"),
    )
    return ARC.pack_tar_by_group(
        xml.unionByName(pdf), "archive_id", "member_name", "content"
    )


# -- S5: tar member scan, xml members (EDP shape, edp_spider.py:205-219) -----
@_q(
    "s5_tar_members_xml",
    """SELECT doc_id % 7 AS archive_id,
           'data/doc_' || doc_id || '.xml' AS member_name,
           md5(text) AS content_md5
    FROM documents ORDER BY archive_id, member_name""",
)
def s5_tar_members_xml(spark, sf):
    from hepcrawl_spark.sources import archives as ARC

    members = ARC.explode_archive_members(
        _tar_mixed_archives(spark, sf), fmt="tar", suffix=".xml"
    )
    return members.select(
        "archive_id", "member_name", F.md5("member_bytes").alias("content_md5")
    ).orderBy("archive_id", "member_name")


# -- S6: tar member scan, pdf members flattened (IOP, iop_spider.py:132-147) --
@_q(
    "s6_tar_members_pdf",
    """SELECT doc_id % 7 AS archive_id,
           'doc_' || doc_id || '.pdf' AS member_name,
           md5('%PDF-' || md5(text)) AS content_md5
    FROM documents ORDER BY archive_id, member_name""",
)
def s6_tar_members_pdf(spark, sf):
    from hepcrawl_spark.sources import archives as ARC

    members = ARC.explode_archive_members(
        _tar_mixed_archives(spark, sf), fmt="tar", suffix=".pdf", flatten=True
    )
    return members.select(
        "archive_id", "member_name", F.md5("member_bytes").alias("content_md5")
    ).orderBy("archive_id", "member_name")


# -- S18: WARC record scan (Common-Crawl-style source) ------------------------
# Real WARC/1.0 bytes: pack documents into per-record-gzip-member archives
# (the Common Crawl layout), read the binary column back through the
# mapInPandas record parser, verify url/status/content digests against the
# source table. The full pack -> WARC bytes -> parse round trip runs inside
# the query; the oracle predicts the output relationally.
@_q(
    "s18_warc_scan",
    """SELECT doc_id % 5 AS warc_id,
           'https://w' || (doc_id % 4) || '.example.org/doc/' || doc_id AS url,
           200 AS http_status,
           md5(text) AS content_md5
    FROM documents ORDER BY warc_id, url""",
)
def s18_warc_scan(spark, sf):
    from hepcrawl_spark.sources import warc as W

    docs = _docs(spark, sf).select(
        (F.col("doc_id") % 5).alias("warc_id"),
        F.concat(
            F.lit("https://w"), (F.col("doc_id") % 4).cast("string"),
            F.lit(".example.org/doc/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        "text",
    )
    packed = W.pack_warc_by_group(docs, "warc_id", "url", "text")
    recs = W.explode_warc_records(packed)
    return recs.select(
        "warc_id", "url", "http_status",
        F.md5("body").alias("content_md5"),
    ).orderBy("warc_id", "url")


# -- S19: sitemap scan (seed-feed source, sitemaps.org protocol) --------------
# urlset XML synthesized relationally (sorted collect_list per group so the
# bytes are deterministic), parsed back through the real ET-based parser;
# the oracle predicts every (loc, lastmod, priority) row from documents.
@_q(
    "s19_sitemap_scan",
    """SELECT 'https://maps.example.org/sm_' || (doc_id % 10) || '.xml' AS sitemap_url,
           'https://s.example.org/doc/' || doc_id AS loc,
           '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS lastmod,
           CAST('0.' || (doc_id % 10) AS DOUBLE) AS priority
    FROM documents ORDER BY sitemap_url, loc""",
)
def s19_sitemap_scan(spark, sf):
    from hepcrawl_spark.parsers.sitemap import parse_sitemaps

    entry_xml = F.concat(
        F.lit("<url><loc>https://s.example.org/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("</loc><lastmod>2024-01-"),
        F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        F.lit("</lastmod><priority>0."),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("</priority></url>"),
    )
    sitemaps = (
        _docs(spark, sf)
        .select(
            F.concat(
                F.lit("https://maps.example.org/sm_"),
                (F.col("doc_id") % 10).cast("string"),
                F.lit(".xml"),
            ).alias("url"),
            entry_xml.alias("entry"),
        )
        .groupBy("url")
        .agg(
            F.concat(
                F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
                F.concat_ws("", F.array_sort(F.collect_list("entry"))),
                F.lit("</urlset>"),
            ).alias("text")
        )
    )
    return (
        parse_sitemaps(sitemaps)
        .select("sitemap_url", "loc", "lastmod", "priority")
        .orderBy("sitemap_url", "loc")
    )


# -- S20: Common Crawl CDX index scan -> frontier seeds -----------------------
# CDXJ capture-index lines synthesized relationally (two captures for every
# doc_id % 3 == 0 urlkey, 404s and pdfs sprinkled in), parsed back through
# the real JVM regexp+from_json pipeline (sources/cdx.py), filtered to
# fetchable captures and deduped to the newest capture per urlkey. The
# oracle independently reconstructs the SURT key (host reversal, www strip,
# path lowercase, query-param sort) and the filter+latest-capture winner.
@_q(
    "s20_cdx_seeds",
    """SELECT url, host, urlkey, digest, ts FROM (
      SELECT 'https://www.h' || (doc_id % 50) || '.example.org/P' || doc_id
               || '?b=2&a=1' AS url,
             'www.h' || (doc_id % 50) || '.example.org' AS host,
             'org,example,h' || (doc_id % 50) || ')/p' || doc_id
               || '?a=1&b=2' AS urlkey,
             CASE WHEN doc_id % 3 = 0 THEN 'sha1:B' || doc_id
                  ELSE 'sha1:A' || doc_id END AS digest,
             CASE WHEN doc_id % 3 = 0 THEN '2024-03-22 00:00:00'
                  ELSE '2024-01-01 00:00:00' END AS ts
      FROM documents
      WHERE doc_id % 3 = 0 OR (doc_id % 7 <> 0 AND doc_id % 5 <> 0)
    ) ORDER BY urlkey""",
)
def s20_cdx_seeds(spark, sf):
    from hepcrawl_spark.sources import cdx as CDX

    d = _docs(spark, sf)
    k = (F.col("doc_id") % 50).cast("string")
    sid = F.col("doc_id").cast("string")
    url = F.concat(
        F.lit("https://www.h"), k, F.lit(".example.org/P"), sid, F.lit("?b=2&a=1")
    )
    surt = CDX.surt_key(url)
    status = F.when(F.col("doc_id") % 7 == 0, F.lit("404")).otherwise(F.lit("200"))
    mime = F.when(
        F.col("doc_id") % 5 == 0, F.lit("application/pdf")
    ).otherwise(F.lit("text/html"))
    payload1 = F.concat(
        F.lit('{"url": "'), url, F.lit('", "mime": "'), mime,
        F.lit('", "status": "'), status,
        F.lit('", "digest": "sha1:A'), sid,
        F.lit('", "length": "100", "offset": "0", "filename": "w1.warc.gz"}'),
    )
    payload2 = F.concat(
        F.lit('{"url": "'), url,
        F.lit('", "mime": "text/html", "status": "200", "digest": "sha1:B'), sid,
        F.lit('", "length": "120", "offset": "9", "filename": "w2.warc.gz"}'),
    )
    line1 = F.concat(surt, F.lit(" 20240101000000 "), payload1)
    line2 = F.concat(surt, F.lit(" 20240322000000 "), payload2)
    lines = d.select(
        F.explode(
            F.when(F.col("doc_id") % 3 == 0, F.array(line1, line2))
            .otherwise(F.array(line1))
        ).alias("line")
    )
    seeds = CDX.cdx_seeds(CDX.parse_cdxj(lines))
    return seeds.select(
        "url", "host", "urlkey", "digest",
        F.date_format("discovered_ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
    ).orderBy("urlkey")


# -- S21: WET export (Common Crawl extracted-text sidecar) --------------------
# pages text -> pack_wet_by_group (conversion records, per-record gzip
# members, WARC-Refers-To back-links) -> real WARC decoder with
# rec_types=('conversion',). The full pack -> WET bytes -> parse round trip
# runs inside the query; the oracle predicts the output relationally.
@_q(
    "s21_wet_export",
    """SELECT doc_id % 5 AS wet_id,
           'https://w' || (doc_id % 4) || '.example.org/doc/' || doc_id AS url,
           'text/plain' AS content_type,
           md5(text) AS text_md5
    FROM documents ORDER BY wet_id, url""",
)
def s21_wet_export(spark, sf):
    from hepcrawl_spark.sources import warc as W

    docs = _docs(spark, sf).select(
        (F.col("doc_id") % 5).alias("wet_id"),
        F.concat(
            F.lit("https://w"), (F.col("doc_id") % 4).cast("string"),
            F.lit(".example.org/doc/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        "text",
    )
    packed = W.pack_wet_by_group(docs, "wet_id", "url", "text")
    recs = W.explode_warc_records(packed, rec_types=("conversion",))
    return recs.select(
        "wet_id", "url", "content_type", F.md5("body").alias("text_md5")
    ).orderBy("wet_id", "url")


# -- C23: html -> visible text (the html:binary -> text:string leg) -----------
# Deterministic html synthesized from doc columns (md5 payloads keep the
# markup unambiguous), extracted through the real HTMLParser state machine;
# the oracle predicts title and visible text relationally. Script bodies
# must vanish, entities decode, whitespace collapses.
@_q(
    "c23_html_extract",
    """SELECT doc_id,
           'Doc ' || doc_id AS title,
           'H' || doc_id || ' says ' || md5(text) || ' & more' AS text
    FROM documents ORDER BY doc_id""",
)
def c23_html_extract(spark, sf):
    from hepcrawl_spark.functions.html import html_to_text

    pages = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</title><script>var junk = '<p>no</p>';</script></head>"),
            F.lit("<body><h1>H"),
            F.col("doc_id").cast("string"),
            F.lit("</h1>\n  <p>says\n "),
            F.md5("text"),
            F.lit(" &amp; more</p></body></html>"),
        ).alias("html"),
    )
    return (
        html_to_text(pages)
        .select("doc_id", "title", "text")
        .orderBy("doc_id")
    )


# -- C18: list -> value-dict shaping (outputs.py:14-59) -----------------------
@_q(
    "c18_value_dicts",
    """SELECT doc_id, 'author' AS kw_source, 'kw_' || (doc_id % 9) AS kw_value,
           'PACS' AS standard,
           CAST(doc_id % 13 AS VARCHAR) || '.' || CAST(doc_id % 7 AS VARCHAR)
             AS classification_number
    FROM documents ORDER BY doc_id""",
)
def c18_value_dicts(spark, sf):
    from hepcrawl_spark.functions import shaping as SH

    d = _docs(spark, sf).select(
        "doc_id",
        F.array(F.concat(F.lit("kw_"), (F.col("doc_id") % 9).cast("string"))).alias(
            "kws"
        ),
        F.array(
            F.concat(
                (F.col("doc_id") % 13).cast("string"),
                F.lit("."),
                (F.col("doc_id") % 7).cast("string"),
            )
        ).alias("pacs"),
    )
    shaped = d.select(
        "doc_id",
        F.explode(SH.free_keywords("kws")).alias("kw"),
        SH.classification_numbers("pacs").alias("cn"),
    )
    return shaped.select(
        "doc_id",
        F.col("kw.source").alias("kw_source"),
        F.col("kw.value").alias("kw_value"),
        F.element_at("cn", 1)["standard"].alias("standard"),
        F.element_at("cn", 1)["classification_number"].alias(
            "classification_number"
        ),
    ).orderBy("doc_id")


# -- tohep: whole-record normalization (tohep.py:89-357) ----------------------
# Flat spider items built from documents run the full two-stage lifecycle
# (normalize_hepcrawl_record -> hepcrawl_to_hep); the oracle predicts the
# scalar projections (license-URL naming, collaboration normalization,
# collections -> document types, pubinfo pruning, int page count) in SQL.
@_q(
    "tohep_normalize",
    """SELECT CAST(doc_id AS VARCHAR) AS record_id,
      'T' || doc_id AS title,
      CASE WHEN doc_id % 4 = 0 THEN 'book' ELSE 'article' END AS document_types,
      CASE WHEN doc_id % 2 = 0 THEN 'CC BY 3.0' ELSE 'CC BY 4.0' END AS license_name,
      'G' || (doc_id % 7) AS collaborations,
      CASE WHEN doc_id % 5 = 0 THEN NULL ELSE source END AS journal_title,
      CASE WHEN doc_id % 5 = 0 THEN NULL
           ELSE CAST(1990 + doc_id % 30 AS VARCHAR) END AS year,
      CAST(doc_id % 25 + 1 AS VARCHAR) AS number_of_pages
    FROM documents ORDER BY record_id""",
)
def tohep_normalize(spark, sf):
    from hepcrawl_spark.tohep import tohep_normalize_pages

    d = _docs(spark, sf)
    sid = F.col("doc_id").cast("string")
    no_pub = F.col("doc_id") % 5 == 0
    item = F.struct(
        F.concat(F.lit("T"), sid).alias("title"),
        F.col("text").alias("abstract"),
        F.when(~no_pub, F.col("source")).alias("journal_title"),
        F.when(~no_pub, (F.col("doc_id") % 30 + 1990).cast("string")).alias(
            "journal_year"
        ),
        F.array((F.col("doc_id") % 25 + 1).cast("string")).alias("page_nr"),
        F.array(
            F.struct(
                F.concat(
                    F.lit("http://creativecommons.org/licenses/by/"),
                    F.when(F.col("doc_id") % 2 == 0, F.lit("3.0")).otherwise(
                        F.lit("4.0")
                    ),
                    F.lit("/"),
                ).alias("url")
            )
        ).alias("license"),
        F.array(
            F.struct(
                F.concat(
                    F.lit("The G"), (F.col("doc_id") % 7).cast("string"),
                    F.lit(" Collaboration"),
                ).alias("value")
            )
        ).alias("collaborations"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.array(F.struct(F.lit("Book").alias("primary"))),
        ).alias("collections"),
        F.struct(
            F.col("source").alias("source"),
            F.lit("hepcrawl").alias("method"),
            F.lit("2024-01-01T00:00:00").alias("datetime"),
            F.lit("job1").alias("submission_number"),
        ).alias("acquisition_source"),
    )
    records = d.select(sid.alias("record_id"), F.to_json(item).alias("record_json"))
    return (
        tohep_normalize_pages(records, pre_normalize_source="graft")
        .select(
            "record_id", "title", "document_types", "license_name",
            "collaborations", "journal_title", "year", "number_of_pages",
        )
        .orderBy("record_id")
    )


# -- S12: Elsevier CONSYN batch feed (elsevier_spider.py:115-132) -------------
@_q(
    "s12_batch_feed",
    """SELECT source AS feed,
           'pkg_' || doc_id || '.zip' AS name,
           'https://consyn.example.org/batch/' || doc_id || '.zip' AS url
    FROM documents ORDER BY feed, name""",
)
def s12_batch_feed(spark, sf):
    from hepcrawl_spark.parsers.consyn_feed import parse_batch_feed_pages

    entry = F.concat(
        F.lit("<entry><title>pkg_"),
        F.col("doc_id").cast("string"),
        F.lit('.zip</title><link href="https://consyn.example.org/batch/'),
        F.col("doc_id").cast("string"),
        F.lit('.zip"/></entry>'),
    )
    feeds = (
        _docs(spark, sf)
        .select("source", entry.alias("e"))
        .groupBy("source")
        .agg(
            F.concat(
                F.lit('<feed xmlns="http://www.w3.org/2005/Atom">'),
                F.concat_ws("", F.array_sort(F.collect_list("e"))),
                F.lit("</feed>"),
            ).alias("body")
        )
        .withColumnRenamed("source", "feed")
    )
    return parse_batch_feed_pages(feeds).orderBy("feed", "name")


# -- J4: downloaded-file back-join (tohep.py:38-67) ---------------------------
# Each record carries two documents; record_files exist for even doc_ids.
# Matched docs repoint url at the fetched path (old_url <- previous url,
# key <- basename); unmatched docs with a nonempty lookup restore
# url <- old_url, EXCEPT a doc whose only url-ish field is `url` keeps it —
# the reference raises KeyError on document['old_url'] there, so the
# lossless analog is keep-the-url, never silently NULL (round-2 ADVICE).
@_q(
    "j4_document_patch",
    """SELECT record_id, pos, url, old_url, doc_key FROM (
      SELECT doc_id AS record_id, 0 AS pos,
        CASE WHEN doc_id % 2 = 0
             THEN 's3://store/doc_' || doc_id || '.pdf'
             ELSE 'https://pub.example.org/' || doc_id || '/doc_' || doc_id || '.pdf'
        END AS url,
        CASE WHEN doc_id % 2 = 0
             THEN 'https://cdn.example.org/' || doc_id || '/doc_' || doc_id || '.pdf'
             ELSE 'https://pub.example.org/' || doc_id || '/doc_' || doc_id || '.pdf'
        END AS old_url,
        CASE WHEN doc_id % 2 = 0 THEN 'doc_' || doc_id || '.pdf' END AS doc_key
      FROM documents
      UNION ALL
      SELECT doc_id, 1,
        'https://cdn.example.org/' || doc_id || '/other_' || doc_id || '.txt',
        NULL, 'k0' FROM documents
    ) ORDER BY record_id, pos""",
)
def j4_document_patch(spark, sf):
    from hepcrawl_spark.operators.records import patch_document_urls

    d = _docs(spark, sf)
    sid = F.col("doc_id").cast("string")
    doc1 = F.struct(
        F.concat(F.lit("https://cdn.example.org/"), sid, F.lit("/doc_"), sid, F.lit(".pdf")).alias("url"),
        F.concat(F.lit("https://pub.example.org/"), sid, F.lit("/doc_"), sid, F.lit(".pdf")).alias("old_url"),
        F.lit(None).cast("string").alias("key"),
    )
    doc2 = F.struct(
        F.concat(F.lit("https://cdn.example.org/"), sid, F.lit("/other_"), sid, F.lit(".txt")).alias("url"),
        F.lit(None).cast("string").alias("old_url"),
        F.lit("k0").alias("key"),
    )
    records = d.select(
        F.col("doc_id").alias("record_id"), F.array(doc1, doc2).alias("documents")
    )
    record_files = d.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("record_id"),
        F.concat(F.lit("files/doc_"), sid, F.lit(".pdf")).alias("name"),
        F.concat(F.lit("s3://store/doc_"), sid, F.lit(".pdf")).alias("path"),
    )
    patched = patch_document_urls(records, record_files)
    return (
        patched.select(
            "record_id", F.posexplode("documents").alias("pos", "d")
        )
        .select(
            "record_id",
            "pos",
            F.col("d.url").alias("url"),
            F.col("d.old_url").alias("old_url"),
            F.col("d.key").alias("doc_key"),
        )
        .orderBy("record_id", "pos")
    )


# -- F2: full Elsevier harvest-worthiness conjunction (elsevier.py:686-696) ---
_F2_FIELDS_SQL = """
    SELECT doc_id,
      CASE doc_id % 4 WHEN 0 THEN 'full-length article'
                      WHEN 1 THEN 'review article'
                      WHEN 2 THEN 'book review'
                      ELSE 'erratum' END AS article_type,
      CASE WHEN doc_id % 5 = 0 THEN '' ELSE 'T' || doc_id END AS title,
      source AS journal_title,
      CASE WHEN doc_id % 7 = 0 THEN NULL
           ELSE CAST(doc_id % 90 + 1 AS VARCHAR) END AS journal_volume,
      CASE WHEN doc_id % 3 = 0 THEN 'a' || doc_id END AS artid,
      CASE WHEN doc_id % 3 = 1 THEN CAST(doc_id % 40 AS VARCHAR) END AS page_start
    FROM documents"""


@_q(
    "f2_harvest_worthy",
    f"""WITH fields AS ({_F2_FIELDS_SQL})
    SELECT doc_id FROM fields
    WHERE article_type IN ('full-length article','addendum','chapter',
            'erratum','review article','short communication','short survey',
            'publisher''s note','discussion')
      AND title IS NOT NULL AND title <> ''
      AND journal_title IS NOT NULL AND journal_title <> ''
      AND journal_volume IS NOT NULL AND journal_volume <> ''
      AND ((artid IS NOT NULL AND artid <> '')
           OR (page_start IS NOT NULL AND page_start <> ''))
    ORDER BY doc_id""",
)
def f2_harvest_worthy(spark, sf):
    from hepcrawl_spark.operators.filters import harvest_worthy

    sid = F.col("doc_id").cast("string")
    fields = _docs(spark, sf).select(
        "doc_id",
        F.element_at(
            F.array(
                F.lit("full-length article"),
                F.lit("review article"),
                F.lit("book review"),
                F.lit("erratum"),
            ),
            (F.col("doc_id") % 4 + 1).cast("int"),
        ).alias("article_type"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("")).otherwise(
            F.concat(F.lit("T"), sid)
        ).alias("title"),
        F.col("source").alias("journal_title"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string")).otherwise(
            (F.col("doc_id") % 90 + 1).cast("string")
        ).alias("journal_volume"),
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("a"), sid)).alias("artid"),
        F.when(F.col("doc_id") % 3 == 1, (F.col("doc_id") % 40).cast("string")).alias(
            "page_start"
        ),
    )
    return fields.filter(harvest_worthy()).select("doc_id").orderBy("doc_id")


# -- F4: EDP open-access two-way split (edp_spider.py:125-127,243-253) --------
@_q(
    "f4_open_access_split",
    """WITH fields AS (
      SELECT doc_id,
        CASE WHEN doc_id % 4 = 0 THEN NULL
             ELSE '10.1051/epjconf/' || doc_id END AS doi,
        CASE WHEN doc_id % 2 = 0 THEN 'EPJ Web of Conferences'
             ELSE source END AS journal_title
      FROM documents)
    SELECT doc_id,
      CASE WHEN doi IS NOT NULL AND journal_title = 'EPJ Web of Conferences'
           THEN 'pdf' ELSE 'direct' END AS branch
    FROM fields ORDER BY doc_id""",
)
def f4_open_access_split(spark, sf):
    from hepcrawl_spark.operators.filters import split_by_open_access

    sid = F.col("doc_id").cast("string")
    fields = _docs(spark, sf).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0, F.lit(None).cast("string")
        ).otherwise(F.concat(F.lit("10.1051/epjconf/"), sid)).alias("doi"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("EPJ Web of Conferences"))
        .otherwise(F.col("source"))
        .alias("journal_title"),
    )
    pdf_wave, direct = split_by_open_access(fields)
    return (
        pdf_wave.select("doc_id", F.lit("pdf").alias("branch"))
        .unionByName(direct.select("doc_id", F.lit("direct").alias("branch")))
        .orderBy("doc_id")
    )


# -- J5: the fetch join -------------------------------------------------------
@_q(
    "j5_fetch_join",
    f"""{_CTE_PREFIX}
    SELECT f.url, strftime(p.warc_ts, '%Y-%m-%d %H:%M:%S') AS warc_ts_str,
           length(p.text) AS n_chars
    FROM frontier f JOIN pages p ON f.url = p.url
    WHERE f.priority >= 0.5 ORDER BY f.url""",
)
def j5_fetch_join(spark, sf):
    fr = _frontier(spark, sf).filter(F.col("priority") >= 0.5)
    pages = _pages(spark, sf)
    return (
        fr.join(pages.select("url", "warc_ts", "text"), "url")
        .select(
            "url",
            F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss").alias("warc_ts_str"),
            F.length("text").cast("long").alias("n_chars"),
        )
        .orderBy("url")
    )


# -- J2/J3: within-row map lookup (affiliation resolution shape) -------------
@_q(
    "j2_affiliation_lookup",
    f"""{_CTE_PREFIX}
    SELECT doc_id, 'Institute of ' || source AS affiliation
    FROM documents ORDER BY doc_id""",
)
def j2_affiliation_lookup(spark, sf):
    docs = _docs(spark, sf)
    with_map = docs.select(
        "doc_id",
        F.map_from_entries(
            F.array(
                F.struct(
                    F.lit("a1").alias("k"),
                    F.concat(F.lit("Institute of "), "source").alias("v"),
                )
            )
        ).alias("aff_map"),
        F.lit("a1").alias("rid"),
    )
    return with_map.select(
        "doc_id", F.element_at("aff_map", F.col("rid")).alias("affiliation")
    ).orderBy("doc_id")


# -- P1/P2: politeness wave (per-host window cap) -----------------------------
@_q(
    "p1_politeness_wave",
    f"""{_CTE_PREFIX}
    SELECT host, url, wave_rank FROM (
      SELECT host, url,
             row_number() OVER (PARTITION BY host
                                ORDER BY priority DESC, discovered_ts, url)
               AS wave_rank
      FROM frontier
    ) WHERE wave_rank <= 5 ORDER BY host, wave_rank""",
)
def p1_politeness_wave(spark, sf):
    wave = P.select_wave(_frontier(spark, sf), max_per_host=5, salt=1)
    # row_number() is int32 in Spark, BIGINT in DuckDB: cast for typed-hash
    # parity (tools/check_oracle.py enforces result-type equality)
    return wave.select(
        "host", "url", F.col("wave_rank").cast("long").alias("wave_rank")
    ).orderBy("host", "wave_rank")


# -- P4: deterministic global dispatch order ----------------------------------
@_q(
    "p4_crawl_order",
    f"""{_CTE_PREFIX}
    SELECT dispatch_order, url FROM (
      SELECT url, row_number() OVER (ORDER BY priority DESC, discovered_ts, url)
               AS dispatch_order
      FROM frontier
    ) WHERE dispatch_order <= 100 ORDER BY dispatch_order""",
)
def p4_crawl_order(spark, sf):
    ordered = P.crawl_order(_frontier(spark, sf))
    return (
        ordered.filter(F.col("dispatch_order") <= 100)
        .select(
            F.col("dispatch_order").cast("long").alias("dispatch_order"), "url"
        )
        .orderBy("dispatch_order")
    )


# -- P5: robots gating ---------------------------------------------------------
@_q(
    "p5_robots_gate",
    f"""{_CTE_PREFIX}
    SELECT f.url FROM frontier f
    WHERE NOT EXISTS (
      SELECT 1 FROM robots r
      WHERE r.host = f.host AND starts_with('/doc/' || f.doc_id, r.path_prefix)
    ) ORDER BY f.url""",
)
def p5_robots_gate(spark, sf):
    fr = _frontier(spark, sf)
    robots = SRC.robots_from_documents(_docs(spark, sf))
    return P.robots_gate(fr, robots).select("url").orderBy("url")


# -- P6: retry priority decay ---------------------------------------------------
@_q(
    "p6_retry_decay",
    f"""{_CTE_PREFIX}
    SELECT url, priority * 0.5 AS priority, 1 AS attempt
    FROM frontier WHERE doc_id % 5 = 0 ORDER BY url""",
)
def p6_retry_decay(spark, sf):
    failed = (
        _frontier(spark, sf)
        .filter(F.col("doc_id") % 5 == 0)
        .withColumn("attempt", F.lit(0))
    )
    return (
        P.decay_priority(failed)
        .select("url", "priority", "attempt")
        .orderBy("url")
    )


# -- P7: robots.txt parse (the front half of P5) ------------------------------
# Real robots.txt text synthesized per host, parsed by crawl/robots.py
# through mapInPandas; the oracle predicts the rules table relationally.
# RFC semantics exercised in-query: group selection, allow+disallow rows,
# crawl-delay capture.
@_q(
    "p7_robots_parse",
    """WITH hosts AS (
        SELECT DISTINCT doc_id % 20 AS k FROM documents
    )
    SELECT * FROM (
        SELECT 'h' || k || '.example.org' AS host, 'disallow' AS allow,
               '/private/' || k || '/' AS path_prefix,
               CAST(k % 5 + 1 AS DOUBLE) AS crawl_delay
        FROM hosts
        UNION ALL
        SELECT 'h' || k || '.example.org', 'allow',
               '/private/' || k || '/pub/', CAST(k % 5 + 1 AS DOUBLE)
        FROM hosts
    ) ORDER BY host, allow, path_prefix""",
)
def p7_robots_parse(spark, sf):
    from hepcrawl_spark.crawl.robots import parse_robots_txt

    pages = (
        _docs(spark, sf)
        .select((F.col("doc_id") % 20).alias("k"))
        .distinct()
        .select(
            F.concat(F.lit("h"), F.col("k").cast("string"), F.lit(".example.org")).alias(
                "host"
            ),
            F.concat(
                F.lit("# synthetic\nUser-agent: otherbot\nDisallow: /other/\n\n"),
                F.lit("User-agent: *\nDisallow: /private/"),
                F.col("k").cast("string"),
                F.lit("/\nAllow: /private/"),
                F.col("k").cast("string"),
                F.lit("/pub/\nCrawl-delay: "),
                (F.col("k") % 5 + 1).cast("string"),
                F.lit("\n"),
            ).alias("text"),
        )
    )
    return parse_robots_txt(pages).orderBy("host", "allow", "path_prefix")


# -- P2b: host pressure (hot-host detection input) ------------------------------
@_q(
    "p2_host_pressure",
    f"""{_CTE_PREFIX}
    SELECT host, count(*) AS n,
           count(*) > (SELECT avg(cnt) FROM
                        (SELECT count(*) AS cnt FROM frontier GROUP BY host))
             AS hot
    FROM frontier GROUP BY host ORDER BY host""",
)
def p2_host_pressure(spark, sf):
    counts = _frontier(spark, sf).groupBy("host").agg(F.count("*").alias("n"))
    avg = counts.agg(F.avg("n").alias("a"))
    return (
        counts.crossJoin(F.broadcast(avg))
        .select("host", "n", (F.col("n") > F.col("a")).alias("hot"))
        .orderBy("host")
    )


# -- F1: article-type allowlist -------------------------------------------------
_ALLOWED_TYPES = [f"type{i}" for i in range(9)]


@_q(
    "f1_article_allowlist",
    f"""{_CTE_PREFIX}
    SELECT doc_id, 'type' || (doc_id % 11) AS article_type FROM documents
    WHERE 'type' || (doc_id % 11) IN ({",".join("'" + t + "'" for t in _ALLOWED_TYPES)})
    ORDER BY doc_id""",
)
def f1_article_allowlist(spark, sf):
    docs = _docs(spark, sf).withColumn(
        "article_type",
        F.concat(F.lit("type"), (F.col("doc_id") % 11).cast("string")),
    )
    return (
        docs.filter(F.col("article_type").isin(_ALLOWED_TYPES))
        .select("doc_id", "article_type")
        .orderBy("doc_id")
    )


# -- F6: language filter (drop English) -------------------------------------------
@_q(
    "f6_language_filter",
    f"""{_CTE_PREFIX}
    SELECT doc_id, lang FROM pages WHERE lang <> 'en' ORDER BY doc_id""",
)
def f6_language_filter(spark, sf):
    return (
        _pages(spark, sf)
        .filter(F.col("lang") != "en")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# -- C16: language code -> name ----------------------------------------------------
_LANG_CASE = "CASE lower(lang) " + " ".join(
    f"WHEN '{k}' THEN '{v}'" for k, v in T.LANGUAGES.items()
) + " END"


@_q(
    "c16_language_names",
    f"""{_CTE_PREFIX}
    SELECT lang, {_LANG_CASE} AS lang_name, count(*) AS n
    FROM pages GROUP BY lang ORDER BY lang""",
)
def c16_language_names(spark, sf):
    return (
        _pages(spark, sf)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .select("lang", T.language_name("lang").alias("lang_name"), "n")
        .orderBy("lang")
    )


# -- C4: whitespace collapse ---------------------------------------------------------
@_q(
    "c4_whitespace_collapse",
    f"""{_CTE_PREFIX}
    SELECT doc_id,
           trim(regexp_replace('  ' || text || '   ', '\\s+', ' ', 'g')) AS clean
    FROM documents ORDER BY doc_id""",
)
def c4_whitespace_collapse(spark, sf):
    padded = _docs(spark, sf).select(
        "doc_id", F.concat(F.lit("  "), "text", F.lit("   ")).alias("padded")
    )
    return padded.select(
        "doc_id", T.collapse_whitespace("padded").alias("clean")
    ).orderBy("doc_id")


# -- C5: html sub/sup -> latex ----------------------------------------------------------
@_q(
    "c5_subsup_latex",
    f"""{_CTE_PREFIX}
    SELECT doc_id, 'H$_{{' || doc_id || '}}$O and x$^{{2}}$' AS latex
    FROM documents ORDER BY doc_id""",
)
def c5_subsup_latex(spark, sf):
    raw = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.lit("H<sub>"), F.col("doc_id").cast("string"),
            F.lit("</sub>O and x<sup>2</sup>"),
        ).alias("html"),
    )
    return raw.select("doc_id", T.html_subsup_to_latex("html").alias("latex")).orderBy(
        "doc_id"
    )


# -- C7: initials collapse ------------------------------------------------------------
@_q(
    "c7_initials_collapse",
    f"""{_CTE_PREFIX}
    SELECT doc_id, 'T.A.B. ' || source AS name FROM documents ORDER BY doc_id""",
)
def c7_initials_collapse(spark, sf):
    raw = _docs(spark, sf).select(
        "doc_id", F.concat(F.lit("T. A.-B. "), "source").alias("name")
    )
    return raw.select(
        "doc_id", T.collapse_initials_col("name").alias("name")
    ).orderBy("doc_id")


# -- C10: journal/section split ----------------------------------------------------------
@_q(
    "c10_journal_section",
    f"""{_CTE_PREFIX}
    SELECT doc_id, 'Phys. Lett.' AS journal,
           substr('ABCDE', (doc_id % 5)::INT + 1, 1) AS section
    FROM documents ORDER BY doc_id""",
)
def c10_journal_section(spark, sf):
    raw = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.lit("Phys. Lett. "),
            F.lit("ABCDE").substr(
                (F.col("doc_id") % 5).cast("int") + F.lit(1), F.lit(1)
            ),
        ).alias("pub"),
    )
    journal, section = T.journal_and_section("pub")
    return raw.select(
        "doc_id", journal.alias("journal"), section.alias("section")
    ).orderBy("doc_id")


# -- C11: multi-format date waterfall -------------------------------------------------------
@_q(
    "c11_date_waterfall",
    f"""{_CTE_PREFIX}
    , raw AS (
      SELECT doc_id,
             2000 + doc_id % 20 AS y, 1 + doc_id % 12 AS m, 1 + doc_id % 28 AS d,
             doc_id % 3 AS fmt
      FROM documents
    ), strs AS (
      SELECT doc_id,
        CASE fmt
          WHEN 0 THEN lpad(y::VARCHAR,4,'0') || '-' || lpad(m::VARCHAR,2,'0') || '-' || lpad(d::VARCHAR,2,'0')
          WHEN 1 THEN lpad(d::VARCHAR,2,'0') || '/' || lpad(m::VARCHAR,2,'0') || '/' || lpad(y::VARCHAR,4,'0')
          ELSE lpad(y::VARCHAR,4,'0') || '/' || lpad(m::VARCHAR,2,'0') || '/' || lpad(d::VARCHAR,2,'0')
        END AS ds
      FROM raw
    )
    SELECT doc_id, ds,
           coalesce(try_strptime(ds, '%Y-%m-%d'),
                    try_strptime(ds, '%d/%m/%Y'),
                    try_strptime(ds, '%Y/%m/%d'))::DATE::VARCHAR AS parsed
    FROM strs ORDER BY doc_id""",
)
def c11_date_waterfall(spark, sf):
    docs = _docs(spark, sf)
    y = (F.lit(2000) + F.col("doc_id") % 20).cast("string")
    m = F.lpad((F.lit(1) + F.col("doc_id") % 12).cast("string"), 2, "0")
    d = F.lpad((F.lit(1) + F.col("doc_id") % 28).cast("string"), 2, "0")
    ds = (
        F.when(F.col("doc_id") % 3 == 0, F.concat_ws("-", y, m, d))
        .when(F.col("doc_id") % 3 == 1, F.concat_ws("/", d, m, y))
        .otherwise(F.concat_ws("/", y, m, d))
    )
    raw = docs.select("doc_id", ds.alias("ds"))
    parsed = F.coalesce(
        F.expr("try_to_date(ds, 'yyyy-MM-dd')"),
        F.expr("try_to_date(ds, 'dd/MM/yyyy')"),
        F.expr("try_to_date(ds, 'yyyy/MM/dd')"),
    )
    return raw.select(
        "doc_id", "ds", parsed.cast("string").alias("parsed")
    ).orderBy("doc_id")


# -- C13: page-count regex ---------------------------------------------------------------
@_q(
    "c13_page_count",
    f"""{_CTE_PREFIX}
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN (doc_id % 40)::INT END AS page_nr
    FROM documents ORDER BY doc_id""",
)
def c13_page_count(spark, sf):
    raw = _docs(spark, sf).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("see "), (F.col("doc_id") % 40).cast("string"), F.lit(" pages, 3 figures")
            ),
        )
        .otherwise(F.lit("no page info"))
        .alias("comments"),
    )
    return raw.select("doc_id", T.page_count("comments").alias("page_nr")).orderBy(
        "doc_id"
    )


# -- C14: DOI split + explode ----------------------------------------------------------------
@_q(
    "c14_doi_split",
    f"""{_CTE_PREFIX}
    SELECT doc_id, doi FROM (
      SELECT doc_id, '10.1103/a' || doc_id AS doi FROM documents
      UNION ALL
      SELECT doc_id, '10.1007/b' || doc_id AS doi FROM documents
    ) ORDER BY doc_id, doi""",
)
def c14_doi_split(spark, sf):
    raw = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.lit("10.1103/a"), F.col("doc_id").cast("string"),
            F.lit(", 10.1007/b"), F.col("doc_id").cast("string"),
        ).alias("doi_str"),
    )
    return (
        raw.select("doc_id", F.explode(T.split_dois("doi_str")).alias("doi"))
        .orderBy("doc_id", "doi")
    )


# -- C15: doctype classification -----------------------------------------------------------------
@_q(
    "c15_doctype_classify",
    f"""{_CTE_PREFIX}
    SELECT doc_id,
           CASE doc_id % 3 WHEN 1 THEN 'thesis'
                           WHEN 2 THEN 'conference paper'
                           ELSE 'article' END AS doctype
    FROM documents ORDER BY doc_id""",
)
def c15_doctype_classify(spark, sf):
    raw = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            "text",
            F.when(F.col("doc_id") % 3 == 1, F.lit(" Based on the PhD dissertation"))
            .when(F.col("doc_id") % 3 == 2, F.lit(" presented at the workshop"))
            .otherwise(F.lit("")),
        ).alias("comments"),
    )
    return raw.select(
        "doc_id", T.classify_doctype("comments").alias("doctype")
    ).orderBy("doc_id")


# -- A1: crawl counters ------------------------------------------------------------------------
@_q(
    "a1_crawl_counters",
    f"""{_CTE_PREFIX}
    SELECT source, count(*) AS n_pages,
           count(DISTINCT lang) AS n_langs,
           strftime(min(warc_ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(max(warc_ts), '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM pages GROUP BY source ORDER BY source""",
)
def a1_crawl_counters(spark, sf):
    return (
        _pages(spark, sf)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_pages"),
            F.countDistinct("lang").alias("n_langs"),
            F.date_format(F.min("warc_ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.date_format(F.max("warc_ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        )
        .orderBy("source")
    )


# -- A3/A4: earliest date via null-skipping least + coalesce preference -------------------------
@_q(
    "a3_earliest_date",
    f"""{_CTE_PREFIX}
    SELECT doc_id,
           least(warc_ts::DATE,
                 CASE WHEN doc_id % 2 = 0 THEN (warc_ts + INTERVAL 5 DAY)::DATE END,
                 CASE WHEN doc_id % 7 = 0 THEN (warc_ts - INTERVAL 3 DAY)::DATE END
           )::VARCHAR AS earliest
    FROM pages ORDER BY doc_id""",
)
def a3_earliest_date(spark, sf):
    p = _pages(spark, sf)
    d1 = F.col("warc_ts").cast("date")
    d2 = F.when(F.col("doc_id") % 2 == 0, F.date_add(d1, 5))
    d3 = F.when(F.col("doc_id") % 7 == 0, F.date_sub(d1, 3))
    return p.select(
        "doc_id", F.least(d1, d2, d3).cast("string").alias("earliest")
    ).orderBy("doc_id")


# -- A5: year-range compaction (islands & gaps) ---------------------------------------------------
@_q(
    "a5_year_ranges",
    """WITH yrs AS (
      SELECT DISTINCT o_orderpriority AS grp, year(o_orderdate) AS y FROM orders
    ), isl AS (
      SELECT grp, y, y - row_number() OVER (PARTITION BY grp ORDER BY y) AS island
      FROM yrs
    ), rng AS (
      SELECT grp, min(y) AS y0, max(y) AS y1 FROM isl GROUP BY grp, island
    )
    SELECT grp,
           string_agg(CASE WHEN y0 = y1 THEN y0::VARCHAR
                           ELSE y0::VARCHAR || '-' || y1::VARCHAR END,
                      ', ' ORDER BY y0) AS year_ranges
    FROM rng GROUP BY grp ORDER BY grp""",
)
def a5_year_ranges(spark, sf):
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    yrs = orders.select(
        F.col("o_orderpriority").alias("grp"), F.year("o_orderdate").alias("y")
    ).distinct()
    w = Window.partitionBy("grp").orderBy("y")
    isl = yrs.withColumn("island", F.col("y") - F.row_number().over(w))
    rng = isl.groupBy("grp", "island").agg(
        F.min("y").alias("y0"), F.max("y").alias("y1")
    )
    rstr = F.when(F.col("y0") == F.col("y1"), F.col("y0").cast("string")).otherwise(
        F.concat(F.col("y0").cast("string"), F.lit("-"), F.col("y1").cast("string"))
    )
    return (
        rng.select("grp", F.struct("y0", rstr.alias("s")).alias("pair"))
        .groupBy("grp")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("pair")), lambda x: x["s"]),
                ", ",
            ).alias("year_ranges")
        )
        .orderBy("grp")
    )


# -- A6: page count from range --------------------------------------------------------------------
@_q(
    "a6_page_count_arith",
    f"""{_CTE_PREFIX}
    SELECT doc_id, (doc_id % 10 + 1)::INT AS page_nr FROM documents ORDER BY doc_id""",
)
def a6_page_count_arith(spark, sf):
    docs = _docs(spark, sf).select(
        "doc_id",
        (F.col("doc_id") % 50 + 1).alias("fpage"),
        (F.col("doc_id") % 50 + 1 + F.col("doc_id") % 10).alias("lpage"),
    )
    return docs.select(
        "doc_id", T.page_nr_from_range("fpage", "lpage").alias("page_nr")
    ).orderBy("doc_id")


# -- U2/O2: union + distinct + sort (exploded to scalar rows) --------------------------------------
@_q(
    "u2_union_distinct",
    f"""{_CTE_PREFIX}
    SELECT DISTINCT doc_id, tok FROM (
      SELECT doc_id, unnest(string_split(substr({_NORM_SQL}, 1, 60), ' ')) AS tok
      FROM documents
    ) WHERE tok <> '' ORDER BY doc_id, tok""",
)
def u2_union_distinct(spark, sf):
    docs = _docs(spark, sf)
    toks = F.split(F.substring(D.normalize_text("text"), 1, 60), " ")
    return (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
        .orderBy("doc_id", "tok")
    )


# -- S13/C21: JSON extraction ------------------------------------------------------------------------
@_q(
    "s13_json_extract",
    """SELECT event_id, json_extract_string(props, '$.k')::INT AS k
    FROM events ORDER BY event_id""",
)
def s13_json_extract(spark, sf):
    ev = _events(spark, sf)
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
    ).orderBy("event_id")


# -- W1: tumbling-window aggregation (batch twin of the streaming op) --------------------------------
@_q(
    "w1_tumbling_window",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win,
              event_type, count(*) AS n, round(sum(value), 3) AS total
    FROM events GROUP BY 1, 2 ORDER BY win, event_type""",
)
def w1_tumbling_window(spark, sf):
    ev = _events(spark, sf)
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("win"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 3).alias("total"))
        .orderBy("win", "event_type")
    )


# -- X1: exact dedup ------------------------------------------------------------------------------------
@_q(
    "x1_exact_dedup",
    f"""WITH hashed AS (
      SELECT doc_id, md5({_NORM_SQL}) AS content_md5 FROM documents
    )
    SELECT content_md5, min(doc_id) AS keep_id, count(*) AS dup_count
    FROM hashed GROUP BY content_md5 ORDER BY content_md5""",
)
def x1_exact_dedup(spark, sf):
    return D.exact_dedup(_docs(spark, sf)).orderBy("content_md5")


_SHINGLE_CTE = f"""toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i.i:i.i+2], ' ') AS shingle
      FROM toks, unnest(range(1, len(t) - 1)) AS i(i)
      WHERE len(t) >= 3
    )"""


# -- X2: n-gram jaccard near-dup pairs ----------------------------------------------------------------
@_q(
    "x2_ngram_jaccard",
    f"""WITH {_SHINGLE_CTE},
    sizes AS (SELECT doc_id, count(*) AS set_size FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM grams a JOIN grams b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(round(inter / (sa.set_size + sb.set_size - inter) * 1e6)
                AS BIGINT) AS jaccard_ppm
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE inter / (sa.set_size + sb.set_size - inter) >= 0.5
    ORDER BY id_a, id_b""",
)
def x2_ngram_jaccard(spark, sf):
    pairs = D.ngram_jaccard_pairs(_docs(spark, sf), threshold=0.5)
    return pairs.select(
        "id_a", "id_b",
        F.round(F.col("jaccard") * 1e6).cast("long").alias("jaccard_ppm"),
    ).orderBy("id_a", "id_b")


# -- X2b: same with the document-frequency cap (the 100x scale path: one
# stop-shingle shared by k docs would otherwise make a k^2 join bucket).
# Set sizes stay exact; only the intersection join drops shingles with
# df > cap — mirrored exactly in the oracle.
@_q(
    "x2b_ngram_jaccard_capped",
    f"""WITH {_SHINGLE_CTE},
    sizes AS (SELECT doc_id, count(*) AS set_size FROM grams GROUP BY doc_id),
    rare AS (SELECT shingle FROM grams GROUP BY shingle HAVING count(*) <= 8),
    capped AS (SELECT g.* FROM grams g JOIN rare r ON g.shingle = r.shingle),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(round(inter / (sa.set_size + sb.set_size - inter) * 1e6)
                AS BIGINT) AS jaccard_ppm
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE inter / (sa.set_size + sb.set_size - inter) >= 0.5
    ORDER BY id_a, id_b""",
)
def x2b_ngram_jaccard_capped(spark, sf):
    pairs = D.ngram_jaccard_pairs(
        _docs(spark, sf), threshold=0.5, max_shingle_df=8
    )
    return pairs.select(
        "id_a", "id_b",
        F.round(F.col("jaccard") * 1e6).cast("long").alias("jaccard_ppm"),
    ).orderBy("id_a", "id_b")


# -- X3: minhash signatures -------------------------------------------------------------------------------
_MH_N = 8


def _sig_select() -> str:
    h = "(('0x' || substr(md5(shingle), 1, 7))::BIGINT)"
    cols = ", ".join(
        f"min(({h} * {2 * i + 1} + {i * i + 1}) % 2147483647) AS mh{i}"
        for i in range(_MH_N)
    )
    return f"SELECT doc_id, {cols} FROM grams GROUP BY doc_id"


@_q(
    "x3_minhash_signatures",
    f"""WITH {_SHINGLE_CTE}
    {_sig_select()} ORDER BY doc_id""",
)
def x3_minhash_signatures(spark, sf):
    return D.minhash_signatures(_docs(spark, sf), num_hashes=_MH_N).orderBy("doc_id")


# -- X3b: minhash LSH candidate pairs ------------------------------------------------------------------------
@_q(
    "x3b_minhash_lsh_candidates",
    # bands of 2 rows over the 8 signatures above
    f"""WITH {_SHINGLE_CTE},
    sig AS ({_sig_select()}),
    buckets AS (
      SELECT doc_id, 0 AS band, md5(mh0::VARCHAR || '_' || mh1::VARCHAR) AS bucket FROM sig
      UNION ALL
      SELECT doc_id, 1, md5(mh2::VARCHAR || '_' || mh3::VARCHAR) FROM sig
      UNION ALL
      SELECT doc_id, 2, md5(mh4::VARCHAR || '_' || mh5::VARCHAR) FROM sig
      UNION ALL
      SELECT doc_id, 3, md5(mh6::VARCHAR || '_' || mh7::VARCHAR) FROM sig
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ORDER BY id_a, id_b""",
)
def x3b_minhash_lsh_candidates(spark, sf):
    return D.minhash_lsh_candidates(
        _docs(spark, sf), num_hashes=_MH_N, bands=4
    ).orderBy("id_a", "id_b")


# -- X22: the LSH VERIFY step (candidate-bounded exact jaccard) ---------------
# Composes the x3b candidate construction with the x2 exact-jaccard math:
# exact jaccard computed ONLY over the LSH candidate pairs, thresholded —
# the step that stops a lucky band collision from chaining unrelated docs
# into one dedup component. jaccard emitted as ppm integers (see x2).
@_q(
    "x22_lsh_verified_pairs",
    f"""WITH {_SHINGLE_CTE},
    sig AS ({_sig_select()}),
    buckets AS (
      SELECT doc_id, 0 AS band, md5(mh0::VARCHAR || '_' || mh1::VARCHAR) AS bucket FROM sig
      UNION ALL
      SELECT doc_id, 1, md5(mh2::VARCHAR || '_' || mh3::VARCHAR) FROM sig
      UNION ALL
      SELECT doc_id, 2, md5(mh4::VARCHAR || '_' || mh5::VARCHAR) FROM sig
      UNION ALL
      SELECT doc_id, 3, md5(mh6::VARCHAR || '_' || mh7::VARCHAR) FROM sig
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS set_size FROM grams GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS inter
      FROM cand c
      JOIN grams a ON a.doc_id = c.id_a
      JOIN grams b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT i.id_a, i.id_b,
           CAST(round(i.inter / (sa.set_size + sb.set_size - i.inter) * 1e6)
                AS BIGINT) AS jaccard_ppm
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.inter / (sa.set_size + sb.set_size - i.inter) >= 0.3
    ORDER BY i.id_a, i.id_b""",
)
def x22_lsh_verified_pairs(spark, sf):
    from hepcrawl_spark.operators.dedup import verify_jaccard_pairs

    docs = _docs(spark, sf)
    cands = D.minhash_lsh_candidates(docs, num_hashes=_MH_N, bands=4)
    return (
        verify_jaccard_pairs(docs, cands, threshold=0.3)
        .select(
            "id_a", "id_b",
            F.round(F.col("jaccard") * 1e6).cast("long").alias("jaccard_ppm"),
        )
        .orderBy("id_a", "id_b")
    )


# -- X23: exact substring dedup (Lee et al. 2022 suffix-array pass) -----------
# Synthesized token streams: 10 unique prefix tokens + a 25-token block
# shared by the doc_id%5 group (doubled for doc_id%7==0 docs, so the gate
# covers BOTH cross-document and within-document repetition) + 5 unique
# suffix tokens. W=20 grams: only grams fully inside a shared block repeat;
# the smallest (doc, pos) occurrence owns, every other flagged position's
# 20-token window is removed (interval union). The oracle replays
# stride-1 gram hashing -> windowed (count, min-owner) -> coverage.
_SSD_W = 20


def _substring_dedup_oracle() -> str:
    synth = """
      SELECT doc_id,
             array_to_string(
               list_transform(range(0, 10), i -> 'u' || doc_id || '_' || i)
               || list_transform(range(0, 25),
                                 i -> 's' || (doc_id % 5) || '_' || i)
               || CASE WHEN doc_id % 7 = 0
                       THEN list_transform(range(0, 25),
                                           i -> 's' || (doc_id % 5) || '_' || i)
                       ELSE CAST([] AS VARCHAR[]) END
               || list_transform(range(0, 5), i -> 'v' || doc_id || '_' || i),
               ' ') AS text
      FROM documents"""
    W = _SSD_W
    return f"""WITH t AS ({synth}
    ), nt AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS l,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             x -> x <> ''))::BIGINT AS n
      FROM t
    ), grams AS (
      SELECT nt.doc_id, u.p::BIGINT AS p,
             ('0x' || substr(md5(array_to_string(l[u.p+1 : u.p+{W}], ' ')),
                             1, 15))::BIGINT AS gh
      FROM nt, LATERAL unnest(range(0, greatest(n - {W - 1}, 0))) AS u(p)
    ), marked AS (
      SELECT doc_id, p,
             count(*) OVER (PARTITION BY gh) AS occ,
             min(struct_pack(d := doc_id, p := p)) OVER (PARTITION BY gh) AS own
      FROM grams
    ), flagged AS (
      SELECT doc_id, p FROM marked
      WHERE occ > 1 AND NOT (doc_id = own.d AND p = own.p)
    ), covered AS (
      SELECT DISTINCT f.doc_id, u2.tk
      FROM flagged f, LATERAL unnest(range(f.p, f.p + {W})) AS u2(tk)
    ), s AS (
      SELECT doc_id, count(*)::BIGINT AS n_dup_positions
      FROM flagged GROUP BY doc_id
    ), c AS (
      SELECT doc_id, count(*)::BIGINT AS n_removed_tokens
      FROM covered GROUP BY doc_id
    )
    SELECT nt.doc_id, nt.n AS n_tokens,
           CAST(COALESCE(s.n_dup_positions, 0) AS BIGINT) AS n_dup_positions,
           CAST(COALESCE(c.n_removed_tokens, 0) AS BIGINT) AS n_removed_tokens
    FROM nt LEFT JOIN s USING(doc_id) LEFT JOIN c USING(doc_id)
    ORDER BY doc_id"""


@_q("x23_substring_dedup", _substring_dedup_oracle())
def x23_substring_dedup(spark, sf):
    from hepcrawl_spark.operators.dedup import substring_dedup

    def tok_block(prefix: Column, n: int) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda i: F.concat(prefix, F.lit("_"), i.cast("string")),
        )

    shared = tok_block(
        F.concat(F.lit("s"), (F.col("doc_id") % 5).cast("string")), 25
    )
    parts = F.concat(
        tok_block(F.concat(F.lit("u"), F.col("doc_id").cast("string")), 10),
        F.when(F.col("doc_id") % 7 == 0, shared).otherwise(
            F.array().cast("array<string>")
        ),
        shared,
        tok_block(F.concat(F.lit("v"), F.col("doc_id").cast("string")), 5),
    )
    t = _docs(spark, sf).select(
        "doc_id", F.concat_ws(" ", parts).alias("text")
    )
    return substring_dedup(t, window=_SSD_W).orderBy("doc_id")


# -- X24/X25: DSIR importance weighting + Gumbel top-k resampling -------------
# Xie et al. 2023: fit hashed-ngram count models over a target domain (p)
# and the raw pool (q); weight every raw doc by sum over its unigram+bigram
# occurrences of log p(bucket) - log q(bucket) (add-1 smoothing); resample
# without replacement with probability ∝ w via Gumbel top-k. The oracle
# refits both models in SQL (same md5 bucket hash, same smoothing
# arithmetic — int-exact inputs, so the doubles agree to the bit) and
# rounds log-weights to milli-units, coarse enough to absorb the ~1-ulp
# sum-order difference between Spark's per-doc fold and DuckDB's sum().
_DSIR_B = 512
_DSIR_TGT = ("src0", "src1", "src2")
_DSIR_K = 64


def _dsir_score_cte() -> str:
    tgt = "source IN ('src0', 'src1', 'src2')"
    return f"""toks AS (
      SELECT doc_id, source, string_split({_NORM_SQL}, ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id, source, u.g AS gram FROM toks, LATERAL unnest(t) AS u(g)
      UNION ALL
      SELECT doc_id, source, t[i.i] || ' ' || t[i.i+1] AS gram
      FROM toks, LATERAL unnest(range(1, len(t))) AS i(i)
    ), bkt AS (
      SELECT doc_id, source,
             (('0x' || substr(md5(gram), 1, 7))::BIGINT) % {_DSIR_B} AS bucket
      FROM grams
    ), tc AS (
      SELECT bucket, count(*)::BIGINT AS c FROM bkt WHERE {tgt} GROUP BY 1
    ), rc AS (
      SELECT bucket, count(*)::BIGINT AS c FROM bkt WHERE NOT {tgt} GROUP BY 1
    ), tot AS (
      SELECT (SELECT COALESCE(sum(c), 0)::BIGINT FROM tc) AS tt,
             (SELECT COALESCE(sum(c), 0)::BIGINT FROM rc) AS rt
    ), ratio AS (
      SELECT b.bucket,
             ln((COALESCE(tc.c, 0) + 1.0) / (tot.tt + {_DSIR_B})) -
             ln((COALESCE(rc.c, 0) + 1.0) / (tot.rt + {_DSIR_B})) AS lr
      FROM (SELECT DISTINCT bucket FROM bkt) b
      LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket), tot
    ), score AS (
      SELECT doc_id, sum(lr) AS logw
      FROM bkt JOIN ratio USING (bucket)
      WHERE NOT {tgt}
      GROUP BY 1
    )"""


def _dsir_split(spark, sf):
    docs = _docs(spark, sf)
    tgt = docs.filter(F.col("source").isin(*_DSIR_TGT))
    raw = docs.filter(~F.col("source").isin(*_DSIR_TGT))
    return tgt, raw


@_q(
    "x24_dsir_weights",
    f"""WITH {_dsir_score_cte()}
    SELECT doc_id, CAST(round(logw * 1000) AS BIGINT) AS logw_milli
    FROM score ORDER BY doc_id""",
)
def x24_dsir_weights(spark, sf):
    from hepcrawl_spark.operators import dsir

    tgt, raw = _dsir_split(spark, sf)
    lr = dsir.dsir_logratio(tgt, raw, num_buckets=_DSIR_B)
    return (
        dsir.dsir_score(raw, lr)
        .select(
            "doc_id",
            F.round(F.col("logw") * 1000).cast("long").alias("logw_milli"),
        )
        .orderBy("doc_id")
    )


@_q(
    "x25_dsir_sample",
    f"""WITH {_dsir_score_cte()},
    keyed AS (
      SELECT doc_id, logw,
             logw - ln(-ln(
               ((('0x' || substr(md5(doc_id::VARCHAR || 'dsir1'), 1, 8))::BIGINT
                 + 0.5) / 4294967296.0)
             )) AS k
      FROM score
    ), picked AS (
      SELECT doc_id, logw FROM keyed ORDER BY k DESC, doc_id LIMIT {_DSIR_K}
    )
    SELECT doc_id, CAST(round(logw * 1000) AS BIGINT) AS logw_milli
    FROM picked ORDER BY doc_id""",
)
def x25_dsir_sample(spark, sf):
    from hepcrawl_spark.operators import dsir

    tgt, raw = _dsir_split(spark, sf)
    lr = dsir.dsir_logratio(tgt, raw, num_buckets=_DSIR_B)
    scored = dsir.dsir_score(raw, lr)
    return (
        dsir.dsir_sample(scored, _DSIR_K, seed="dsir1")
        .select(
            "doc_id",
            F.round(F.col("logw") * 1000).cast("long").alias("logw_milli"),
        )
        .orderBy("doc_id")
    )


# -- X30: BM25 keyword search (operators/search.py) ---------------------------
# Inverted-index build + Lucene-BM25 ranked retrieval. The query is the
# corpus's own top-5 df terms (tie-break term asc — deterministic in both
# engines); the oracle rebuilds tf/dl/df/N/avgdl in SQL and replays the
# scoring arithmetic with the SAME literal association ((1.2 + 1.0) is
# COMPUTED in both engines, never folded to 2.2 — the sum sits on a
# round-to-even tie), so every contribution is bit-identical and
# milli-rounding only absorbs the final sum order.
_BM25_CTE = f"""toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents
    ), base AS (
      SELECT doc_id, u.g AS term FROM toks, LATERAL unnest(t) AS u(g)
    ), tf AS (
      SELECT term, doc_id, count(*)::BIGINT AS tf FROM base GROUP BY 1, 2
    ), dl AS (
      SELECT doc_id, count(*)::BIGINT AS dl FROM base GROUP BY 1
    ), dft AS (
      SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1
    ), stats AS (
      SELECT (SELECT count(*) FROM dl)::BIGINT AS n,
             (SELECT sum(dl) FROM dl)::BIGINT AS total
    ), qterms AS (
      SELECT term FROM dft ORDER BY df DESC, term LIMIT 5
    ), contrib AS (
      SELECT tf.doc_id,
             ln(1.0 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
               * (tf.tf * (1.2 + 1.0)
                  / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                                    / (stats.total * 1.0 / stats.n)))) AS c
      FROM tf
      JOIN qterms USING (term) JOIN dft USING (term) JOIN dl USING (doc_id),
      stats
    ), s AS (
      SELECT doc_id, sum(c) AS score FROM contrib GROUP BY 1
    ), bmr AS (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM s
    )"""


@_q(
    "x30_bm25",
    f"""WITH {_BM25_CTE}
    SELECT CAST(0 AS BIGINT) AS query_id, doc_id,
           CAST(round(score * 1000) AS BIGINT) AS bm25_milli, rank
    FROM bmr WHERE rank <= 10 ORDER BY rank""",
)
def x30_bm25(spark, sf):
    from hepcrawl_spark.operators.search import bm25_topk, build_bm25_index

    idx = build_bm25_index(_docs(spark, sf))
    qterms = (
        idx.postings.select("term", "df")
        .distinct()
        .orderBy(F.col("df").desc(), "term")
        .limit(5)
        .select(F.lit(0).cast("long").alias("query_id"), "term")
    )
    return (
        bm25_topk(idx, qterms, k=10)
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("score") * 1000).cast("long").alias("bm25_milli"),
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("rank")
    )


# -- X31: reciprocal-rank fusion (hybrid keyword + semantic retrieval) --------
# RRF (Cormack et al. 2009) over two top-10 lists for one query: the x30
# BM25 ranking and a deterministic stand-in "semantic" ranking (docs by
# md5(text) — rank-only input is the whole point of RRF, so any ranked
# list exercises it). Each doc appears in <= 2 lists, so the fused score
# 1/(60+r1) + 1/(60+r2) is a <= 2-addend IEEE sum — bit-identical across
# engines with NO rounding slack needed; nano-rounding is cosmetic.
@_q(
    "x31_rrf_hybrid",
    f"""WITH {_BM25_CTE}, bmtop AS (
      SELECT doc_id, rank FROM bmr WHERE rank <= 10
    ), semtop AS (
      SELECT doc_id, rank FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY md5(text), doc_id) AS rank
        FROM documents
      ) WHERE rank <= 10
    ), u AS (
      SELECT doc_id, rank FROM bmtop
      UNION ALL SELECT doc_id, rank FROM semtop
    ), f AS (
      SELECT doc_id, sum(1.0 / (60.0 + rank)) AS sc,
             count(*)::BIGINT AS n_lists
      FROM u GROUP BY 1
    ), fr AS (
      SELECT doc_id, sc, n_lists,
             row_number() OVER (ORDER BY sc DESC, doc_id) AS rank
      FROM f
    )
    SELECT CAST(0 AS BIGINT) AS query_id, doc_id,
           CAST(round(sc * 1000000000) AS BIGINT) AS rrf_nano,
           n_lists, rank
    FROM fr WHERE rank <= 10 ORDER BY rank""",
)
def x31_rrf_hybrid(spark, sf):
    from hepcrawl_spark.operators.search import (
        bm25_topk,
        build_bm25_index,
        rrf_fuse,
    )

    docs = _docs(spark, sf)
    idx = build_bm25_index(docs)
    qterms = (
        idx.postings.select("term", "df")
        .distinct()
        .orderBy(F.col("df").desc(), "term")
        .limit(5)
        .select(F.lit(0).cast("long").alias("query_id"), "term")
    )
    bm = bm25_topk(idx, qterms, k=10).select("query_id", "doc_id", "rank")
    sem = (
        docs.select(
            F.lit(0).cast("long").alias("query_id"),
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.md5("text"), F.col("doc_id")))
            .alias("rank"),
        )
        .filter(F.col("rank") <= 10)
    )
    return (
        rrf_fuse([bm, sem], k=10, c=60)
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("rrf_score") * 1000000000).cast("long").alias("rrf_nano"),
            F.col("n_lists").cast("long").alias("n_lists"),
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("rank")
    )


# -- X29: per-host quality rollup (operators/textstats.py) --------------------
# The crawl-operator dashboard: one fused groupBy(host) computing doc
# counts, token totals, langid fractions and exact-dup fractions as pure
# integers (counts + integer-division ppm) — bit-stable across engines.
# Hosts come from doc_id%20; doc_id%11 docs share one of five 'copy K'
# bodies so the dup fraction is nonzero and host-dependent.
@_q(
    "x29_host_rollup",
    f"""WITH t AS (
      SELECT 'h' || (doc_id % 20) AS host,
             CASE WHEN doc_id % 11 = 0 THEN 'copy ' || (doc_id % 5)
                  ELSE text END AS text
      FROM documents
    ), sig AS (
      SELECT host, text,
             len(string_split({_NORM_SQL}, ' ')) AS n_ws,
             (len(list_filter(string_split({_NORM_SQL}, ' '),
                              x -> list_contains(
               [{",".join("'" + w + "'" for w in X.EN_STOPWORDS)}], x)))
              * 1.0 / len(string_split({_NORM_SQL}, ' '))) >= 0.08 AS is_en
      FROM t
    )
    SELECT host,
           count(*) AS n_docs,
           CAST(sum(n_ws) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
           CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS en_ppm,
           CAST((count(*) - count(DISTINCT md5(text))) * 1000000
                // count(*) AS BIGINT) AS dup_ppm
    FROM sig GROUP BY host ORDER BY host""",
)
def x29_host_rollup(spark, sf):
    from hepcrawl_spark.operators.textstats import host_quality_rollup

    t = _docs(spark, sf).select(
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string")).alias("host"),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit("copy "), (F.col("doc_id") % 5).cast("string")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return (
        host_quality_rollup(t)
        .select("host", "n_docs", "n_tokens", "n_en", "en_ppm", "dup_ppm")
        .orderBy("host")
    )


# -- X28: product-quantization encode + ADC scoring (operators/pq.py) ---------
# The PQ kernel gated with ORACLE-REPLAYABLE codebooks (linear_codebooks'
# arithmetic grid stands in for the k-means-trained ones, which the pytest
# suite covers): normalize -> per-subspace L2 argmin encode -> per-query
# inner-product LUT -> gather-sum ADC estimate, exactly the FAISS IndexPQ
# asymmetric-distance pipeline. The oracle replays normalization, argmin
# (same d2-then-index tie-break), LUT build and gather in SQL; milli-
# rounding absorbs gather-vs-sum order ulps.
_PQ_M, _PQ_K, _PQ_D = 4, 4, 16  # 4 subspaces x 16 dims, 4 centroids each


@_q(
    "x28_pq_adc",
    f"""WITH nrm AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
               AS n
      FROM embeddings
    ), vn AS (
      SELECT vec_id,
             list_transform(v, x -> x / greatest(n, 1e-12)) AS v
      FROM nrm
    ), cent AS (
      SELECT j.j AS j, c.c AS c, d.d AS d,
             ((7 * j.j + 11 * c.c + 13 * d.d) % 19 - 9) / 10.0 AS w
      FROM range({_PQ_M}) j(j), range({_PQ_K}) c(c), range({_PQ_D}) d(d)
    ), dist AS (
      SELECT vn.vec_id, cent.j, cent.c,
             sum((v[cent.j * {_PQ_D} + cent.d + 1] - cent.w)
                 * (v[cent.j * {_PQ_D} + cent.d + 1] - cent.w)) AS d2
      FROM vn, cent GROUP BY 1, 2, 3
    ), code AS (
      SELECT vec_id, j, c FROM (
        SELECT vec_id, j, c,
               row_number() OVER (PARTITION BY vec_id, j
                                  ORDER BY d2, c) AS rn
        FROM dist
      ) WHERE rn = 1
    ), lut AS (
      SELECT vn.vec_id AS query_id, cent.j, cent.c,
             sum(v[cent.j * {_PQ_D} + cent.d + 1] * cent.w) AS ip
      FROM vn, cent WHERE vn.vec_id < 5 GROUP BY 1, 2, 3
    ), adc AS (
      SELECT l.query_id, k.vec_id AS neighbor_id, sum(l.ip) AS adc
      FROM code k JOIN lut l ON l.j = k.j AND l.c = k.c
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id,
           CAST(round(adc * 1000) AS BIGINT) AS adc_milli
    FROM adc WHERE query_id <> neighbor_id
    ORDER BY query_id, neighbor_id""",
)
def x28_pq_adc(spark, sf):
    from hepcrawl_spark.operators import pq as PQ

    emb = _emb(spark, sf)
    books = PQ.linear_codebooks(_PQ_M, _PQ_K, _PQ_D)
    codes = PQ.pq_encode(emb, books)
    out = PQ.adc_topk(codes, emb.filter("vec_id < 5"), books, k=10_000_000)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("adc") * 1000).cast("long").alias("adc_milli"),
    ).orderBy("query_id", "neighbor_id")


# -- X27: CCNet-style LM perplexity (hashed add-1 bigram model) ---------------
# Wenzek et al. 2020 re-expressed relationally: fit unigram+bigram bucket
# counts on the target sources, score every raw-pool doc by bigram
# cross-entropy via a broadcast fold (operators/perplexity.py). The oracle
# refits both count vectors in SQL from the shared _NORM_SQL tokens and
# the same md5 bucket hash; int-exact counts make each ln() term
# bit-identical, and milli-rounding absorbs the fold-vs-sum order ulp
# (the x24 convention).
@_q(
    "x27_lm_perplexity",
    f"""WITH toks AS (
      SELECT doc_id, source, string_split({_NORM_SQL}, ' ') AS t FROM documents
    ), uni AS (
      SELECT (('0x' || substr(md5(u.g), 1, 7))::BIGINT) % {_DSIR_B} AS bucket,
             count(*)::BIGINT AS c
      FROM toks, LATERAL unnest(t) AS u(g)
      WHERE source IN ('src0', 'src1', 'src2') GROUP BY 1
    ), bi AS (
      SELECT (('0x' || substr(md5(t[i.i] || ' ' || t[i.i+1]), 1, 7))::BIGINT)
               % {_DSIR_B} AS bucket,
             count(*)::BIGINT AS c
      FROM toks, LATERAL unnest(range(1, len(t))) AS i(i)
      WHERE source IN ('src0', 'src1', 'src2') GROUP BY 1
    ), pairs AS (
      SELECT doc_id,
             (('0x' || substr(md5(t[i.i]), 1, 7))::BIGINT) % {_DSIR_B} AS cb,
             (('0x' || substr(md5(t[i.i] || ' ' || t[i.i+1]), 1, 7))::BIGINT)
               % {_DSIR_B} AS bb
      FROM toks, LATERAL unnest(range(1, len(t))) AS i(i)
      WHERE source NOT IN ('src0', 'src1', 'src2')
    ), score AS (
      SELECT doc_id, count(*)::BIGINT AS n_bigrams,
             sum(ln((COALESCE(bi.c, 0) + 1.0)
                    / (COALESCE(uni.c, 0) + 1.0 * {_DSIR_B}))) AS s
      FROM pairs
      LEFT JOIN uni ON uni.bucket = pairs.cb
      LEFT JOIN bi ON bi.bucket = pairs.bb
      GROUP BY 1
    )
    SELECT r.doc_id,
           COALESCE(s.n_bigrams, 0) AS n_bigrams,
           CASE WHEN s.n_bigrams > 0
                THEN CAST(round(-s.s / s.n_bigrams * 1000) AS BIGINT) END
             AS ce_milli
    FROM (SELECT doc_id FROM documents
          WHERE source NOT IN ('src0', 'src1', 'src2')) r
    LEFT JOIN score s USING (doc_id)
    ORDER BY r.doc_id""",
)
def x27_lm_perplexity(spark, sf):
    from hepcrawl_spark.operators import perplexity as PX

    tgt, raw = _dsir_split(spark, sf)
    model = PX.fit_bigram_lm(tgt, num_buckets=_DSIR_B)
    return (
        PX.lm_score(raw, model)
        .select(
            "doc_id",
            "n_bigrams",
            F.round(F.col("cross_entropy") * 1000).cast("long").alias("ce_milli"),
        )
        .orderBy("doc_id")
    )


# -- X4: simhash fingerprints ----------------------------------------------------------------------------------
_SH_BITS = 16


def _simhash_oracle() -> str:
    h = "(('0x' || substr(md5(tok), 1, 15))::BIGINT)"
    votes = ", ".join(
        f"sum(CASE WHEN ({h} >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(_SH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(_SH_BITS)
    )
    return f"""WITH toks AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents
    ), agg AS (SELECT doc_id, {votes} FROM toks GROUP BY doc_id)
    SELECT doc_id, ({fp})::BIGINT AS simhash FROM agg ORDER BY doc_id"""


@_q("x4_simhash", _simhash_oracle())
def x4_simhash(spark, sf):
    return D.simhash(_docs(spark, sf), bits=_SH_BITS).orderBy("doc_id")


# -- X12: SimHash banded candidate pairs -------------------------------------
# The Google web-dedup construction over the x4 fingerprints: band-chunk
# equality self-join, then hamming filter via bit_count(xor). The oracle
# reproduces chunking, pigeonhole bucketing, and the hamming cutoff in SQL.
def _simhash_pairs_oracle(bands: int = 4, max_hamming: int = 3) -> str:
    w = _SH_BITS // bands
    mask = (1 << w) - 1
    sh = _simhash_oracle().rsplit("SELECT", 1)[0]  # keep the toks/agg CTEs
    fp = _simhash_oracle().rsplit("SELECT", 1)[1].replace(" ORDER BY doc_id", "")
    chunks = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, (simhash >> {b * w}) & {mask} AS chunk FROM fp"
        for b in range(bands)
    )
    return f"""{sh}, fp AS (SELECT{fp}), chunks AS ({chunks}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM chunks a JOIN chunks b
        ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
    )
    SELECT p.id_a, p.id_b,
           CAST(bit_count(xor(fa.simhash, fb.simhash)) AS BIGINT) AS hamming
    FROM pairs p
    JOIN fp fa ON fa.doc_id = p.id_a
    JOIN fp fb ON fb.doc_id = p.id_b
    WHERE bit_count(xor(fa.simhash, fb.simhash)) <= {max_hamming}
    ORDER BY id_a, id_b"""


@_q("x12_simhash_candidates", _simhash_pairs_oracle())
def x12_simhash_candidates(spark, sf):
    return (
        D.simhash_candidates(
            _docs(spark, sf), bits=_SH_BITS, bands=4, max_hamming=3
        )
        .withColumn("hamming", F.col("hamming").cast("long"))
        .orderBy("id_a", "id_b")
    )


# -- X5: brute-force cosine top-k ---------------------------------------------------------------------------------
# -- X5c: LSH hyperplane signatures (the ANN bucketing step) ------------------
# The signature is fully portable: hyperplane weight(b, d) = +-1 by the
# parity of the first 8 md5 hex chars of 'lsh_<b>_<d>', folded in array
# order — so DuckDB reproduces the exact sign sums and bucket ids.
@_q(
    "x5c_lsh_signature",
    """WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), bits AS (SELECT unnest(range(0, 6)) AS b),
    terms AS (
      SELECT vec_id, b,
        list_reduce(
          list_transform(v, (x, i) ->
            x * (CASE WHEN ('0x' || substr(md5('lsh_' || b || '_' || (i - 1)), 1, 8))::BIGINT % 2 = 0
                 THEN 1.0 ELSE -1.0 END)),
          (acc, x) -> acc + x) AS t
      FROM e CROSS JOIN bits
    )
    SELECT vec_id,
           CAST(SUM(CASE WHEN t > 0 THEN (1 << b) ELSE 0 END) AS BIGINT) AS sig
    FROM terms GROUP BY vec_id ORDER BY vec_id""",
)
def x5c_lsh_signature(spark, sf):
    from hepcrawl_spark.operators.similarity import hyperplane_signature

    return (
        _emb(spark, sf)
        .select(
            "vec_id",
            hyperplane_signature("embedding", dim=64, bits=6).cast("long").alias("sig"),
        )
        .orderBy("vec_id")
    )


@_q(
    "x5_cosine_topk",
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.qvec::DOUBLE[], e.embedding::DOUBLE[]) AS cosine
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(round(cosine * 1e6) AS BIGINT) AS cosine_ppm, rank
    FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",
)
def x5_cosine_topk(spark, sf):
    emb = _emb(spark, sf)
    out = S.cosine_topk(emb, emb.filter("vec_id < 8"), k=5)
    return out.select(
        "query_id", "neighbor_id",
        F.round(F.col("cosine") * 1e6).cast("long").alias("cosine_ppm"),
        F.col("rank").cast("long").alias("rank"),
    ).orderBy("query_id", "rank")


# -- X5b: IVF-bucketed ANN (probe only the query's coarse cell) -----------------------------------------------------
@_q(
    "x5b_ivf_topk",
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qvec, label AS cell
               FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.qvec::DOUBLE[], e.embedding::DOUBLE[]) AS cosine
      FROM embeddings e JOIN q ON e.label = q.cell WHERE e.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(round(cosine * 1e6) AS BIGINT) AS cosine_ppm, rank
    FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",
)
def x5b_ivf_topk(spark, sf):
    emb = _emb(spark, sf)
    out = S.ivf_topk(emb, emb.filter("vec_id < 8"), k=5)
    return out.select(
        "query_id", "neighbor_id",
        F.round(F.col("cosine") * 1e6).cast("long").alias("cosine_ppm"),
        F.col("rank").cast("long").alias("rank"),
    ).orderBy("query_id", "rank")


# -- X6: embedding near-dup pairs -------------------------------------------------------------------------------------
@_q(
    "x6_embedding_neardup",
    """WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cosine
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, CAST(round(cosine * 1e6) AS BIGINT) AS cosine_ppm
    FROM pairs WHERE cosine >= 0.3 ORDER BY id_a, id_b""",
)
def x6_embedding_neardup(spark, sf):
    pairs = D.embedding_neardup_pairs(_emb(spark, sf), threshold=0.3)
    return pairs.select(
        "id_a", "id_b",
        F.round(F.col("cosine") * 1e6).cast("long").alias("cosine_ppm")
    ).orderBy("id_a", "id_b")


# -- X7: language-ID score ----------------------------------------------------------------------------------------------
@_q(
    "x7_langid",
    f"""WITH toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents
    )
    SELECT doc_id,
           round(len(list_filter(t, x -> list_contains(
             [{",".join("'" + w + "'" for w in X.EN_STOPWORDS)}], x))) * 1.0
             / len(t), 4) AS en_score
    FROM toks ORDER BY doc_id""",
)
def x7_langid(spark, sf):
    return (
        _docs(spark, sf)
        .select("doc_id", F.round(X.english_score("text"), 4).alias("en_score"))
        .orderBy("doc_id")
    )


# -- X8: token counting ----------------------------------------------------------------------------------------------------
@_q(
    "x8_token_counts",
    f"""SELECT doc_id,
           len(string_split({_NORM_SQL}, ' ')) AS n_ws,
           len(regexp_extract_all(text, '[A-Za-z]{{1,4}}|\\d|[^\\sA-Za-z\\d]')) AS n_bpe
    FROM documents ORDER BY doc_id""",
)
def x8_token_counts(spark, sf):
    return (
        _docs(spark, sf)
        .select(
            "doc_id",
            X.token_count_ws("text").cast("long").alias("n_ws"),
            X.token_count_bpe_ish("text").alias("n_bpe"),
        )
        .orderBy("doc_id")
    )


# -- X9: document fingerprint -------------------------------------------------------------------------------------------------
@_q(
    "x9_fingerprint",
    f"""SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
             string_split({_NORM_SQL}, ' '))), ' ')) AS fp
    FROM documents ORDER BY doc_id""",
)
def x9_fingerprint(spark, sf):
    return (
        _docs(spark, sf)
        .select("doc_id", X.fingerprint("text").alias("fp"))
        .orderBy("doc_id")
    )


# -- X10/X11: connected components + dedup clustering ------------------------
# The transitive-closure stage every pair-producing dedup op feeds
# (operators/components.py, large-star/small-star). Deterministic edge set
# over documents: chains of 10 consecutive doc_ids plus cross-links every
# 40th id back 15 — multi-chain components with diameter > 10 forcing
# several alternation rounds. Oracle = recursive label-propagation CTE
# (min reachable id == component root).
_CC_EDGES_SQL = """
    edges AS (
        SELECT CAST(doc_id AS BIGINT) AS src, CAST(doc_id - 1 AS BIGINT) AS dst
        FROM documents WHERE doc_id % 10 <> 0
        UNION ALL
        SELECT CAST(doc_id AS BIGINT), CAST(doc_id - 15 AS BIGINT)
        FROM documents WHERE doc_id % 40 = 7 AND doc_id >= 15
    ),
    sym AS (
        SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ),
    walk(node, comp) AS (
        SELECT src, src FROM sym
        UNION
        SELECT s.dst, w.comp FROM walk w JOIN sym s ON s.src = w.node
    ),
    cc AS (
        SELECT node, min(comp) AS component FROM walk GROUP BY node
    )"""


def _cc_edges(spark, sf):
    ids = _docs(spark, sf).select(F.col("doc_id").cast("long").alias("doc_id"))
    chain = ids.filter("doc_id % 10 != 0").select(
        F.col("doc_id").alias("src"), (F.col("doc_id") - 1).alias("dst")
    )
    cross = ids.filter("doc_id % 40 = 7 AND doc_id >= 15").select(
        F.col("doc_id").alias("src"), (F.col("doc_id") - 15).alias("dst")
    )
    return chain.unionByName(cross)


@_q(
    "x10_connected_components",
    f"WITH RECURSIVE {_CC_EDGES_SQL}\n"
    "    SELECT node, component FROM cc ORDER BY node",
)
def x10_connected_components(spark, sf):
    from hepcrawl_spark.operators.components import connected_components

    return connected_components(_cc_edges(spark, sf)).orderBy("node")


@_q(
    "x11_dedup_clusters",
    f"WITH RECURSIVE {_CC_EDGES_SQL}\n"
    """
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           COALESCE(cc.component, d.doc_id) AS component,
           CAST(d.doc_id AS BIGINT) = COALESCE(cc.component, d.doc_id)
             AS is_canonical
    FROM documents d LEFT JOIN cc ON CAST(d.doc_id AS BIGINT) = cc.node
    ORDER BY doc_id""",
)
def x11_dedup_clusters(spark, sf):
    from hepcrawl_spark.operators.components import dedup_clusters

    docs = _docs(spark, sf).select(F.col("doc_id").cast("long").alias("doc_id"))
    return (
        dedup_clusters(
            _cc_edges(spark, sf), docs, id_col="doc_id",
            left_col="src", right_col="dst",
        )
        .select("doc_id", "component", "is_canonical")
        .orderBy("doc_id")
    )


# -- X32: leakage-safe train/val split (operators/scrub.py) -------------------
# The split hash is taken on the DEDUP COMPONENT, so near-dup cluster
# members never straddle the train/val boundary — the eval-contamination
# guard every LLM pipeline needs after near-dup clustering. Reuses the
# x10/x11 component machinery; the oracle replays the recursive label
# propagation plus the same md5 split hash.
@_q(
    "x32_leakage_split",
    f"WITH RECURSIVE {_CC_EDGES_SQL}\n"
    """, lab AS (
      SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
             COALESCE(cc.component, d.doc_id) AS component
      FROM documents d LEFT JOIN cc ON CAST(d.doc_id AS BIGINT) = cc.node
    )
    SELECT doc_id, component,
           CASE WHEN (('0x' || substr(md5(component::VARCHAR || 'split1'),
                                      1, 8))::BIGINT) / 4294967296.0 < 0.2
                THEN 'val' ELSE 'train' END AS split
    FROM lab ORDER BY doc_id""",
)
def x32_leakage_split(spark, sf):
    from hepcrawl_spark.operators.components import dedup_clusters
    from hepcrawl_spark.operators.scrub import leakage_safe_split

    docs = _docs(spark, sf).select(F.col("doc_id").cast("long").alias("doc_id"))
    labeled = dedup_clusters(
        _cc_edges(spark, sf), docs, id_col="doc_id",
        left_col="src", right_col="dst",
    )
    return (
        leakage_safe_split(labeled, val_frac=0.2, seed="split1")
        .select("doc_id", "component", "split")
        .orderBy("doc_id")
    )


# -- X14: within-document repetition (RefinedWeb/Gopher repetition rules) ----
# Multi-line text synthesized relationally (a repeated title line, a unique
# md5 line, a footer), run through the real explode/groupBy operator; the
# oracle recomputes the same statistics via unnest in DuckDB.
@_q(
    "x14_repetition",
    f"""WITH t AS (
      SELECT doc_id,
             'title ' || (doc_id % 50) || chr(10) || md5(text) || chr(10) ||
             'title ' || (doc_id % 50) || chr(10) || 'all rights reserved'
               AS text
      FROM documents
    ), l AS (
      SELECT doc_id, trim(u.x) AS line
      FROM t, unnest(string_split(t.text, chr(10))) AS u(x)
      WHERE length(trim(u.x)) > 0
    ), pl AS (
      SELECT doc_id, line, count(*) AS cnt FROM l GROUP BY doc_id, line
    )
    SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_lines, count(*) AS n_unique_lines,
           CAST(round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::DOUBLE
                 / sum(cnt) * 1e6) AS BIGINT) AS dup_line_ppm,
           CAST(round(sum(CASE WHEN cnt > 1 THEN length(line) * cnt ELSE 0 END)::DOUBLE
                 / sum(length(line) * cnt) * 1e6) AS BIGINT) AS dup_char_ppm
    FROM pl GROUP BY doc_id ORDER BY doc_id""",
)
def x14_repetition(spark, sf):
    # gate output is integer MICRO-UNITS (ppm), not round(x, 6) doubles:
    # Spark's and DuckDB's round() can disagree in the double's last ulp,
    # which the driver's exact value hash sees as a mismatch even though the
    # values agree at 1e-9 (the round-3 x14 red row). Integers hash stably.
    t = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.lit("title "), (F.col("doc_id") % 50).cast("string"), F.lit("\n"),
            F.md5("text"), F.lit("\n"),
            F.lit("title "), (F.col("doc_id") % 50).cast("string"), F.lit("\n"),
            F.lit("all rights reserved"),
        ).alias("text"),
    )
    return X.repetition_features(t).select(
        "doc_id", "n_lines", "n_unique_lines",
        F.round(F.col("dup_line_frac") * 1e6).cast("long").alias("dup_line_ppm"),
        F.round(F.col("dup_char_frac") * 1e6).cast("long").alias("dup_char_ppm"),
    ).orderBy("doc_id")


# -- X15: Gopher top-n-gram repetition ---------------------------------------
# Word-bigram repetition over the real document text (no synthesis needed —
# the operator normalizes internally). Oracle builds the same bigrams via
# a range join over the token list in DuckDB.
@_q(
    "x15_ngram_repetition",
    f"""WITH t AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), g AS (
      SELECT doc_id, array_to_string(toks[i:i + 1], ' ') AS gram
      FROM (
        SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        FROM t WHERE len(toks) >= 2
      )
    ), pg AS (
      SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram
    ), agg AS (
      SELECT doc_id,
             sum(length(replace(gram, ' ', '')) * cnt) AS total,
             sum(CASE WHEN cnt > 1 THEN length(replace(gram, ' ', '')) * cnt
                      ELSE 0 END) AS dup
      FROM pg GROUP BY doc_id
    ), mx AS (SELECT doc_id, max(cnt) AS maxc FROM pg GROUP BY doc_id),
    top AS (
      SELECT p.doc_id,
             length(replace(min(p.gram), ' ', '')) * any_value(m.maxc) AS top_chars
      FROM pg p JOIN mx m ON m.doc_id = p.doc_id AND p.cnt = m.maxc
      GROUP BY p.doc_id
    )
    SELECT d.doc_id,
           CAST(round(top.top_chars::DOUBLE / agg.total * 1e6) AS BIGINT)
             AS top_ngram_ppm,
           CAST(round(agg.dup::DOUBLE / agg.total * 1e6) AS BIGINT)
             AS dup_ngram_ppm
    FROM documents d
    LEFT JOIN agg ON agg.doc_id = d.doc_id
    LEFT JOIN top ON top.doc_id = d.doc_id
    ORDER BY d.doc_id""",
)
def x15_ngram_repetition(spark, sf):
    # ppm integers, not 6dp doubles — same hash-stability rationale as x14
    return X.ngram_repetition_features(_docs(spark, sf), n=2).select(
        "doc_id",
        F.round(F.col("top_ngram_char_frac") * 1e6).cast("long").alias("top_ngram_ppm"),
        F.round(F.col("dup_ngram_char_frac") * 1e6).cast("long").alias("dup_ngram_ppm"),
    ).orderBy("doc_id")


# -- X16/X17/X18: training-corpus prep (operators/scrub.py) -------------------
# PII redaction over synthesized text with one email/ip/phone each (the
# oracle predicts the redacted string directly — DuckDB RE2 lacks the
# lookarounds the conservative phone pattern uses); deterministic
# hash-threshold mix sampling (md5 recipe, bit-identical across engines);
# token-window chunking rebuilt in DuckDB via list slices.
@_q(
    "x16_pii_redaction",
    """SELECT doc_id,
           'reach [EMAIL] at [IP] or call [PHONE] today' AS text,
           1 AS n_emails, 1 AS n_ips, 1 AS n_phones
    FROM documents ORDER BY doc_id""",
)
def x16_pii_redaction(spark, sf):
    from hepcrawl_spark.operators.scrub import redact_pii

    synth = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.lit("reach user"), F.col("doc_id").cast("string"),
            F.lit("@mail-"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.org at 10.0."),
            (F.col("doc_id") % 200).cast("string"), F.lit("."),
            (F.col("doc_id") % 250).cast("string"),
            F.lit(" or call +1 555 23"), (F.col("doc_id") % 90 + 10).cast("string"),
            F.lit(" today"),
        ).alias("text"),
    )
    return (
        redact_pii(synth)
        .select("doc_id", "text", "n_emails", "n_ips", "n_phones")
        .orderBy("doc_id")
    )


@_q(
    "x17_mix_sampling",
    """SELECT doc_id, source FROM documents
    WHERE (('0x' || substr(md5(doc_id::VARCHAR || 'mix1'), 1, 8))::BIGINT
           / 4294967296.0)
          < (CASE WHEN source IN ('src0', 'src1', 'src2') THEN 1.0
                  WHEN source IN ('src3', 'src4') THEN 0.35
                  ELSE 0.1 END)
    ORDER BY doc_id""",
)
def x17_mix_sampling(spark, sf):
    from hepcrawl_spark.operators.scrub import sample_by_source

    rates = {"src0": 1.0, "src1": 1.0, "src2": 1.0, "src3": 0.35, "src4": 0.35}
    return (
        sample_by_source(_docs(spark, sf), rates, default_rate=0.1)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@_q(
    "x18_chunking",
    """WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), c AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest(CAST(ceil((len(toks) - 8) / 24.0) AS BIGINT), 1)))
               AS chunk_id
      FROM t
    )
    SELECT doc_id, chunk_id,
           array_to_string(toks[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ')
             AS chunk_text,
           len(toks[chunk_id * 24 + 1 : chunk_id * 24 + 32]) AS n_tokens
    FROM c
    WHERE chunk_id = 0
       OR len(toks[chunk_id * 24 + 1 : chunk_id * 24 + 32]) - 8 >= 1
    ORDER BY doc_id, chunk_id""",
)
def x18_chunking(spark, sf):
    from hepcrawl_spark.operators.scrub import chunk_documents

    return (
        chunk_documents(_docs(spark, sf), chunk_tokens=32, overlap=8)
        .withColumn("chunk_id", F.col("chunk_id").cast("long"))
        .withColumn("n_tokens", F.col("n_tokens").cast("long"))
        .orderBy("doc_id", "chunk_id")
    )


# -- X19: benchmark decontamination ------------------------------------------
# Benchmarks = the first 8 normalized tokens of every 25th document (so
# each benchmark is genuinely CONTAINED in its source doc, plus whatever
# incidental overlaps exist); docs whose shingle sets cover >= 50% of any
# benchmark's shingles are dropped. The oracle replays shingling (x2
# machinery) and the containment anti-join in SQL.
@_q(
    "x19_decontamination",
    f"""WITH {_SHINGLE_CTE},
    bench AS (
      SELECT doc_id AS bench_id,
             array_to_string(t[1:8], ' ') AS btext
      FROM toks WHERE doc_id % 25 = 0 AND len(t) >= 8
    ), btoks AS (
      SELECT bench_id, string_split(btext, ' ') AS t FROM bench
    ), bgrams AS (
      SELECT DISTINCT bench_id, array_to_string(t[i.i:i.i+2], ' ') AS shingle
      FROM btoks, unnest(range(1, len(t) - 1)) AS i(i)
      WHERE len(t) >= 3
    ), bsizes AS (
      SELECT bench_id, count(*) AS bench_size FROM bgrams GROUP BY bench_id
    ), hits AS (
      SELECT DISTINCT g.doc_id
      FROM grams g JOIN bgrams b ON b.shingle = g.shingle
      GROUP BY g.doc_id, b.bench_id
      HAVING count(*) >= 0.5 * (SELECT bench_size FROM bsizes s
                                WHERE s.bench_id = b.bench_id)
    )
    SELECT d.doc_id FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM hits)
    ORDER BY d.doc_id""",
)
def x19_decontamination(spark, sf):
    from hepcrawl_spark.operators.dedup import normalize_text

    docs = _docs(spark, sf)
    toks = F.split(normalize_text("text"), " ")
    bench = (
        docs.filter("doc_id % 25 = 0")
        .select(
            F.col("doc_id").alias("bench_id"),
            F.concat_ws(" ", F.slice(toks, 1, 8)).alias("text"),
            F.size(toks).alias("_n"),
        )
        .filter(F.col("_n") >= 8)
        .drop("_n")
    )
    return (
        D.decontaminate(docs, bench, threshold=0.5)
        .select("doc_id")
        .orderBy("doc_id")
    )


# -- X20: corpus-wide paragraph dedup (RefinedWeb/CCNet boilerplate pass) -----
# Synthesized 3-paragraph docs: a header shared by doc_id%7, a unique md5
# paragraph, a footer shared by ALL docs. Duplicated paragraphs survive only
# in the smallest-id document; text reassembles in original order. The
# oracle replays split -> global min-owner -> keep-first -> string_agg.
@_q(
    "x20_paragraph_dedup",
    """WITH t AS (
      SELECT doc_id, 'shared ' || (doc_id % 7) || chr(10) || chr(10) ||
             'unique ' || md5(text) || chr(10) || chr(10) ||
             'all rights reserved' AS text
      FROM documents
    ), p0 AS (
      SELECT doc_id, arr, unnest(range(1, len(arr) + 1)) AS i
      FROM (SELECT doc_id,
                   regexp_split_to_array(text, '\\n\\s*\\n') AS arr
            FROM t)
    ), p AS (
      SELECT doc_id, i AS pos, trim(arr[i]) AS para
      FROM p0 WHERE length(trim(arr[i])) >= 1
    ), o AS (
      SELECT md5(para) AS phash, min(doc_id) AS keep_doc, count(*) AS n_occ
      FROM p GROUP BY 1
    ), m AS (
      SELECT p.doc_id, p.pos, p.para,
             (o.n_occ = 1 OR p.doc_id = o.keep_doc) AS keep
      FROM p JOIN o ON o.phash = md5(p.para)
    )
    SELECT doc_id,
           coalesce(string_agg(CASE WHEN keep THEN para END,
                               chr(10) || chr(10) ORDER BY pos), '') AS text,
           count(*) AS n_paragraphs,
           CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
    FROM m GROUP BY doc_id ORDER BY doc_id""",
)
def x20_paragraph_dedup(spark, sf):
    from hepcrawl_spark.operators.dedup import paragraph_dedup

    t = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.lit("shared "), (F.col("doc_id") % 7).cast("string"), F.lit("\n\n"),
            F.lit("unique "), F.md5("text"), F.lit("\n\n"),
            F.lit("all rights reserved"),
        ).alias("text"),
    )
    return paragraph_dedup(t).orderBy("doc_id")


# -- X26: anchor-text aggregation (operators/anchors.py) ----------------------
# Deterministic html: every doc links to target doc_id%97 with the target's
# own phrase and to (doc_id*7+3)%97 with one of three 'go K' phrases. The
# rollup dedupes (src_host, target, text) per the anchor-spam guard, counts
# distinct hosts, and picks the dominant phrase (ties -> lexicographically
# smallest). The oracle replays dedup + counts + the window winner in SQL.
@_q(
    "x26_anchor_text",
    """WITH a AS (
      SELECT 'h' || (doc_id % 10) || '.example.org' AS src_host,
             'https://t.example.org/p/' || (doc_id % 97) AS target_url,
             't' || (doc_id % 97) AS anchor_text
      FROM documents
      UNION ALL
      SELECT 'h' || (doc_id % 10) || '.example.org',
             'https://t.example.org/p/' || ((doc_id * 7 + 3) % 97),
             'go ' || (doc_id % 3)
      FROM documents
    ), d AS (
      SELECT DISTINCT src_host, target_url, anchor_text FROM a
    ), c AS (
      SELECT target_url, anchor_text, count(*) AS cnt
      FROM d GROUP BY 1, 2
    ), w AS (
      SELECT target_url, anchor_text,
             row_number() OVER (PARTITION BY target_url
                                ORDER BY cnt DESC, anchor_text) AS rn
      FROM c
    )
    SELECT t.target_url, t.n_anchors, h.n_hosts, w.anchor_text AS top_anchor
    FROM (SELECT target_url, CAST(sum(cnt) AS BIGINT) AS n_anchors
          FROM c GROUP BY 1) t
    JOIN (SELECT target_url,
                 CAST(count(DISTINCT src_host) AS BIGINT) AS n_hosts
          FROM a GROUP BY 1) h USING (target_url)
    JOIN w ON w.target_url = t.target_url AND w.rn = 1
    ORDER BY target_url""",
)
def x26_anchor_text(spark, sf):
    from hepcrawl_spark.operators.anchors import anchor_text_table, extract_anchors

    k1 = (F.col("doc_id") % 97).cast("string")
    k2 = ((F.col("doc_id") * 7 + 3) % 97).cast("string")
    html = F.concat(
        F.lit('<html><body><a href="https://t.example.org/p/'), k1,
        F.lit('">t'), k1, F.lit("</a>"),
        F.lit('<a href="https://t.example.org/p/'), k2,
        F.lit('">go '), (F.col("doc_id") % 3).cast("string"),
        F.lit("</a></body></html>"),
    )
    pages = _docs(spark, sf).select(
        F.concat(
            F.lit("https://h"), (F.col("doc_id") % 10).cast("string"),
            F.lit(".example.org/p/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        html.alias("html"),
    )
    return anchor_text_table(extract_anchors(pages)).orderBy("target_url")


# -- X21: Gopher document-quality rules (Rae et al. 2021 Table A1) ------------
# Real document text shaped per doc_id%4: plain / bullet-list tail / too-
# short / ellipsis-line tail, run through the full rule set. Ratios are RAW
# IEEE divisions of exact ints (bit-identical across engines), emitted as
# floor-ppm integers; floor (unlike round) has no tie cases.
@_q(
    "x21_gopher_rules",
    """WITH t AS (
      SELECT doc_id, CASE CAST(doc_id % 4 AS INTEGER)
        WHEN 0 THEN text
        WHEN 1 THEN text || chr(10) || '- first item' || chr(10) ||
                    '- second item' || chr(10) || '- third item'
        WHEN 2 THEN 'short doc'
        ELSE text || chr(10) || 'to be continued...' || chr(10) ||
             'more coming soon...'
      END AS text FROM documents
    ), w AS (
      SELECT doc_id, text,
        CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words,
        regexp_split_to_array(trim(text), '\\s+') AS words,
        list_filter(string_split(text, chr(10)),
                    l -> length(trim(l)) > 0) AS lines
      FROM t
    ), s AS (
      SELECT doc_id, n_words,
        list_sum(list_transform(words, x -> length(x)))::DOUBLE
          / n_words AS mean_wlen,
        len(regexp_extract_all(text, '#|\\.\\.\\.|…'))
          / greatest(n_words, 1) AS sym,
        len(list_filter(lines,
            l -> regexp_matches(trim(l), '^([-*•]|[0-9]+[.)])\\s')))
          / CAST(greatest(len(lines), 1) AS DOUBLE) AS bullet,
        len(list_filter(lines, l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$')))
          / CAST(greatest(len(lines), 1) AS DOUBLE) AS ell,
        len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
          / CAST(greatest(n_words, 1) AS DOUBLE) AS alpha
      FROM w
    )
    SELECT doc_id, n_words,
      CAST(floor(mean_wlen * 1e6) AS BIGINT) AS mean_wlen_ppm,
      CAST(floor(sym * 1e6) AS BIGINT) AS symbol_ppm,
      CAST(floor(bullet * 1e6) AS BIGINT) AS bullet_ppm,
      CAST(floor(ell * 1e6) AS BIGINT) AS ellipsis_ppm,
      CAST(floor(alpha * 1e6) AS BIGINT) AS alpha_ppm,
      (n_words >= 50 AND n_words <= 100000) AS ok_words,
      (mean_wlen >= 3.0 AND mean_wlen <= 10.0) AS ok_mean_word_len,
      (sym <= 0.1) AS ok_symbols,
      (bullet <= 0.9) AS ok_bullets,
      (ell <= 0.3) AS ok_ellipsis,
      (alpha >= 0.8) AS ok_alpha,
      ((n_words >= 50 AND n_words <= 100000)
       AND (mean_wlen >= 3.0 AND mean_wlen <= 10.0)
       AND sym <= 0.1 AND bullet <= 0.9 AND ell <= 0.3
       AND alpha >= 0.8) AS passes
    FROM s ORDER BY doc_id""",
)
def x21_gopher_rules(spark, sf):
    from hepcrawl_spark.operators.textstats import gopher_rules

    t = _docs(spark, sf).select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0, F.col("text"))
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.col("text"),
                F.lit("\n- first item\n- second item\n- third item"),
            ),
        )
        .when(F.col("doc_id") % 4 == 2, F.lit("short doc"))
        .otherwise(
            F.concat(
                F.col("text"),
                F.lit("\nto be continued...\nmore coming soon..."),
            )
        )
        .alias("text"),
    )
    out = gopher_rules(t)
    ppm = lambda c, a: F.floor(F.col(c) * 1e6).cast("long").alias(a)
    return out.select(
        "doc_id", F.col("n_words").cast("long").alias("n_words"),
        ppm("mean_word_len", "mean_wlen_ppm"),
        ppm("symbol_word_ratio", "symbol_ppm"),
        ppm("bullet_line_frac", "bullet_ppm"),
        ppm("ellipsis_line_frac", "ellipsis_ppm"),
        ppm("alpha_word_frac", "alpha_ppm"),
        "ok_words", "ok_mean_word_len", "ok_symbols", "ok_bullets",
        "ok_ellipsis", "ok_alpha", "passes",
    ).orderBy("doc_id")


# -- X13: PageRank frontier prioritization ------------------------------------
# Damped PageRank over the x10 link graph, fixed 4 iterations so both
# engines compute the identical float sequence; the oracle UNROLLS the
# iterations as chained CTEs (recursive aggregation is non-standard).
# Ranks rounded to 6dp on both sides to absorb summation-order ULPs.
def _pagerank_oracle(k: int = 4, d: float = 0.85) -> str:
    prev = "pr0"
    steps = []
    for i in range(1, k + 1):
        steps.append(f"""pr{i} AS (
        SELECT n.node,
               (1 - {d})/cnt.n + {d} * (
                 COALESCE((SELECT sum(p.rank / dg.deg)
                           FROM {prev} p JOIN deg dg ON dg.src = p.node
                           JOIN sym_e e ON e.src = p.node
                           WHERE e.dst = n.node), 0)
                 + (SELECT COALESCE(sum(p.rank), 0) FROM {prev} p
                    WHERE p.node NOT IN (SELECT src FROM deg)) / cnt.n
               ) AS rank
        FROM nodes n, cnt)""")
        prev = f"pr{i}"
    return f"""WITH {_CC_EDGES_SQL},
    sym_e AS (SELECT DISTINCT src, dst FROM edges),
    nodes AS (
        SELECT src AS node FROM sym_e UNION SELECT dst FROM sym_e
    ),
    cnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM sym_e GROUP BY src),
    pr0 AS (SELECT node, 1.0/cnt.n AS rank FROM nodes, cnt),
    {", ".join(steps)}
    SELECT node, CAST(round(rank * 1e6) AS BIGINT) AS rank_ppm
    FROM {prev} ORDER BY node"""


@_q("x13_pagerank", _pagerank_oracle())
def x13_pagerank(spark, sf):
    from hepcrawl_spark.operators.linkrank import pagerank

    # ppm integers, not 6dp doubles — hash-stable across engines (see x14)
    ranks = pagerank(_cc_edges(spark, sf), damping=0.85, iterations=4)
    return ranks.select(
        "node", F.round(F.col("rank") * 1e6).cast("long").alias("rank_ppm")
    ).orderBy("node")


# -- Q1: TPC-H pricing summary (relational parity check) -------------------------------------------------------------------------
@_q(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              round(avg(l_quantity), 6) AS avg_qty,
              count(*) AS count_order
    FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
)
def q1_pricing_summary(spark, sf):
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# -- Q3: multi-join shipping priority (broadcast dims) ------------------------------------------------------------------------------
@_q(
    "q3_order_revenue",
    """SELECT o.o_orderkey,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
              o.o_orderdate::VARCHAR AS o_orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey LIMIT 20""",
)
def q3_order_revenue(spark, sf):
    c = spark.read.parquet(f"{sf}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = spark.read.parquet(f"{sf}/orders.parquet")
    l = spark.read.parquet(f"{sf}/lineitem.parquet")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "o_orderkey", "revenue", F.col("o_orderdate").cast("string").alias("o_orderdate")
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(20)
    )


# -- F5*: parse-family gates. The bodies are synthesized relationally from
# doc_id, parsed by the REAL pandas-UDF parsers (XML/JSON decode, name
# normalization, date waterfall, error rows), and the oracle pins the
# expected output as a predictive SELECT — a golden-fixture twin in SQL,
# the hard driver signal the parse family lacked through round 3 (byte-
# identical parity vs the reference's own fixtures stays pinned by the
# golden tests in tests/test_parsers_*.py).
@_q(
    "f5_arxiv_parse",
    """SELECT 'https://arxiv.example.org/abs/' || doc_id AS url,
       '2400.' || doc_id AS arxiv_eprint,
       'T ' || doc_id AS title,
       'A b' AS abstract,
       CAST(doc_id % 30 AS INTEGER) AS page_nr,
       'conference paper' AS document_type,
       CAST(1 AS INTEGER) AS n_authors,
       'hep-th nlin.CD' AS categories
    FROM documents WHERE doc_id < 50 ORDER BY url""",
)  # no SQL oracle: XML parsing isn't SQL-expressible
def f5_arxiv_parse(spark, sf):
    docs = _docs(spark, sf).filter(F.col("doc_id") < 50)
    body = F.concat(
        F.lit(
            '<OAI-PMH><GetRecord><record><header><identifier>oai:x:'
        ),
        F.col("doc_id").cast("string"),
        F.lit("</identifier></header><metadata><arXiv><id>2400."),
        F.col("doc_id").cast("string"),
        F.lit("</id><created>2024-01-01</created><authors><author><keyname>Doe</keyname>"
              "<forenames>J.  K.</forenames></author></authors><title>T "),
        F.col("doc_id").cast("string"),
        F.lit("</title><categories>hep-th chao-dyn</categories><comments>"),
        (F.col("doc_id") % 30).cast("string"),
        F.lit(" pages, workshop</comments><abstract> A  b </abstract></arXiv>"
              "</metadata></record></GetRecord></OAI-PMH>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://arxiv.example.org/abs/"), F.col("doc_id").cast("string")).alias("url"),
        F.encode(body, "UTF-8").alias("html"),
    )
    recs = parse_arxiv_pages(pages)
    return recs.select(
        "url", "arxiv_eprint", "title", "abstract", "page_nr", "document_type",
        F.size("authors").alias("n_authors"),
        F.array_join("arxiv_categories", " ").alias("categories"),
    ).orderBy("url")


# -- F5b: JATS parse over synthetic article bodies (predictive oracle) --------------------------------------------------------------------
@_q(
    "f5b_jats_parse",
    """SELECT 'https://wsp.example.org/x/' || doc_id AS url,
       'Title ' || doc_id AS title,
       'A<sub>b</sub> c' AS abstract,
       'NANO' AS journal_title,
       CAST(2014 AS INTEGER) AS year,
       '2014-06-05' AS imprint_date,
       'Doe, John' AS first_author,
       '10.1142/T' || doc_id AS doi
    FROM documents WHERE doc_id < 50 ORDER BY url""",
)
def f5b_jats_parse(spark, sf):
    from hepcrawl_spark.parsers.jats import parse_jats_pages

    docs = _docs(spark, sf).filter(F.col("doc_id") < 50)
    body = F.concat(
        F.lit('<article article-type="research-article"><front><journal-meta>'
              "<journal-title>NANO</journal-title>"
              "<publisher><publisher-name>World Scientific Publishing Company</publisher-name></publisher>"
              '</journal-meta><article-meta><article-id pub-id-type="doi">10.1142/T'),
        F.col("doc_id").cast("string"),
        F.lit('</article-id><title-group><article-title>Title '),
        F.col("doc_id").cast("string"),
        F.lit("</article-title></title-group><contrib-group>"
              '<contrib contrib-type="author"><string-name><given-names>JOHN</given-names>'
              "<surname>DOE</surname></string-name></contrib></contrib-group>"
              '<pub-date pub-type="ppub"><year>2014</year><month>6</month><day>5</day></pub-date>'
              "<volume>9</volume><issue>05</issue>"
              "<abstract>A<sub>b</sub> c</abstract></article-meta></front></article>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://wsp.example.org/x/"), F.col("doc_id").cast("string")).alias("url"),
        F.encode(body, "UTF-8").alias("html"),
    )
    recs = parse_jats_pages(pages)
    return recs.select(
        "url", "title", "abstract", "journal_title", "year", "imprint_date",
        F.element_at(F.col("authors.full_name"), 1).alias("first_author"),
        F.element_at("dois", 1).alias("doi"),
    ).orderBy("url")


# -- F5c/S13: Desy JSONL parse with error-row preservation (predictive oracle) -------------------------------------------------------------------
@_q(
    "f5c_desy_parse",
    """SELECT 'https://s3.example.org/d/' || doc_id || '.jsonl' AS url,
       'T' || doc_id AS title,
       CAST(NULL AS VARCHAR) AS error,
       CAST(NULL AS VARCHAR) AS source_data,
       '10.1000/d' || doc_id AS doi
    FROM documents WHERE doc_id < 50
    UNION ALL
    SELECT 'https://s3.example.org/d/' || doc_id || '.jsonl',
       NULL, 'ValueError: Expecting value: line 1 column 1 (char 0)',
       'not json at all', NULL
    FROM documents WHERE doc_id < 50 AND doc_id % 5 = 0
    ORDER BY url, title NULLS FIRST""",
)
def f5c_desy_parse(spark, sf):
    from hepcrawl_spark.parsers.desy import parse_desy_pages

    docs = _docs(spark, sf).filter(F.col("doc_id") < 50)
    line = F.concat(
        F.lit('{"titles": [{"source": "desy", "title": "T'),
        F.col("doc_id").cast("string"),
        F.lit('"}], "dois": [{"value": "10.1000/d'),
        F.col("doc_id").cast("string"),
        F.lit('"}], "document_type": ["article"]}'),
    )
    # every 5th body gets a malformed second line -> error row preserved (E2)
    body = F.concat(
        line,
        F.when(F.col("doc_id") % 5 == 0, F.lit("\nnot json at all")).otherwise(F.lit("")),
    )
    pages = docs.select(
        F.concat(F.lit("https://s3.example.org/d/"), F.col("doc_id").cast("string"), F.lit(".jsonl")).alias("url"),
        F.encode(body, "UTF-8").alias("html"),
    )
    recs = parse_desy_pages(pages)
    return recs.select(
        "url", "title", "error", "source_data",
        F.element_at("dois", 1).alias("doi"),
    ).orderBy("url", "title")


# -- F5d: Crossref JSON parse (predictive oracle) ------------------------------------------------------------------------------------------------
@_q(
    "f5d_crossref_parse",
    """SELECT 'https://api.crossref.org/works/10.1103/x' || doc_id AS url,
       '10.1103/x' || doc_id AS doi,
       'T' || doc_id AS title,
       'article' AS document_type,
       'J' AS journal_title,
       CAST(2015 AS INTEGER) AS year,
       '2015-11-02' AS imprint_date,
       '100' AS page_start, '110' AS page_end,
       'Doe, J.' AS first_author
    FROM documents WHERE doc_id < 50 ORDER BY url""",
)
def f5d_crossref_parse(spark, sf):
    from hepcrawl_spark.parsers.crossref import parse_crossref_pages

    docs = _docs(spark, sf).filter(F.col("doc_id") < 50)
    body = F.concat(
        F.lit('{"message": {"DOI": "10.1103/x'),
        F.col("doc_id").cast("string"),
        F.lit('", "type": "journal-article", "title": ["T'),
        F.col("doc_id").cast("string"),
        F.lit('"], "volume": "9", "issue": "2", "page": "100-110",'
              ' "publisher": "P", "container-title": ["J"],'
              ' "issued": {"date-parts": [[2015, 11, 2]]},'
              ' "author": [{"family": "Doe", "given": "J"}]}}'),
    )
    pages = docs.select(
        F.concat(F.lit("https://api.crossref.org/works/10.1103/x"), F.col("doc_id").cast("string")).alias("url"),
        F.encode(body, "UTF-8").alias("html"),
    )
    recs = parse_crossref_pages(pages)
    return recs.select(
        "url", "doi", "title", "document_type", "journal_title", "year",
        "imprint_date", "page_start", "page_end",
        F.element_at(F.col("authors.full_name"), 1).alias("first_author"),
    ).orderBy("url")


# -- F5e: MARCXML parse (predictive oracle) -------------------------------------------------------------------------------------------------------
@_q(
    "f5e_marcxml_parse",
    """SELECT 'https://oai.example.org/m/' || doc_id AS url,
       'Title ' || doc_id AS title,
       '2010-01-26' AS date_published,
       'J' AS journal_title,
       CAST(2010 AS INTEGER) AS journal_year,
       '10.1155/m' || doc_id AS doi,
       'Doe, Jane' AS first_author
    FROM documents WHERE doc_id < 50 ORDER BY url""",
)
def f5e_marcxml_parse(spark, sf):
    from hepcrawl_spark.parsers.marcxml import parse_marcxml_pages

    docs = _docs(spark, sf).filter(F.col("doc_id") < 50)
    body = F.concat(
        F.lit('<record><datafield tag="024" ind1="7" ind2=" ">'
              '<subfield code="a">10.1155/m'),
        F.col("doc_id").cast("string"),
        F.lit('</subfield><subfield code="2">DOI</subfield></datafield>'
              '<datafield tag="100"><subfield code="a">Doe, Jane</subfield>'
              '<subfield code="u">Inst A</subfield></datafield>'
              '<datafield tag="245"><subfield code="a">Title '),
        F.col("doc_id").cast("string"),
        F.lit('</subfield></datafield>'
              '<datafield tag="260"><subfield code="b">Pub</subfield>'
              '<subfield code="c">2010-01-26</subfield></datafield>'
              '<datafield tag="773"><subfield code="p">J</subfield>'
              '<subfield code="y">2010</subfield></datafield></record>'),
    )
    pages = docs.select(
        F.concat(F.lit("https://oai.example.org/m/"), F.col("doc_id").cast("string")).alias("url"),
        F.encode(body, "UTF-8").alias("html"),
    )
    recs = parse_marcxml_pages(pages)
    return recs.select(
        "url", "title", "date_published", "journal_title", "journal_year",
        F.element_at("dois", 1).alias("doi"),
        F.element_at(F.col("authors.full_name"), 1).alias("first_author"),
    ).orderBy("url")


# -- F5f: APS JSON parse (predictive oracle) ------------------------------------------------------------------------------------------------------
@_q(
    "f5f_aps_parse",
    """SELECT 'https://api.aps.org/p/' || doc_id AS url,
       '10.1103/a' || doc_id AS doi,
       'T' || doc_id AS title,
       CAST(11 AS INTEGER) AS page_nr,
       'PRX' AS journal_title,
       CAST(2015 AS INTEGER) AS journal_year,
       'OSQAR' AS collab,
       'Inst' AS first_aff
    FROM documents WHERE doc_id < 50 ORDER BY url""",
)
def f5f_aps_parse(spark, sf):
    from hepcrawl_spark.parsers.aps import parse_aps_pages

    docs = _docs(spark, sf).filter(F.col("doc_id") < 50)
    body = F.concat(
        F.lit('{"data": [{"identifiers": {"doi": "10.1103/a'),
        F.col("doc_id").cast("string"),
        F.lit('"}, "title": {"value": "<p>T'),
        F.col("doc_id").cast("string"),
        F.lit('</p>"}, "abstract": {"value": "A"}, "date": "2015-11-02",'
              ' "numPages": 11, "journal": {"abbreviatedName": "PRX"},'
              ' "volume": {"number": "7"}, "issue": {"number": "2"},'
              ' "rights": {"copyrightYear": 2015, "licenses": [{"url": "u"}],'
              ' "copyrightHolders": [{"name": "H"}]},'
              ' "affiliations": [{"id": "a1", "name": "Inst"}],'
              ' "authors": [{"type": "Person", "name": "J Doe",'
              ' "surname": "Doe", "firstname": "J", "affiliationIds": ["a1"]},'
              ' {"type": "Collaboration", "name": "OSQAR"}]}]}'),
    )
    pages = docs.select(
        F.concat(F.lit("https://api.aps.org/p/"), F.col("doc_id").cast("string")).alias("url"),
        F.encode(body, "UTF-8").alias("html"),
    )
    recs = parse_aps_pages(pages)
    return recs.select(
        "url", "doi", "title", "page_nr", "journal_title", "journal_year",
        F.element_at("collaborations", 1).alias("collab"),
        F.element_at(F.element_at("authors", 1)["affiliations"], 1).alias("first_aff"),
    ).orderBy("url")


# -- F5g: NLM parse with pub-status gate (predictive oracle) --------------------------------------------------------------------------------------
@_q(
    "f5g_nlm_parse",
    """SELECT 'https://iop.example.org/n/' || doc_id AS url,
       'T' || doc_id AS title,
       '2015-03' AS date_published,
       '8' AS page_nr,
       CAST(2015 AS INTEGER) AS journal_year,
       '10.1309/n' || doc_id AS doi
    FROM documents WHERE doc_id < 60 AND doc_id % 4 <> 0 ORDER BY url""",
)
def f5g_nlm_parse(spark, sf):
    from hepcrawl_spark.parsers.nlm import parse_nlm_pages

    docs = _docs(spark, sf).filter(F.col("doc_id") < 60)
    status = F.when(F.col("doc_id") % 4 == 0, F.lit("aheadofprint")).otherwise(
        F.lit("ppublish")
    )
    body = F.concat(
        F.lit("<Article><Journal><JournalTitle>JT</JournalTitle>"
              "<Volume>143</Volume><Issue>3</Issue><PubDate PubStatus=\""),
        status,
        F.lit('"><Year>2015</Year><Month>03</Month></PubDate></Journal>'
              "<ArticleTitle>T"),
        F.col("doc_id").cast("string"),
        F.lit("</ArticleTitle><FirstPage>336</FirstPage><LastPage>343</LastPage>"
              '<ArticleIdList><ArticleId IdType="doi">10.1309/n'),
        F.col("doc_id").cast("string"),
        F.lit("</ArticleId></ArticleIdList><AuthorList><Author>"
              "<FirstName>R</FirstName><LastName>Roth</LastName>"
              "</Author></AuthorList></Article>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://iop.example.org/n/"), F.col("doc_id").cast("string")).alias("url"),
        F.encode(body, "UTF-8").alias("html"),
    )
    recs = parse_nlm_pages(pages)  # every 4th is aheadofprint -> dropped (F3)
    return recs.select(
        "url", "title", "date_published", "page_nr", "journal_year",
        F.element_at("dois", 1).alias("doi"),
    ).orderBy("url")


# -- F5h: Elsevier CONSYN parse (predictive oracle) -----------------------------------------------------------------------------------------------
@_q(
    "f5h_elsevier_parse",
    """SELECT 'https://consyn.elsevier.com/e/' || doc_id AS url,
       'ET ' || doc_id AS title,
       'A<sub>b</sub>' AS abstract,
       'full-length article' AS article_type,
       'Nucl. Phys. B' AS journal_title,
       '2020-04-01' AS publication_date,
       CAST(2020 AS INTEGER) AS year,
       '1' AS page_start, '9' AS page_end,
       '10.1016/e' || doc_id AS doi,
       'Doe, J.' AS first_author
    FROM documents WHERE doc_id < 50 ORDER BY url""",
)
def f5h_elsevier_parse(spark, sf):
    from hepcrawl_spark.parsers.elsevier import parse_elsevier_pages

    docs = _docs(spark, sf).filter(F.col("doc_id") < 50)
    body = F.concat(
        F.lit('<doc><RDF><Description><doi>10.1016/e'),
        F.col("doc_id").cast("string"),
        F.lit("</doi><publicationName>Nucl. Phys. B</publicationName>"
              "<volume>958</volume><startingPage>1</startingPage>"
              "<endingPage>9</endingPage><publisher>Elsevier B.V.</publisher>"
              "<coverDisplayDate>1 April 2020</coverDisplayDate>"
              "<licenseLine>CC BY 4.0</licenseLine></Description></RDF>"
              '<article docsubtype="fla"><item-info><aid>'),
        F.col("doc_id").cast("string"),
        F.lit('</aid><copyright type="full-transfer" year="2020">(c) Elsevier</copyright>'
              "</item-info><head><title>ET "),
        F.col("doc_id").cast("string"),
        F.lit("</title><author-group><author><given-name>J</given-name>"
              "<surname>Doe</surname></author><affiliation>"
              "<textfn>Inst X</textfn></affiliation></author-group>"
              "<abstract><abstract-sec><simple-para>A<sub>b</sub></simple-para>"
              "</abstract-sec></abstract></head></article></doc>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://consyn.elsevier.com/e/"), F.col("doc_id").cast("string")).alias("url"),
        F.encode(body, "UTF-8").alias("html"),
    )
    recs = parse_elsevier_pages(pages)
    return recs.select(
        "url", "title", "abstract", "article_type", "journal_title",
        "publication_date", "year", "page_start", "page_end",
        F.element_at("dois", 1).alias("doi"),
        F.element_at(F.col("authors.full_name"), 1).alias("first_author"),
    ).orderBy("url")


# -- F5x: golden-byte parity against the REFERENCE's own fixtures ------------
# Unlike the predictive f5* oracles (which re-state a synthesis recipe), this
# gate parses the reference's OWN fixture bodies (tests/unit/responses/arxiv,
# staged into fixtures/arxiv_golden_pages.parquet by
# tools/make_fixture_tables.py) through the live pandas-UDF path and compares
# scalarized fields against constants derived from the reference's published
# expected output (sample_arxiv_record10_parsed.json) and its test-suite
# assertions (page_nr / document_type / collaborations per feed record, the
# record0 DOI split) — so the driver itself now checks byte-identity against
# reference fixtures, not a recipe both sides share.
_FIXDIR = __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)),
    "fixtures",
)


def _golden_expected(source: str) -> list[dict]:
    import json as _json
    import os as _os

    return _json.load(
        open(_os.path.join(_FIXDIR, f"{source}_golden_expected.json"))
    )


def _golden_oracle(
    source: str, cols: list[tuple[str, str]], order_by: str = "url"
) -> str:
    """VALUES oracle over fixtures/{source}_golden_expected.json — constants
    from the reference's published expected outputs only."""
    exp = _golden_expected(source)

    def lit(v, typ):
        if v is None:
            return f"CAST(NULL AS {typ})"
        if typ == "BIGINT":
            return f"CAST({v} AS BIGINT)"
        if typ == "BOOLEAN":
            return "true" if v else "false"
        s = str(v).replace("'", "''")
        return f"CAST('{s}' AS VARCHAR)"

    rows = ",\n      ".join(
        "(" + ", ".join(lit(r[c], t) for c, t in cols) + ")" for r in exp
    )
    names = ", ".join(c for c, _ in cols)
    return (
        f"SELECT * FROM (VALUES\n      {rows}\n    ) AS t({names})\n"
        f"    ORDER BY {order_by}"
    )


def _golden_masked(recs, source: str, fields):
    """Select url + each field, masked to NULL for fixtures whose expected
    yml omits the field — the reference tests' own `if key in exp`
    discipline ('' and missing both collapse to NULL on both sides)."""
    exp = _golden_expected(source)
    sel = ["url"]
    for name, col in fields:
        with_value = [r["url"] for r in exp if r[name] is not None]
        sel.append(F.when(F.col("url").isin(with_value), col).alias(name))
    return recs.select(*sel).orderBy("url")


_ARX_GOLD_COLS = [
    ("url", "VARCHAR"), ("arxiv_eprint", "VARCHAR"),
    ("page_nr", "BIGINT"), ("document_type", "VARCHAR"),
    ("n_authors", "BIGINT"), ("collabs", "VARCHAR"),
    ("dois_str", "VARCHAR"), ("title_md5", "VARCHAR"),
    ("abstract_md5", "VARCHAR"), ("authors_md5", "VARCHAR"),
    ("preprint_date", "VARCHAR"), ("license_url", "VARCHAR"),
]


@_q(
    "f5x_arxiv_golden",
    _golden_oracle("arxiv", _ARX_GOLD_COLS, order_by="url, arxiv_eprint"),
)
def f5x_arxiv_golden(spark, sf):
    import os as _os

    pages = spark.read.parquet(
        _os.path.join(_FIXDIR, "arxiv_golden_pages.parquet")
    )
    recs = parse_arxiv_pages(pages)
    feed = F.col("url").endswith("/feed")
    r0 = F.col("url").endswith("/record0")
    r10 = F.col("url").endswith("/record10")
    return recs.select(
        "url", "arxiv_eprint",
        F.when(feed, F.col("page_nr").cast("long")).alias("page_nr"),
        F.when(feed | r10, F.col("document_type")).alias("document_type"),
        F.when(r10, F.size("authors").cast("long")).alias("n_authors"),
        F.when(feed, F.concat_ws(",", "collaborations")).alias("collabs"),
        F.when(r0, F.concat_ws(",", "dois")).alias("dois_str"),
        F.when(r10, F.md5(F.encode("title", "UTF-8"))).alias("title_md5"),
        F.when(r10, F.md5(F.encode("abstract", "UTF-8"))).alias("abstract_md5"),
        F.when(
            r10,
            F.md5(
                F.encode(
                    F.concat_ws("|", F.col("authors.full_name")), "UTF-8"
                )
            ),
        ).alias("authors_md5"),
        F.when(r10, F.col("preprint_date")).alias("preprint_date"),
        F.when(r10, F.col("license_url")).alias("license_url"),
    ).orderBy("url", "arxiv_eprint")


_ELS_GOLD_COLS = [
    ("url", "VARCHAR"), ("title_md5", "VARCHAR"), ("abstract_md5", "VARCHAR"),
    ("document_type", "VARCHAR"), ("article_type", "VARCHAR"),
    ("journal_title", "VARCHAR"), ("publication_date", "VARCHAR"),
    ("year_str", "VARCHAR"), ("doi", "VARCHAR"), ("n_authors", "BIGINT"),
    ("authors_md5", "VARCHAR"), ("collabs", "VARCHAR"),
]


@_q("f5y_elsevier_golden", _golden_oracle("elsevier", _ELS_GOLD_COLS))
def f5y_elsevier_golden(spark, sf):
    """Golden-byte parity vs the reference's own Elsevier fixtures: parses
    the staged CONSYN XML bodies (9 cases) through the live pandas-UDF path
    and gates scalarized fields against constants from *_expected.yml."""
    import os as _os

    from hepcrawl_spark.parsers.elsevier import parse_elsevier_pages

    pages = spark.read.parquet(
        _os.path.join(_FIXDIR, "elsevier_golden_pages.parquet")
    )
    recs = parse_elsevier_pages(pages)
    mdz = lambda c: F.md5(F.encode(F.nullif(F.col(c), F.lit("")), "UTF-8"))
    return _golden_masked(
        recs, "elsevier",
        [
            ("title_md5", mdz("title")),
            ("abstract_md5", mdz("abstract")),
            ("document_type", F.nullif(F.col("document_type"), F.lit(""))),
            ("article_type", F.nullif(F.col("article_type"), F.lit(""))),
            ("journal_title", F.nullif(F.col("journal_title"), F.lit(""))),
            ("publication_date", F.nullif(F.col("publication_date"), F.lit(""))),
            ("year_str", F.col("year").cast("string")),
            ("doi", F.element_at("dois", 1)),
            ("n_authors", F.size("authors").cast("long")),
            (
                "authors_md5",
                F.md5(
                    F.encode(
                        F.concat_ws("|", F.col("authors.full_name")), "UTF-8"
                    )
                ),
            ),
            ("collabs", F.concat_ws(",", "collaborations")),
        ],
    )


_CR_GOLD_COLS = [
    ("url", "VARCHAR"), ("doi", "VARCHAR"), ("material", "VARCHAR"),
    ("title_md5", "VARCHAR"), ("document_type", "VARCHAR"),
    ("journal_title", "VARCHAR"), ("journal_volume", "VARCHAR"),
    ("journal_issue", "VARCHAR"), ("year_str", "VARCHAR"),
    ("page_start", "VARCHAR"), ("page_end", "VARCHAR"),
    ("imprint_date", "VARCHAR"), ("n_authors", "BIGINT"),
    ("authors_md5", "VARCHAR"), ("licenses", "VARCHAR"),
]


@_q("f5z_crossref_golden", _golden_oracle("crossref", _CR_GOLD_COLS))
def f5z_crossref_golden(spark, sf):
    """Golden-byte parity vs the reference's own Crossref fixtures (5
    cases, *_expected.yml constants) through the live pandas-UDF path."""
    import os as _os

    from hepcrawl_spark.parsers.crossref import parse_crossref_pages

    pages = spark.read.parquet(
        _os.path.join(_FIXDIR, "crossref_golden_pages.parquet")
    )
    recs = parse_crossref_pages(pages)
    return _golden_masked(
        recs, "crossref",
        [
            ("doi", F.nullif(F.col("doi"), F.lit(""))),
            ("material", F.nullif(F.col("material"), F.lit(""))),
            ("title_md5", F.md5(F.encode(F.nullif(F.col("title"), F.lit("")), "UTF-8"))),
            ("document_type", F.nullif(F.col("document_type"), F.lit(""))),
            ("journal_title", F.nullif(F.col("journal_title"), F.lit(""))),
            ("journal_volume", F.nullif(F.col("journal_volume"), F.lit(""))),
            ("journal_issue", F.nullif(F.col("journal_issue"), F.lit(""))),
            ("year_str", F.col("year").cast("string")),
            ("page_start", F.nullif(F.col("page_start"), F.lit(""))),
            ("page_end", F.nullif(F.col("page_end"), F.lit(""))),
            ("imprint_date", F.nullif(F.col("imprint_date"), F.lit(""))),
            ("n_authors", F.size("authors").cast("long")),
            (
                "authors_md5",
                F.md5(
                    F.encode(
                        F.concat_ws("|", F.col("authors.full_name")), "UTF-8"
                    )
                ),
            ),
            ("licenses", F.concat_ws(",", "license_urls")),
        ],
    )


_APS_GOLD_COLS = [
    ("url", "VARCHAR"), ("title_md5", "VARCHAR"), ("abstract_md5", "VARCHAR"),
    ("artid", "VARCHAR"), ("document_type", "VARCHAR"),
    ("journal_title", "VARCHAR"), ("journal_volume", "VARCHAR"),
    ("journal_issue", "VARCHAR"), ("year_str", "VARCHAR"),
    ("imprint_date", "VARCHAR"), ("n_pages", "BIGINT"),
    ("copyright_holder", "VARCHAR"), ("copyright_year_str", "VARCHAR"),
    ("doi", "VARCHAR"), ("n_authors", "BIGINT"),
    ("authors_md5", "VARCHAR"), ("affs_md5", "VARCHAR"),
]

# unit-separator joins for the author/affiliation digests — must match
# tools/make_fixture_tables.py AFF_SEP/AUTHOR_SEP exactly
_AFF_SEP = "\x1f"
_AUTHOR_SEP = "\x1e"


@_q("f5w_aps_golden", _golden_oracle("aps", _APS_GOLD_COLS))
def f5w_aps_golden(spark, sf):
    """Golden-byte parity vs the reference's own APS JATS fixtures (5
    *_expected.yml cases, tests/unit/responses/aps) through the live
    parse_jats_pages pandas-UDF path. Beyond the scalar fields this also
    digests the per-author raw-affiliation lists (affs_md5), which the
    elsevier/crossref gates don't cover."""
    import os as _os

    from hepcrawl_spark.parsers.jats import parse_jats_pages

    pages = spark.read.parquet(
        _os.path.join(_FIXDIR, "aps_golden_pages.parquet")
    )
    recs = parse_jats_pages(pages)
    mdz = lambda c: F.md5(F.encode(F.nullif(c, F.lit("")), "UTF-8"))
    return _golden_masked(
        recs, "aps",
        [
            ("title_md5", mdz(F.col("title"))),
            ("abstract_md5", mdz(F.col("abstract"))),
            ("artid", F.nullif(F.col("artid"), F.lit(""))),
            ("document_type", F.nullif(F.col("document_type"), F.lit(""))),
            ("journal_title", F.nullif(F.col("journal_title"), F.lit(""))),
            ("journal_volume", F.nullif(F.col("journal_volume"), F.lit(""))),
            ("journal_issue", F.nullif(F.col("journal_issue"), F.lit(""))),
            ("year_str", F.col("year").cast("string")),
            ("imprint_date", F.nullif(F.col("imprint_date"), F.lit(""))),
            ("n_pages", F.col("page_count").cast("long")),
            (
                "copyright_holder",
                F.nullif(F.col("copyright_holder"), F.lit("")),
            ),
            ("copyright_year_str", F.col("copyright_year").cast("string")),
            ("doi", F.element_at("dois", 1)),
            ("n_authors", F.size("authors").cast("long")),
            (
                "authors_md5",
                F.md5(
                    F.encode(
                        F.concat_ws(_AUTHOR_SEP, F.col("authors.full_name")),
                        "UTF-8",
                    )
                ),
            ),
            (
                "affs_md5",
                F.md5(
                    F.encode(
                        F.concat_ws(
                            _AUTHOR_SEP,
                            F.transform(
                                "authors",
                                lambda a: F.concat_ws(
                                    _AFF_SEP, a["affiliations"]
                                ),
                            ),
                        ),
                        "UTF-8",
                    )
                ),
            ),
        ],
    )


_HW_GOLD_COLS = [
    ("url", "VARCHAR"), ("title_md5", "VARCHAR"),
    ("date_published", "VARCHAR"), ("source", "VARCHAR"),
    ("identifier", "VARCHAR"), ("doi", "VARCHAR"), ("n_authors", "BIGINT"),
    ("authors_md5", "VARCHAR"), ("surnames", "VARCHAR"),
    ("aff1_match", "BOOLEAN"), ("aff2_match", "BOOLEAN"),
    ("journal_title", "VARCHAR"), ("journal_year_str", "VARCHAR"),
    ("journal_issue", "VARCHAR"), ("copyright_md5", "VARCHAR"),
    ("copyright_year", "VARCHAR"), ("license", "VARCHAR"),
    ("license_url", "VARCHAR"), ("pdf_url", "VARCHAR"),
    ("xml_url", "VARCHAR"), ("splash_url", "VARCHAR"),
]

# the reference asserts affiliation MEMBERSHIP per author
# (tests/unit/test_hindawi.py:48-67) — mirrored as array_contains booleans
_HW_AFF1 = "Center for Theoretical Physics Polish Academy of Sciences"
_HW_AFF2 = "The Andrzej Soltan Institute for Nuclear Studies"


@_q("f5v_hindawi_golden", _golden_oracle("hindawi", _HW_GOLD_COLS))
def f5v_hindawi_golden(spark, sf):
    """Golden-byte parity vs the reference's own Hindawi MARCXML fixture
    (tests/unit/responses/hindawi/test_1.xml) through the live
    parse_marcxml_pages pandas-UDF path; expected constants mirrored from
    the reference's test assertions (tests/unit/test_hindawi.py:36-147).
    This puts the MARCXML parser family under golden driver coverage
    alongside arxiv/JATS/Elsevier/Crossref."""
    import os as _os

    from hepcrawl_spark.parsers.marcxml import parse_marcxml_pages

    pages = spark.read.parquet(
        _os.path.join(_FIXDIR, "hindawi_golden_pages.parquet")
    )
    recs = parse_marcxml_pages(pages)
    mdz = lambda c: F.md5(F.encode(F.nullif(c, F.lit("")), "UTF-8"))
    return _golden_masked(
        recs, "hindawi",
        [
            ("title_md5", mdz(F.col("title"))),
            ("date_published", F.nullif(F.col("date_published"), F.lit(""))),
            ("source", F.nullif(F.col("source"), F.lit(""))),
            ("identifier", F.nullif(F.col("identifier"), F.lit(""))),
            ("doi", F.element_at("dois", 1)),
            ("n_authors", F.size("authors").cast("long")),
            (
                "authors_md5",
                F.md5(
                    F.encode(
                        F.concat_ws(_AUTHOR_SEP, F.col("authors.full_name")),
                        "UTF-8",
                    )
                ),
            ),
            ("surnames", F.concat_ws(",", F.col("authors.surname"))),
            (
                "aff1_match",
                F.array_contains(
                    F.col("authors")[0]["affiliations"], _HW_AFF1
                ),
            ),
            (
                "aff2_match",
                F.array_contains(
                    F.col("authors")[1]["affiliations"], _HW_AFF2
                ),
            ),
            ("journal_title", F.nullif(F.col("journal_title"), F.lit(""))),
            ("journal_year_str", F.col("journal_year").cast("string")),
            ("journal_issue", F.nullif(F.col("journal_issue"), F.lit(""))),
            ("copyright_md5", mdz(F.col("copyright_statement"))),
            ("copyright_year", F.nullif(F.col("copyright_year"), F.lit(""))),
            ("license", F.nullif(F.col("license"), F.lit(""))),
            ("license_url", F.nullif(F.col("license_url"), F.lit(""))),
            ("pdf_url", F.element_at("pdf_urls", 1)),
            ("xml_url", F.element_at("xml_urls", 1)),
            ("splash_url", F.element_at("splash_urls", 1)),
        ],
    )


# -- X33: C4 heuristic filters (Raffel et al. 2020 §2.2) ----------------------
# Deterministic line-structured variants per doc_id%5: clean 3-sentence page /
# +javascript boilerplate line (line dropped, page keeps) / 2 sentences only
# (fails min-sentences) / +lorem ipsum (page drop) / +code line with braces
# (page drop). Sentences are real corpus words so the line rules see real
# text. All counts cast BIGINT on both sides (driver hash is type-sensitive).
@_q(
    "x33_c4_filters",
    """WITH t AS (
      SELECT doc_id,
        list_transform([0, 1, 2], i ->
          coalesce(array_to_string(list_slice(
            regexp_split_to_array(trim(text), '\\s+'), i*6 + 1, i*6 + 6),
            ' '), '') || ' fin.') AS sents
      FROM documents
    ), v AS (
      SELECT doc_id, CASE CAST(doc_id % 5 AS INTEGER)
        WHEN 0 THEN array_to_string(sents, chr(10))
        WHEN 1 THEN array_to_string(sents, chr(10)) || chr(10) ||
                    'Please enable JavaScript to continue viewing.'
        WHEN 2 THEN sents[1] || chr(10) || sents[2]
        WHEN 3 THEN array_to_string(sents, chr(10)) || chr(10) ||
                    'lorem ipsum dolor sit amet.'
        ELSE array_to_string(sents, chr(10)) || chr(10) ||
             'var f = function() { return 1; }'
      END AS text FROM t
    ), w AS (
      SELECT doc_id, text,
        list_filter(string_split(text, chr(10)),
                    l -> length(trim(l)) > 0) AS lines
      FROM v
    ), k AS (
      SELECT doc_id, text, lines,
        list_filter(lines, l ->
          regexp_matches(trim(l), '[.!?”"'']$')
          AND len(regexp_split_to_array(trim(l), '\\s+')) >= 5
          AND NOT contains(lower(l), 'javascript')) AS kept
      FROM w
    )
    SELECT doc_id,
      CAST(len(lines) AS BIGINT) AS n_lines,
      CAST(len(kept) AS BIGINT) AS n_kept_lines,
      CAST(len(regexp_extract_all(array_to_string(kept, chr(10)), '[.!?]'))
           AS BIGINT) AS n_sentences,
      contains(lower(text), 'lorem ipsum') AS has_lorem,
      (contains(text, '{') OR contains(text, '}')) AS has_brace,
      md5(array_to_string(kept, chr(10))) AS clean_md5,
      (len(regexp_extract_all(array_to_string(kept, chr(10)), '[.!?]')) >= 3
       AND NOT contains(lower(text), 'lorem ipsum')
       AND NOT (contains(text, '{') OR contains(text, '}'))
       AND len(kept) > 0) AS passes
    FROM k ORDER BY doc_id""",
)
def x33_c4_filters(spark, sf):
    words = F.split(F.trim(F.col("text")), r"\s+")

    def sent(i: int):
        return F.concat(
            F.array_join(F.slice(words, i * 6 + 1, 6), " "), F.lit(" fin.")
        )

    three = F.concat_ws("\n", sent(0), sent(1), sent(2))
    shaped = _docs(spark, sf).select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, three)
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(
                three,
                F.lit("\nPlease enable JavaScript to continue viewing."),
            ),
        )
        .when(F.col("doc_id") % 5 == 2, F.concat_ws("\n", sent(0), sent(1)))
        .when(
            F.col("doc_id") % 5 == 3,
            F.concat(three, F.lit("\nlorem ipsum dolor sit amet.")),
        )
        .otherwise(
            F.concat(three, F.lit("\nvar f = function() { return 1; }"))
        )
        .alias("text"),
    )
    out = X.c4_rules(shaped)
    return out.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_kept_lines").cast("long").alias("n_kept_lines"),
        F.col("n_sentences").cast("long").alias("n_sentences"),
        "has_lorem",
        "has_brace",
        F.md5(F.encode("clean_text", "UTF-8")).alias("clean_md5"),
        "passes",
    ).orderBy("doc_id")


# -- X34: recrawl priority from capture history (Cho & Garcia-Molina 2003) ---
# Multi-capture history synthesized from pages: 2 + doc_id%4 hourly captures,
# content version bumps every 1 + doc_id%3 captures. The operator counts
# consecutive-digest changes per url and emits exact-integer change rates
# (ppm) — the frontier's re-fetch-fastest-movers key.
@_q(
    "x34_recrawl_priority",
    _CTE_PREFIX
    + """, caps0 AS (
      SELECT url, warc_ts, text, doc_id,
             unnest(range(0, 2 + doc_id % 4)) AS i
      FROM pages
    ), caps AS (
      SELECT url, warc_ts + to_hours(i) AS ts,
             md5(text || ':' || CAST(i // (1 + doc_id % 3) AS VARCHAR)) AS h
      FROM caps0
    ), m AS (
      SELECT url, ts, h,
        CASE WHEN lag(h) OVER w IS NOT NULL AND h <> lag(h) OVER w
             THEN 1 ELSE 0 END AS chg
      FROM caps WINDOW w AS (PARTITION BY url ORDER BY ts, h)
    )
    SELECT url, count(*) AS n_captures,
      CAST(sum(chg) AS BIGINT) AS n_changes,
      CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS span_s,
      CAST(sum(chg) AS BIGINT) * 1000000
        // greatest(count(*) - 1, 1) AS change_rate_ppm,
      CAST(sum(chg) AS BIGINT) * 86400000000
        // greatest(CAST(floor(epoch(max(ts))) - floor(epoch(min(ts)))
                    AS BIGINT), 1) AS changes_per_day_ppm
    FROM m GROUP BY url ORDER BY url""",
)
def x34_recrawl_priority(spark, sf):
    from hepcrawl_spark.operators.recrawl import capture_changes

    pages = _pages(spark, sf)
    caps = (
        pages.select(
            "url",
            "warc_ts",
            "text",
            "doc_id",
            F.explode(
                F.sequence(F.lit(0).cast("long"), 1 + F.col("doc_id") % 4)
            ).alias("i"),
        )
        .select(
            "url",
            (
                F.col("warc_ts")
                + F.make_interval(hours=F.col("i").cast("int"))
            ).alias("ts"),
            F.md5(
                F.encode(
                    F.concat(
                        "text",
                        F.lit(":"),
                        F.expr("i DIV (1 + doc_id % 3)").cast("string"),
                    ),
                    "UTF-8",
                )
            ).alias("content_md5"),
        )
    )
    return capture_changes(
        caps, url_col="url", ts_col="ts", hash_col="content_md5"
    ).orderBy("url")


# -- X35: gap sessionization over the events stream ---------------------------
# The classic mark-starts-then-running-sum two-window form; both windows
# share ONE shuffle on user_id. 30-minute gap.
@_q(
    "x35_sessionize",
    """WITH m AS (
      SELECT user_id, ts, event_id,
        CASE WHEN lag(ts) OVER w IS NULL
             OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
             THEN 1 ELSE 0 END AS nw
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
        sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM m
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      count(*) AS n_events,
      strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
      CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT)
        AS duration_s
    FROM s GROUP BY user_id, session_idx
    ORDER BY user_id, session_idx""",
)
def x35_sessionize(spark, sf):
    from hepcrawl_spark.streaming.events import sessionize

    return sessionize(
        _events(spark, sf), key_col="user_id", ts_col="ts", gap_s=1800
    ).orderBy("user_id", "session_idx")


# -- X36: Unicode NFC + control-char cleanup ----------------------------------
# Decomposed accents (e + U+0301) and stray C0 bytes appended per doc_id%4;
# the cleaned text must hash identically to DuckDB's nfc_normalize + strip.
# This is the digest-hygiene pass run before every dedup fingerprint.
@_q(
    "x36_unicode_nfc",
    """WITH v AS (
      SELECT doc_id,
        text || CASE CAST(doc_id % 4 AS INTEGER)
          WHEN 0 THEN ''
          WHEN 1 THEN ' Cafe' || chr(769)
          WHEN 2 THEN ' No' || chr(776) || 'el'
          ELSE ' ctl' || chr(7) || 'x'
        END AS raw
      FROM documents
    ), c AS (
      SELECT doc_id, raw,
        regexp_replace(nfc_normalize(raw),
          '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g') AS cleaned
      FROM v
    )
    SELECT doc_id, md5(cleaned) AS nfc_md5,
      CAST(length(cleaned) AS BIGINT) AS n_chars_nfc,
      (cleaned <> raw) AS changed
    FROM c ORDER BY doc_id""",
)
def x36_unicode_nfc(spark, sf):
    from hepcrawl_spark.functions.text import unicode_clean

    raw = F.concat(
        "text",
        F.when(F.col("doc_id") % 4 == 0, F.lit(""))
        .when(F.col("doc_id") % 4 == 1, F.lit(" Cafe\u0301"))
        .when(F.col("doc_id") % 4 == 2, F.lit(" No\u0308el"))
        .otherwise(F.lit(" ctl\x07x")),
    )
    v = _docs(spark, sf).select("doc_id", raw.alias("raw"))
    c = v.withColumn("cleaned", unicode_clean("raw"))
    return c.select(
        "doc_id",
        F.md5(F.encode("cleaned", "UTF-8")).alias("nfc_md5"),
        F.length("cleaned").cast("long").alias("n_chars_nfc"),
        (F.col("cleaned") != F.col("raw")).alias("changed"),
    ).orderBy("doc_id")


# -- X37: UT1-style URL blocklist gate ----------------------------------------
# Hosts synthesized with subdomain depth (cdn. / bare / static.img.); the
# blocklist holds the 4 sources ending in 0 or 5 (suffix block takes out all
# their subdomains) plus one exact deep host. Gate = two broadcast joins,
# zero corpus shuffles.
@_q(
    "x37_url_blocklist",
    """WITH u AS (
      SELECT doc_id, CASE CAST(doc_id % 3 AS INTEGER)
        WHEN 0 THEN 'cdn.' || source || '.example.org'
        WHEN 1 THEN source || '.example.org'
        ELSE 'static.img.' || source || '.example.org'
      END AS host FROM documents
    ), bl AS (
      SELECT DISTINCT source || '.example.org' AS entry
      FROM documents WHERE regexp_matches(source, '[05]$')
      UNION
      SELECT 'static.img.src1.example.org'
    )
    SELECT doc_id, host FROM u
    WHERE NOT EXISTS (
      SELECT 1 FROM bl
      WHERE u.host = bl.entry OR u.host LIKE '%.' || bl.entry)
    ORDER BY doc_id""",
)
def x37_url_blocklist(spark, sf):
    from hepcrawl_spark.operators.filters import blocklist_gate

    docs = _docs(spark, sf)
    urls = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("cdn."), "source", F.lit(".example.org")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat("source", F.lit(".example.org")),
        )
        .otherwise(
            F.concat(F.lit("static.img."), "source", F.lit(".example.org"))
        )
        .alias("host"),
    )
    bl = (
        docs.filter(F.col("source").rlike("[05]$"))
        .select(F.concat("source", F.lit(".example.org")).alias("entry"))
        .distinct()
        .union(
            spark.range(1).select(
                F.lit("static.img.src1.example.org").alias("entry")
            )
        )
    )
    return blocklist_gate(urls, bl).select("doc_id", "host").orderBy("doc_id")


# -- X38: per-host quality cap (domain balancing) -----------------------------
# Keep the 10 largest docs per source host — the anti-over-representation
# cut applied to the training mix after quality scoring. One shuffle on the
# key; rank survives into the output for auditability.
@_q(
    "x38_host_cap",
    """SELECT doc_id, source, n_chars, key_rank FROM (
      SELECT doc_id, source, n_chars,
        CAST(row_number() OVER (
          PARTITION BY source ORDER BY n_chars DESC, doc_id) AS BIGINT)
          AS key_rank
      FROM documents) t
    WHERE key_rank <= 10
    ORDER BY source, key_rank""",
)
def x38_host_cap(spark, sf):
    from hepcrawl_spark.operators.scrub import cap_per_key

    return (
        cap_per_key(
            _docs(spark, sf),
            key_col="source",
            order_col="n_chars",
            id_col="doc_id",
            k=10,
        )
        .select("doc_id", "source", "n_chars", "key_rank")
        .orderBy("source", "key_rank")
    )


# -- X39: crawler-trap detection (URL-template explosion) ---------------------
# 80% of each host's urls share one calendar-style template; the detector
# must flag it (>= 15 urls AND >= 50% of the host's distinct urls) and
# leave the small /about template alone. Share is exact integer ppm.
@_q(
    "x39_trap_detection",
    """WITH u AS (
      SELECT source || '.example.org' AS host,
        CASE WHEN CAST((doc_id // 20) % 10 AS INTEGER) < 8
          THEN '/cal/' || CAST(2000 + doc_id % 20 AS VARCHAR) || '/' ||
               CAST(doc_id % 12 AS VARCHAR) || '/item' || CAST(doc_id AS VARCHAR)
          ELSE '/about/page' || CAST(doc_id % 3 AS VARCHAR)
        END AS path,
        doc_id
      FROM documents
    ), t AS (
      SELECT host,
        regexp_replace(regexp_replace(path, '[0-9a-fA-F]{8,}', 'H', 'g'),
                       '[0-9]+', 'N', 'g') AS template,
        'https://' || host || path AS url
      FROM u
    ), pt AS (
      SELECT host, template, count(DISTINCT url) AS n_urls
      FROM t GROUP BY host, template
    ), ph AS (
      SELECT host, CAST(sum(n_urls) AS BIGINT) AS host_urls
      FROM pt GROUP BY host
    )
    SELECT pt.host, pt.template,
      CAST(pt.n_urls AS BIGINT) AS n_urls,
      ph.host_urls,
      CAST(pt.n_urls AS BIGINT) * 1000000 // ph.host_urls AS share_ppm,
      (pt.n_urls >= 15 AND
       CAST(pt.n_urls AS BIGINT) * 1000000 // ph.host_urls >= 500000)
        AS is_trap
    FROM pt JOIN ph ON pt.host = ph.host
    ORDER BY 1, 2""",
)
def x39_trap_detection(spark, sf):
    from hepcrawl_spark.operators.traps import detect_traps

    docs = _docs(spark, sf)
    host = F.concat("source", F.lit(".example.org"))
    path = F.when(
        F.expr("(doc_id DIV 20) % 10") < 8,
        F.concat(
            F.lit("/cal/"),
            (2000 + F.col("doc_id") % 20).cast("string"),
            F.lit("/"),
            (F.col("doc_id") % 12).cast("string"),
            F.lit("/item"),
            F.col("doc_id").cast("string"),
        ),
    ).otherwise(
        F.concat(F.lit("/about/page"), (F.col("doc_id") % 3).cast("string"))
    )
    urls = docs.select(
        host.alias("host"),
        path.alias("path"),
        F.concat(F.lit("https://"), host, path).alias("url"),
    )
    return detect_traps(
        urls, min_urls=15, min_share_ppm=500_000
    ).orderBy("host", "template")


# -- X40: one-pass table profiler ---------------------------------------------
# Per-column nulls/cardinality/range in ONE aggregation pass; lang gets
# nulls injected (nullif 'de') so the null path is actually exercised.
# Min/max compare on the native type, then render as strings.
@_q(
    "x40_profile",
    """WITH t AS (
      SELECT doc_id, nullif(lang, 'de') AS lang, source, n_chars
      FROM documents
    )
    SELECT 'doc_id' AS col_name, count(*) AS n_rows,
      CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_nulls,
      count(DISTINCT doc_id) AS n_distinct,
      CAST(min(doc_id) AS VARCHAR) AS min_s,
      CAST(max(doc_id) AS VARCHAR) AS max_s
    FROM t
    UNION ALL
    SELECT 'lang', count(*),
      CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      count(DISTINCT lang), min(lang), max(lang) FROM t
    UNION ALL
    SELECT 'source', count(*),
      CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      count(DISTINCT source), min(source), max(source) FROM t
    UNION ALL
    SELECT 'n_chars', count(*),
      CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      count(DISTINCT n_chars),
      CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM t
    ORDER BY col_name""",
)
def x40_profile(spark, sf):
    from hepcrawl_spark.operators.profile import profile_table

    t = _docs(spark, sf).select(
        "doc_id",
        F.nullif("lang", F.lit("de")).alias("lang"),
        "source",
        "n_chars",
    )
    return profile_table(t).orderBy("col_name")


# -- C24: dedup canonicalization with tracking-param stripping ---------------
# The same article shared through N utm_ campaigns must collapse to ONE
# url_seen key: scheme/host lowercased, default port stripped, params
# sorted, click-tracking params dropped. Predictive oracle (the expected
# canonical string is constructed from the same recipe).
@_q(
    "c24_tracking_canonical",
    """SELECT doc_id,
      'https://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR)
        || '?a=1&z=2' AS canon
    FROM documents ORDER BY doc_id""",
)
def c24_tracking_canonical(spark, sf):
    from hepcrawl_spark.functions.urls import canonicalize_url_dedup

    raw = F.concat(
        F.lit("https://"),
        F.upper("source"),
        F.lit(".EXAMPLE.org:443/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_campaign=c"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("&z=2&a=1&gclid=g"),
        F.col("doc_id").cast("string"),
    )
    return (
        _docs(spark, sf)
        .select("doc_id", canonicalize_url_dedup(raw).alias("canon"))
        .orderBy("doc_id")
    )


def _hits_oracle(k: int = 4) -> str:
    """Unrolled HITS iterations as CTEs (the x13 pagerank pattern).

    Single-reference chain on purpose: DuckDB 1.0 re-executes a CTE per
    reference (MATERIALIZED included), so a separate two-reference L1-total
    CTE makes the unrolled chain exponential (measured 0.7/2.4/38 s at
    k=1/2/3); ``sum() OVER ()`` folds the total into the same pass."""
    steps = []
    prev_h = "h0"
    for i in range(1, k + 1):
        steps.append(f"""a{i} AS (
        SELECT n.node,
               COALESCE(r.raw, 0) / sum(COALESCE(r.raw, 0)) OVER () AS v
        FROM nodes n LEFT JOIN (
            SELECT e.dst AS node, sum(h.v) AS raw
            FROM e JOIN {prev_h} h ON h.node = e.src GROUP BY e.dst
        ) r ON r.node = n.node),
    h{i} AS (
        SELECT n.node,
               COALESCE(r.raw, 0) / sum(COALESCE(r.raw, 0)) OVER () AS v
        FROM nodes n LEFT JOIN (
            SELECT e.src AS node, sum(a.v) AS raw
            FROM e JOIN a{i} a ON a.node = e.dst GROUP BY e.src
        ) r ON r.node = n.node)""")
        prev_h = f"h{i}"
    return f"""WITH eraw AS (
        SELECT CAST(doc_id AS BIGINT) AS src, CAST(doc_id - 1 AS BIGINT) AS dst
        FROM documents WHERE doc_id % 10 <> 0
        UNION ALL
        SELECT CAST(doc_id AS BIGINT), CAST(doc_id - 15 AS BIGINT)
        FROM documents WHERE doc_id % 40 = 7 AND doc_id >= 15
    ),
    e AS (SELECT DISTINCT src, dst FROM eraw),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    cnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    h0 AS (SELECT node, 1.0/cnt.n AS v FROM nodes, cnt),
    {", ".join(steps)}
    SELECT n.node,
      CAST(round(h.v * 1e6) AS BIGINT) AS hub_ppm,
      CAST(round(a.v * 1e6) AS BIGINT) AS auth_ppm
    FROM nodes n JOIN h{k} h ON h.node = n.node JOIN a{k} a ON a.node = n.node
    ORDER BY n.node"""


# -- X41: HITS hubs and authorities (Kleinberg 1999) --------------------------
# The directional complement to x13 pagerank on the same link graph; ppm
# integers for hash stability, fixed 4 iterations, L1 normalization.
@_q("x41_hits", _hits_oracle())
def x41_hits(spark, sf):
    from hepcrawl_spark.operators.linkrank import hits

    r = hits(_cc_edges(spark, sf), iterations=4)
    return r.select(
        "node",
        F.round(F.col("hub") * 1e6).cast("long").alias("hub_ppm"),
        F.round(F.col("authority") * 1e6).cast("long").alias("auth_ppm"),
    ).orderBy("node")


# -- X42: robots meta directives + nofollow links ------------------------------
# Four page shapes: plain / meta-noindex / meta-nofollow with one
# rel=nofollow link / both directives & no links. Effective follow count
# honors BOTH the per-link rel and the page-level meta.
@_q(
    "x42_meta_robots",
    """SELECT doc_id,
      (CAST(doc_id % 4 AS INTEGER) IN (1, 3)) AS noindex,
      (CAST(doc_id % 4 AS INTEGER) IN (2, 3)) AS nofollow_meta,
      CAST(CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2 ELSE 0 END
           AS BIGINT) AS n_links,
      CAST(CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN 1 WHEN 1 THEN 1 ELSE 0 END
           AS BIGINT) AS n_follow
    FROM documents ORDER BY doc_id""",
)
def x42_meta_robots(spark, sf):
    from hepcrawl_spark.functions.html import (
        meta_robots_nofollow,
        meta_robots_noindex,
    )
    from hepcrawl_spark.operators.anchors import extract_anchors

    m = F.col("doc_id") % 4
    html = (
        F.when(m == 0, F.lit('<html><a href="https://x/1">one</a></html>'))
        .when(
            m == 1,
            F.lit(
                '<html><meta name="robots" content="noindex">'
                '<a href="https://x/1">one</a></html>'
            ),
        )
        .when(
            m == 2,
            F.lit(
                '<html><meta content="nofollow" name=robots>'
                '<a rel="nofollow" href="https://x/1">one</a>'
                '<a href="https://x/2">two</a></html>'
            ),
        )
        .otherwise(
            F.lit('<html><meta name="robots" content="noindex, nofollow"></html>')
        )
    )
    pages = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.lit("https://h.example.org/doc/"), F.col("doc_id").cast("string")
        ).alias("url"),
        html.alias("html"),
    )
    flags = pages.select(
        "doc_id",
        "url",
        meta_robots_noindex("html").alias("noindex"),
        meta_robots_nofollow("html").alias("nofollow_meta"),
    )
    per_doc = (
        extract_anchors(pages)
        .groupBy(F.col("src_url").alias("url"))
        .agg(
            F.count("*").alias("_n_links"),
            F.sum((~F.col("nofollow")).cast("long")).alias("_n_rel_follow"),
        )
    )
    return (
        flags.join(per_doc, "url", "left")
        .select(
            "doc_id",
            "noindex",
            "nofollow_meta",
            F.coalesce("_n_links", F.lit(0)).cast("long").alias("n_links"),
            F.when(F.col("nofollow_meta"), F.lit(0))
            .otherwise(F.coalesce("_n_rel_follow", F.lit(0)))
            .cast("long")
            .alias("n_follow"),
        )
        .orderBy("doc_id")
    )


# -- X43: sequence packing (concatenate-then-cut at capacity boundaries) -----
# One synthetic chunk per doc (token counts decoupled from text so the
# gate is pure integer arithmetic), packed per source bucket in doc order
# at capacity 256; bin = start_offset DIV capacity.
@_q(
    "x43_pack_chunks",
    """WITH c AS (
      SELECT doc_id, source, CAST(doc_id % 97 + 5 AS BIGINT) AS n_tokens
      FROM documents
    ), w AS (
      SELECT doc_id, source, n_tokens,
        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_offset
      FROM c
    )
    SELECT doc_id, source AS bucket, n_tokens, start_offset,
           start_offset // 256 AS bin
    FROM w ORDER BY doc_id""",
)
def x43_pack_chunks(spark, sf):
    from hepcrawl_spark.operators.scrub import pack_chunks

    chunks = _docs(spark, sf).select(
        "doc_id",
        "source",
        F.lit(0).alias("chunk_id"),
        (F.col("doc_id") % 97 + 5).cast("long").alias("n_tokens"),
    )
    return (
        pack_chunks(chunks, capacity=256, bucket_col="source")
        .select("doc_id", "bucket", "n_tokens", "start_offset", "bin")
        .orderBy("doc_id")
    )


# -- X44: SemDeDup-style semantic dedup (earlier-neighbor rule) ----------------
# Within each coarse bucket (label here; IVF cells at scale) drop any
# vector with an earlier same-bucket neighbor at cosine >= 0.3 — the
# order-free, monotone variant of Abbas et al. 2023 (see
# operators/dedup.py::semantic_dedup). Threshold matches the green x6
# pair query, so the cosine boundary is already proven engine-stable.
@_q(
    "x44_semantic_dedup",
    """SELECT a.vec_id, NOT EXISTS (
      SELECT 1 FROM embeddings b
      WHERE b.label = a.label AND b.vec_id < a.vec_id
        AND list_cosine_similarity(
              a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
    ) AS kept
    FROM embeddings a ORDER BY a.vec_id""",
)
def x44_semantic_dedup(spark, sf):
    from hepcrawl_spark.operators.dedup import semantic_dedup

    out = semantic_dedup(_emb(spark, sf), threshold=0.3, bucket_col="label")
    return out.select("vec_id", "kept").orderBy("vec_id")


# -- X45: temperature-based domain mixing (n^tau largest-remainder) ------------
# Skewed domains from decimal-digit width of doc_id (10 / 90 / 400 docs at
# sf0.01 — pure integer, engine-independent); 100 seats at tau = 0.5.
# Allocation is integer-exact (floor(sqrt(n)*1000) weights, DIV/MOD
# quotas, largest-remainder seats), quota fill by the md5 sampling hash.
@_q(
    "x45_temperature_mix",
    """WITH d AS (
      SELECT doc_id, 'd' || length(CAST(doc_id AS VARCHAR)) AS domain
      FROM documents
    ), cnt AS (
      SELECT domain, count(*)::BIGINT AS n FROM d GROUP BY 1
    ), wt AS (
      SELECT domain, CAST(floor(sqrt(n) * 1000) AS BIGINT) AS w FROM cnt
    ), tot AS (SELECT sum(w)::BIGINT AS big_w FROM wt),
    alloc AS (
      SELECT domain, (100 * w) // big_w AS base, (100 * w) % big_w AS rem
      FROM wt, tot
    ), seats AS (
      SELECT domain, CAST(base + CASE WHEN
          row_number() OVER (ORDER BY rem DESC, domain ASC)
            <= 100 - (SELECT sum(base) FROM alloc)
          THEN 1 ELSE 0 END AS BIGINT) AS budget
      FROM alloc
    ), ranked AS (
      SELECT doc_id, domain,
        CAST(row_number() OVER (PARTITION BY domain ORDER BY
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'tmix'), 1, 8))::BIGINT
            ASC, doc_id ASC) AS BIGINT) AS domain_rank
      FROM d
    )
    SELECT r.doc_id, r.domain, s.budget, r.domain_rank
    FROM ranked r JOIN seats s USING (domain)
    WHERE r.domain_rank <= s.budget
    ORDER BY r.doc_id""",
)
def x45_temperature_mix(spark, sf):
    from hepcrawl_spark.operators.mix import temperature_mix

    docs = _docs(spark, sf).withColumn(
        "domain",
        F.concat(F.lit("d"), F.length(F.col("doc_id").cast("string")).cast("string")),
    )
    out = temperature_mix(docs, 100, domain_col="domain", seed="tmix", tau=0.5)
    return out.select("doc_id", "domain", "budget", "domain_rank").orderBy("doc_id")


# -- X47: hashed-feature batch perceptron (integer-exact learned filter) -------
# Two batch epochs over md5-hashed unigram+bigram buckets (B = 128),
# labels +1 for the DSIR target sources / -1 otherwise. All-integer
# training makes the weights a pure function of the corpus, so the oracle
# UNROLLS both epochs in SQL: epoch 1 starts from w = 0 (every doc
# misclassified -> g1 = class-difference counts), epoch 2 updates from
# docs still misclassified under w1 = g1; final score = (g1 + g2) . counts.
@_q(
    "x47_perceptron",
    f"""WITH toks AS (
      SELECT doc_id,
             CASE WHEN source IN ('src0', 'src1', 'src2')
                  THEN 1 ELSE -1 END AS label,
             string_split({_NORM_SQL}, ' ') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, label, u.g AS gram FROM toks, LATERAL unnest(t) AS u(g)
      UNION ALL
      SELECT doc_id, label, t[i.i] || ' ' || t[i.i+1] AS gram
      FROM toks, LATERAL unnest(range(1, len(t))) AS i(i)
    ), cnt AS (
      SELECT doc_id, label,
             (('0x' || substr(md5(gram), 1, 7))::BIGINT) % 128 AS bucket,
             count(*)::BIGINT AS c
      FROM grams GROUP BY 1, 2, 3
    ), g1 AS (
      SELECT bucket, sum(label * c)::BIGINT AS g FROM cnt GROUP BY 1
    ), s2 AS (
      SELECT cnt.doc_id, cnt.label,
             COALESCE(sum(g1.g * cnt.c), 0)::BIGINT AS s
      FROM cnt LEFT JOIN g1 USING (bucket) GROUP BY 1, 2
    ), g2 AS (
      SELECT cnt.bucket, sum(cnt.label * cnt.c)::BIGINT AS g
      FROM cnt JOIN s2 ON s2.doc_id = cnt.doc_id AND s2.label * s2.s <= 0
      GROUP BY 1
    ), w2 AS (
      SELECT COALESCE(g1.bucket, g2.bucket) AS bucket,
             COALESCE(g1.g, 0) + COALESCE(g2.g, 0) AS w
      FROM g1 FULL JOIN g2 ON g1.bucket = g2.bucket
    )
    SELECT cnt.doc_id,
           CAST(COALESCE(sum(w2.w * cnt.c), 0) AS BIGINT) AS score,
           COALESCE(sum(w2.w * cnt.c), 0) > 0 AS pred
    FROM cnt LEFT JOIN w2 USING (bucket)
    GROUP BY cnt.doc_id ORDER BY cnt.doc_id""",
)
def x47_perceptron(spark, sf):
    from hepcrawl_spark.operators import classifier

    docs = _docs(spark, sf).withColumn(
        "label",
        F.when(F.col("source").isin("src0", "src1", "src2"), 1).otherwise(-1),
    )
    w = classifier.perceptron_train(docs, num_buckets=128, epochs=2)
    scored = classifier.perceptron_score(docs, w)
    return scored.select(
        "doc_id",
        F.col("score").cast("long").alias("score"),
        (F.col("score") > 0).alias("pred"),
    ).orderBy("doc_id")


# -- X46: BPE corpus word counts (the tokenizer's distributed step) -----------
# The only corpus-sized stage of operators/bpe.py: exact word frequencies
# feeding merge training. Top-50 slice in the trainer's own (cnt desc,
# word asc) deterministic order; the driver-side merge loop itself is
# pytest-golden (not SQL-expressible).
@_q(
    "x46_word_counts",
    f"""WITH words AS (
      SELECT u.w AS word FROM (
        SELECT string_split({_NORM_SQL}, ' ') AS t FROM documents
      ), LATERAL unnest(t) AS u(w)
      WHERE u.w <> ''
    )
    SELECT word, count(*)::BIGINT AS cnt
    FROM words GROUP BY word
    ORDER BY cnt DESC, word ASC LIMIT 50""",
)
def x46_word_counts(spark, sf):
    from hepcrawl_spark.operators.bpe import word_counts

    return (
        word_counts(_docs(spark, sf))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(50)
    )


# Gate-priority ordering (COVERAGE.md "Oracle gate rotation"): the driver
# gates exactly the FIRST 50 queries of this dict, leaving the tail for the
# next round. Queries whose query code or operator implementation changed
# since their last green driver row must sort first; next come queries whose
# last green row is oldest; the tail holds queries green in the PREVIOUS
# round with zero code churn since. Round-5 head = the full 33-query r04
# tail (r02/r03-stale, three of whose modules — frontier/robots/dedup/warc/
# merge_store — took round-4 hardening commits after their last gating) +
# the two r04 red rows (x14/x20, oracle sums now CAST to BIGINT) + the 9
# never-gated queries (5 reference-fixture golden gates, substring dedup,
# DSIR weights/sample, CDX seeds) + the 5 queries whose oracle text changed
# since their r04 green (bigint type alignment: p1/p4/x5/x5b/x21) + the
# ppm-family canary x2 = 50 exactly; d1c/d1d/d1e/p2 (green r04, one round
# old) rotate to the tail and back in r06.
_GATE_HEAD = [
    # the r04 tail: last green row r03 (or r02 for the final three) — per
    # the rotation policy no row may go two rounds stale, and the round-4
    # hardening commits touched several of their modules after gating
    "x8_token_counts", "x7_langid", "x9_fingerprint",
    "q1_pricing_summary", "q3_order_revenue",
    "x10_connected_components", "x11_dedup_clusters",
    "s18_warc_scan", "p7_robots_parse", "s19_sitemap_scan", "c23_html_extract",
    "d1_crawl_once_gate", "d1b_crawl_once_bloom",
    "j4_document_patch", "tohep_normalize", "x5c_lsh_signature",
    "a1_crawl_counters", "x12_simhash_candidates", "x3b_minhash_lsh_candidates",
    "x16_pii_redaction", "x17_mix_sampling", "x18_chunking",
    "x19_decontamination", "s3_missing_anti_join", "s4_zip_members",
    "s5_tar_members_xml", "s6_tar_members_pdf", "f2_harvest_worthy",
    "f4_open_access_split", "p6_retry_decay",
    "p5_robots_gate", "x1_exact_dedup", "j5_fetch_join",
    # red in r04 (DuckDB HUGEINT vs int64 under the typed hash; oracles now
    # CAST ... AS BIGINT) — must prove green
    "x14_repetition", "x20_paragraph_dedup",
    # never gated: golden-byte parity vs the reference's own fixtures,
    # plus the round-5 additions (substring dedup, DSIR weights/sampling,
    # CDX index source) — window priority per the rotation policy
    "f5x_arxiv_golden", "f5y_elsevier_golden", "f5z_crossref_golden",
    "f5w_aps_golden", "f5v_hindawi_golden",
    "x23_substring_dedup", "x24_dsir_weights", "x25_dsir_sample",
    "s20_cdx_seeds",
    # oracle text changed since their r04 green row (result types aligned
    # to bigint) — the old green row does not prove the current oracle
    "p1_politeness_wave", "p4_crawl_order", "x5_cosine_topk", "x5b_ivf_topk",
    "x21_gopher_rules",
    # ppm-integer family canary: three rounds of oracle-representation
    # bugs landed here; re-prove under the type-checked local gate (its
    # module dedup.py also grew the substring-dedup pass this round)
    "x2_ngram_jaccard",
]
_GATE_TAIL = [
    # green in CORRECTNESS_r04.json, one round old at r05 (policy allows
    # two) — d1c/d1d/d1e/p2 yield their head slots to the round-5
    # never-gated queries and rotate back in r06; the f5* predictive
    # oracles are additionally backed by the in-window golden gates and
    # the 100+ fixture pytest oracles
    "d1c_crawl_once_cuckoo", "d1d_crawl_once_cuckoo_delete", "d1e_merge_upsert",
    "p2_host_pressure",
    "x2b_ngram_jaccard_capped", "x6_embedding_neardup",
    "f5_arxiv_parse", "f5b_jats_parse", "f5c_desy_parse", "f5d_crossref_parse",
    "f5e_marcxml_parse", "f5f_aps_parse", "f5g_nlm_parse", "f5h_elsevier_parse",
    "c4_whitespace_collapse", "c5_subsup_latex", "c7_initials_collapse",
    "c10_journal_section", "c11_date_waterfall", "c13_page_count",
    "c14_doi_split", "c15_doctype_classify", "c16_language_names",
    "f1_article_allowlist", "f6_language_filter", "a3_earliest_date",
    "a5_year_ranges", "a6_page_count_arith", "u2_union_distinct",
    "c2_host_basename", "c1_canonicalize", "d2_identifier_dedup",
    "c18_value_dicts", "x4_simhash", "x3_minhash_signatures",
    "w1_tumbling_window", "s13_json_extract",
    "j2_affiliation_lookup", "s12_batch_feed", "x22_lsh_verified_pairs",
    "x13_pagerank", "x15_ngram_repetition",
]


def _gate_ordered(d: dict) -> dict:
    head = [k for k in _GATE_HEAD if k in d]
    tail = [k for k in _GATE_TAIL if k in d]
    mid = [k for k in d if k not in set(head) | set(tail)]
    return {k: d[k] for k in head + mid + tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _gate_ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return _gate_ordered(_ORACLES)
