"""Canonical StructTypes for every engine table.

The reference flows dynamically-typed dicts through Scrapy generators
(reference: hepcrawl/items.py:21-325, hepcrawl/utils.py:424-502); here every
table has one fixed schema declared once, so Catalyst can prune columns and
push predicates into the parquet scans.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# The crawl corpus (BASELINE.json input_hint): Common-Crawl-style pages.
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# Scheduler state; replaces scrapy.Request + meta threading
# (reference: wsp_spider.py:150-185, pos_spider.py:118-126).
FRONTIER_SCHEMA = StructType(
    [
        StructField("url_canon", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("host", StringType(), False),
        StructField("priority", DoubleType(), False),
        StructField("depth", IntegerType(), False),
        StructField("attempt", IntegerType(), False),
        StructField("discovered_ts", TimestampType(), False),
        StructField("source", StringType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

# Crawl-once store; replaces the per-spider sqlite KV DB
# (reference: hepcrawl/middlewares.py:101-210, settings.py:95-100).
URL_SEEN_SCHEMA = StructType(
    [
        StructField("url_hash", LongType(), False),
        StructField("url_canon", StringType(), False),
        StructField("last_ts", TimestampType(), False),
    ]
)

# robots.txt rules (north_rule addition; not present in the reference —
# ROBOTSTXT_OBEY is unset i.e. False in hepcrawl/settings.py).
ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("path_prefix", StringType(), False),
        StructField("allow", StringType(), False),  # 'allow' | 'disallow'
    ]
)

AUTHOR_SCHEMA = StructType(
    [
        StructField("full_name", StringType(), True),
        StructField("surname", StringType(), True),
        StructField("given_names", StringType(), True),
        StructField("affiliations", ArrayType(StringType()), True),
    ]
)

# HEPRecord-equivalent wide record (reference: hepcrawl/items.py:21-325,
# subset that the fixture oracles actually assert on).
RECORD_SCHEMA = StructType(
    [
        StructField("url", StringType(), True),
        StructField("source", StringType(), True),
        StructField("record_format", StringType(), True),  # 'hep' | 'hepcrawl'
        StructField("title", StringType(), True),
        StructField("abstract", StringType(), True),
        StructField("authors", ArrayType(AUTHOR_SCHEMA), True),
        StructField("collaborations", ArrayType(StringType()), True),
        StructField("dois", ArrayType(StringType()), True),
        StructField("arxiv_eprint", StringType(), True),
        StructField("arxiv_categories", ArrayType(StringType()), True),
        StructField("report_numbers", ArrayType(StringType()), True),
        StructField("license_url", StringType(), True),
        StructField("preprint_date", StringType(), True),
        StructField("pubinfo_freetext", StringType(), True),
        StructField("page_nr", IntegerType(), True),
        StructField("document_type", StringType(), True),
        StructField("public_note", StringType(), True),
        StructField("private_note", StringType(), True),
        StructField("error", StringType(), True),  # parse-error row (S13/E2)
    ]
)

# Per-iteration per-partition crawl metrics + lineage
# (north_rule: "per-partition lineage + fetch/parse metrics").
METRICS_SCHEMA = StructType(
    [
        StructField("iteration", IntegerType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("scheduled", LongType(), False),
        StructField("fetched", LongType(), False),
        StructField("parsed", LongType(), False),
        StructField("errors", LongType(), False),
    ]
)

# Incremental-harvest watermarks; replaces the last-run JSON files
# (reference: lastrunstore_spider.py:89-126).
CRAWL_STATE_SCHEMA = StructType(
    [
        StructField("source", StringType(), False),
        StructField("oai_set", StringType(), True),
        StructField("last_run_ts", TimestampType(), True),
        StructField("until_ts", TimestampType(), True),
    ]
)
