"""jobs/corpus_job.py end to end: WARC bytes -> filtered, deduped, chunked
training corpus with per-stage audit counts. Every stage is the public
operator API on real bytes; nothing mocked."""

import json

import pyspark.sql.functions as F

from hepcrawl_spark.sources.warc import pack_warc_by_group
from jobs.corpus_job import parse_args, run


def _mk_pages(spark):
    bases = [
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while morning light spreads across the quiet field of tall grass ",
        "a storm gathered over the harbor as fishermen pulled their nets "
        "ashore and gulls circled the masts crying into the rising wind ",
        "deep in the archive the librarian sorted letters by decade and "
        "catalogued each faded envelope with careful steady patient hands ",
    ]
    rows = []
    for g in range(3):          # 3 near-dup groups x 2 variants, distinct bases
        for v in range(2):
            body = (
                f"<html><head><title>doc {g}-{v}</title></head><body>"
                f"<p>{bases[g] * 4} group {g} variant {v} marker</p>"
                f"<p>COMMON COOKIE BANNER TEXT ACROSS ALL PAGES</p>"
                f"<p>variant tail {g} {v}</p></body></html>"
            )
            rows.append((g * 10 + v, 0, f"https://h{g}.org/{g}/{v}", body))
    rows.append((90, 0, "https://short.org/x", "<html><body>tiny</body></html>"))
    return rows


def test_corpus_job_warc_to_chunks(spark, tmp_path):
    rows = _mk_pages(spark)
    pages = spark.createDataFrame(
        rows, "page_id long, grp int, url string, html string"
    ).select(
        "grp",
        F.col("url"),
        F.encode("html", "UTF-8").alias("body"),
    )
    warcs = pack_warc_by_group(pages, group_col="grp", url_col="url", body_col="body")
    warc_dir = str(tmp_path / "warcs")
    warcs.write.parquet(warc_dir)
    out = str(tmp_path / "corpus")
    audit = run(
        spark,
        parse_args([
            "--input", warc_dir, "--input-format", "warc",
            "--output", out,
            "--min-quality-pass", "--max-dup-line-frac", "0.9",
            "--neardup-threshold", "0.5",
            "--chunk-tokens", "16",
        ]),
    )
    assert audit["input_docs"] == 7
    # the tiny page fails the Gopher word-count bound
    assert audit["after_gopher"] == 6
    # near-dup clustering keeps one canonical doc per group
    assert audit["after_neardup"] == 3
    assert audit["chunks"] > 0
    chunks = spark.read.parquet(f"{out}/corpus")
    assert chunks.count() == audit["chunks"]
    assert {"doc_id", "chunk_id", "chunk_text"} <= set(chunks.columns)
    # the shared cookie-banner paragraph survived in at most one doc
    banner = chunks.filter(
        F.col("chunk_text").contains("COMMON COOKIE BANNER")
    ).select("doc_id").distinct().count()
    assert banner <= 1
    # audit table written for the quality stage
    assert spark.read.parquet(f"{out}/audit_gopher").count() == 7
