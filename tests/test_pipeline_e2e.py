"""Full harvest chain, end to end through real bytes:

    WARC archives -> record scan -> html -> visible text -> features
    -> near-dup pairs -> connected components -> canonical survivors

Every stage is the public API; nothing is mocked. This is the composition
a reference user runs daily, re-expressed on the engine."""

import pyspark.sql.functions as F
import pytest

from hepcrawl_spark.functions.html import html_to_text
from hepcrawl_spark.operators.components import dedup_clusters
from hepcrawl_spark.operators.dedup import minhash_lsh_candidates
from hepcrawl_spark.operators.textstats import record_features
from hepcrawl_spark.sources.warc import explode_warc_records, pack_warc_by_group


def test_warc_to_survivors(spark):
    base = "the standard model of particle physics predicts the higgs boson "
    rows = []
    for g in range(4):            # 4 near-dup groups x 3 variants
        for v in range(3):
            html = (
                f"<html><head><title>doc {g}-{v}</title>"
                f"<script>junk()</script></head><body><p>{base * 3}"
                f"group {g} variant {v}</p></body></html>"
            )
            rows.append((g * 10 + v, g % 2, f"https://h{g}.org/p/{g}/{v}", html))
    for u in range(4):            # 4 unique docs
        words = " ".join(f"tok{u}q{i}z{(u * 5 + i) % 11}" for i in range(40))
        rows.append((100 + u, u % 2, f"https://uniq.org/{u}",
                     f"<html><body><p>{words}</p></body></html>"))
    docs = spark.createDataFrame(
        rows, "doc_id long, warc_id long, url string, html string"
    )

    # 1. pack into real multi-member-gzip WARCs, 2. scan records back
    warcs = pack_warc_by_group(
        docs.select("warc_id", "url", "html"), "warc_id", "url", "html"
    )
    records = explode_warc_records(warcs)
    assert records.count() == 16

    # 3. html -> visible text (script dropped, title separate)
    pages = html_to_text(
        records.select("url", F.col("body").alias("html"))
    )
    a_page = pages.filter(F.col("url") == "https://h0.org/p/0/0").collect()[0]
    assert a_page["title"] == "doc 0-0" and "junk" not in a_page["text"]

    # 4. features over the extracted text (the crawl loop's parse stage)
    feats = record_features(pages.select("url", "text"), keep_cols=("url",))
    assert feats.filter("n_tokens > 10").count() == 16

    # 5-7. near-dup pairs -> components -> canonical survivors
    ids = pages.join(
        docs.select("doc_id", "url"), "url"
    ).select("doc_id", "text")
    pairs = minhash_lsh_candidates(ids, num_hashes=16, bands=8)
    out = dedup_clusters(pairs, ids.select("doc_id"), id_col="doc_id")
    survivors = {r["doc_id"] for r in out.filter("is_canonical").collect()}
    uniques = {100 + u for u in range(4)}
    assert uniques <= survivors            # distinct docs all survive
    assert len(survivors - uniques) <= 4   # each variant group collapses
    assert len(survivors - uniques) >= 1
