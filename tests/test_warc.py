"""WARC source: pack -> binary column -> decode round trip on real bytes."""

import gzip
import hashlib

import pyspark.sql.functions as F
import pytest

from hepcrawl_spark.sources.warc import (
    explode_warc_records,
    pack_warc_by_group,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, i % 3, f"https://h{i % 4}.example.org/p/{i}", f"<html>body {i}</html>")
        for i in range(30)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, warc_id long, url string, text string"
    )


def test_pack_decode_roundtrip(spark, docs):
    packed = pack_warc_by_group(
        docs.select("warc_id", "url", "text"), "warc_id", "url", "text"
    )
    assert packed.count() == 3
    out = explode_warc_records(packed).collect()
    assert len(out) == 30  # warcinfo records filtered inside the decoder
    by_url = {r["url"]: r for r in out}
    for i in range(30):
        r = by_url[f"https://h{i % 4}.example.org/p/{i}"]
        assert bytes(r["body"]).decode() == f"<html>body {i}</html>"
        assert r["http_status"] == 200
        assert r["content_type"] == "text/html"
        assert r["warc_type"] == "response"
        assert r["warc_date"] == "2024-01-01T00:00:00Z"
        assert r["warc_id"] == i % 3


def test_multi_member_gzip_layout(spark, docs):
    """The payload really is Common Crawl's per-record-gzip-member layout:
    N+1 independent gzip members (warcinfo + records), each openable on
    its own."""
    packed = pack_warc_by_group(
        docs.filter("warc_id = 0").select("warc_id", "url", "text"),
        "warc_id", "url", "text",
    ).collect()
    blob = bytes(packed[0]["payload"])
    assert blob[:2] == b"\x1f\x8b"
    # first member alone must decompress to the warcinfo record
    first = gzip.decompress(blob)  # gzip.decompress reads ALL members
    assert first.startswith(b"WARC/1.0\r\nWARC-Type: warcinfo")
    from hepcrawl_spark.sources.warc import _gzip_members

    members = list(_gzip_members(blob))
    assert len(members) == 1 + 10  # warcinfo + 10 responses
    assert all(m.startswith(b"WARC/1.0\r\n") for m in members)


def test_plain_uncompressed_warc(spark, docs):
    packed = pack_warc_by_group(
        docs.select("warc_id", "url", "text"),
        "warc_id", "url", "text", gzip_members=False,
    )
    out = explode_warc_records(packed)
    assert out.count() == 30


def test_rec_type_filter_and_passthrough(spark, docs):
    packed = pack_warc_by_group(
        docs.select("warc_id", "url", "text"), "warc_id", "url", "text"
    )
    info = explode_warc_records(packed, rec_types=("warcinfo",)).collect()
    assert len(info) == 3
    for r in info:
        assert r["http_status"] is None and r["url"] is None
        assert bytes(r["body"]) == b"software: hepcrawl_spark\r\n"


def test_deterministic_bytes(spark, docs):
    g = docs.select("warc_id", "url", "text")
    a = {r["warc_id"]: hashlib.md5(bytes(r["payload"])).hexdigest()
         for r in pack_warc_by_group(g, "warc_id", "url", "text").collect()}
    b = {r["warc_id"]: hashlib.md5(bytes(r["payload"])).hexdigest()
         for r in pack_warc_by_group(g, "warc_id", "url", "text").collect()}
    assert a == b


def test_no_shuffle_in_decode(spark, docs):
    from hepcrawl_spark.plans import exchange_count

    packed = pack_warc_by_group(
        docs.select("warc_id", "url", "text"), "warc_id", "url", "text"
    ).localCheckpoint(eager=True)
    assert exchange_count(explode_warc_records(packed)) == 0


def test_corrupt_member_yields_intact_prefix(spark, docs):
    """A corrupt/truncated member (cut-short transfer) must surface the
    intact prefix records without failing the task."""
    from hepcrawl_spark.sources.warc import _gzip_members, _iter_warc_records

    packed = pack_warc_by_group(
        docs.filter("warc_id = 0").select("warc_id", "url", "text"),
        "warc_id", "url", "text",
    ).collect()
    blob = bytearray(packed[0]["payload"])
    mid = len(blob) * 55 // 100
    for i in range(mid, mid + 8):  # corrupt a middle member
        blob[i] ^= 0xFF
    members = list(_gzip_members(bytes(blob)))
    assert 1 <= len(members) < 11
    assert all(m.startswith(b"WARC/1.0\r\n") for m in members)
    assert 0 < sum(1 for _ in _iter_warc_records(bytes(blob))) < 11
    # plain truncation: final member comes back partial, earlier ones intact
    cut = bytes(packed[0]["payload"])[:-40]
    assert all(m.startswith(b"WARC/1.0\r\n") for m in _gzip_members(cut))


def test_wet_pack_decode_roundtrip(spark, docs):
    from hepcrawl_spark.sources.warc import pack_wet_by_group

    packed = pack_wet_by_group(
        docs.select("warc_id", "url", "text"), "warc_id", "url", "text"
    )
    assert packed.count() == 3
    out = explode_warc_records(packed, rec_types=("conversion",)).collect()
    assert len(out) == 30
    by_url = {r["url"]: r for r in out}
    for i in range(30):
        r = by_url[f"https://h{i % 4}.example.org/p/{i}"]
        assert bytes(r["body"]).decode() == f"<html>body {i}</html>"
        assert r["warc_type"] == "conversion"
        assert r["http_status"] is None  # no HTTP envelope in WET
        assert r["content_type"] == "text/plain"


def test_wet_refers_to_joins_back_to_warc_capture(spark, docs):
    """WARC-Refers-To carries the md5 record id pack_warc_by_group stamps
    on the response record — the two sidecars stay joinable by url."""
    from hepcrawl_spark.sources.warc import pack_wet_by_group

    packed = pack_wet_by_group(
        docs.select("warc_id", "url", "text").filter("warc_id = 0"),
        "warc_id", "url", "text", gzip_members=False,
    )
    blob = bytes(packed.collect()[0]["payload"])
    for i in range(0, 30, 3):
        url = f"https://h{i % 4}.example.org/p/{i}"
        rid = hashlib.md5(url.encode()).hexdigest()
        assert f"WARC-Refers-To: <urn:md5:{rid}>".encode() in blob


def test_wet_deterministic_bytes(spark, docs):
    from hepcrawl_spark.sources.warc import pack_wet_by_group

    sel = docs.select("warc_id", "url", "text")
    a = {r["warc_id"]: bytes(r["payload"])
         for r in pack_wet_by_group(sel, "warc_id", "url", "text").collect()}
    b = {r["warc_id"]: bytes(r["payload"])
         for r in pack_wet_by_group(
             sel.repartition(7), "warc_id", "url", "text").collect()}
    assert a == b
