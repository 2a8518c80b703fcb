"""Golden tests for the JATS/WSP and Desy JSONL parsers against the
reference fixtures (expected values mirror tests/unit/test_world_scientific.py
and test_desy.py for the same inputs)."""

import json
import os

import pytest

from hepcrawl_spark.parsers.desy import parse_desy_body
from hepcrawl_spark.parsers.jats import WSP_ALLOWED_ARTICLE_TYPES, parse_jats_body
from tests.conftest import FIXTURES

WS = f"{FIXTURES}/world_scientific"
DESY = f"{FIXTURES}/desy"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(WS), reason="reference fixtures not available"
)


@pytest.fixture(scope="module")
def ws_record():
    with open(f"{WS}/sample_ws_record.xml", "rb") as f:
        return parse_jats_body(f.read(), allowed_article_types=WSP_ALLOWED_ARTICLE_TYPES)[0]


def test_ws_abstract_byte_identical(ws_record):
    """north-rule oracle: <sub>/<sup> preserved byte-for-byte."""
    abstract = ws_record["abstract"]
    assert abstract.startswith("CH<sub>3</sub>NH<sub>3</sub>PbX(X = Br, I, Cl)")
    assert "TiO<sub>2</sub> substrate" in abstract
    assert "100 mW/cm<sup>2</sup>" in abstract
    assert abstract.endswith("without Li<sup>+</sup> shows interestingly a promising stability.")


def test_ws_title(ws_record):
    assert ws_record["title"] == (
        "HIGH-EFFICIENT SOLID-STATE PEROVSKITE SOLAR CELL WITHOUT "
        "LITHIUM SALT IN THE HOLE TRANSPORT MATERIAL"
    )


def test_ws_fields(ws_record):
    r = ws_record
    assert r["imprint_date"] == "2014-06-05"
    assert r["page_count"] == 7
    assert sorted(r["keywords"]) == sorted(
        ["Perovskite CH3NH3PbI3", "solar cell", "lithium"]
    )
    assert r["license"] == "CC BY 4.0"
    assert r["license_url"] == "https://creativecommons.org/licenses/by/4.0"
    assert r["dois"] == ["10.1142/S1793292014400013"]
    assert r["collaborations"] == ["Belle"]
    assert r["journal_title"] == "NANO"
    assert r["year"] == 2014
    assert r["artid"] == "1440001"
    assert r["journal_volume"] == "9"
    assert r["journal_issue"] == "05"
    assert r["copyright_holder"] == "World Scientific Publishing Company"
    assert r["copyright_year"] == 2014
    assert r["document_type"] == "article"


def test_ws_authors(ws_record):
    authors = ws_record["authors"]
    assert [a["full_name"] for a in authors] == [
        "Bi, Dongqin", "Boschloo, Gerrit", "Hagfeldt, Anders"
    ]
    assert authors[0]["affiliations"] == []
    assert authors[1]["affiliations"] == [
        "Physics Department, Brookhaven National Laboratory, Upton, NY 11973, USA"
    ]
    assert authors[2]["emails"] == ["anders.hagfeldt@kemi.uu.se"]


def test_wsp_second_fixture_parses():
    with open(f"{WS}/wsp_record.xml", "rb") as f:
        recs = parse_jats_body(f.read(), allowed_article_types=WSP_ALLOWED_ARTICLE_TYPES)
    assert len(recs) == 1 and recs[0]["error"] is None
    assert recs[0]["abstract"].startswith("Abstract L\xe9vy bla-bla bla")
    assert recs[0]["authors"][0]["full_name"] == "Author_surname_2, Author_name_1"


def test_article_type_allowlist_filters():
    body = b'<article article-type="editorial"><front><article-meta/></front></article>'
    assert parse_jats_body(body, allowed_article_types=WSP_ALLOWED_ARTICLE_TYPES) == []


def test_desy_jsonl_titles_match_expected():
    with open(f"{DESY}/jap133.3.jsonl", "rb") as f:
        recs = parse_desy_body(f.read())
    with open(f"{DESY}/desy_records_from_jsonlines_expected.json") as f:
        expected = json.load(f)
    # the reference's own test zips generated vs expected (the fixture holds
    # 1 record, the expected file 5) — same comparison discipline here
    assert len(recs) >= 1
    for rec, exp in zip(recs, expected):
        assert rec["error"] is None
        assert rec["title"] == exp["titles"][0]["title"]
        if exp.get("abstracts"):
            assert rec["abstract"] == exp["abstracts"][0]["value"]
        if exp.get("dois"):
            assert rec["dois"] == [d["value"] for d in exp["dois"]]


def test_desy_invalid_line_error_row():
    recs = parse_desy_body(b"This is not actually JSONL\n")
    assert len(recs) == 1
    assert recs[0]["error"].startswith("ValueError")
    assert recs[0]["source_data"] == "This is not actually JSONL"


def test_desy_spark_roundtrip(spark):
    import datetime

    from hepcrawl_spark.parsers.desy import parse_desy_pages

    with open(f"{DESY}/jap133.3.jsonl", "rb") as f:
        body = f.read()
    pages = spark.createDataFrame(
        [("https://s3/desy/jap133.3.jsonl", datetime.datetime(2024, 1, 1), body, None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    df = parse_desy_pages(pages)
    assert df.filter("error is null").count() == df.count() > 0


def test_jats_spark_roundtrip(spark):
    import datetime

    from hepcrawl_spark.parsers.jats import parse_jats_pages

    with open(f"{WS}/sample_ws_record.xml", "rb") as f:
        body = f.read()
    pages = spark.createDataFrame(
        [("https://wsp/sample.xml", datetime.datetime(2024, 1, 1), body, None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    rows = parse_jats_pages(pages).collect()
    assert len(rows) == 1
    assert rows[0]["journal_title"] == "NANO"
    assert [a["full_name"] for a in rows[0]["authors"]][0] == "Bi, Dongqin"
