"""Golden tests for the MARC21 XML parser vs the reference hindawi fixture
(expected values mirror tests/unit/test_hindawi.py)."""

import os

import pytest

from hepcrawl_spark.parsers.marcxml import parse_marcxml_body
from tests.conftest import FIXTURES

HW = f"{FIXTURES}/hindawi"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(HW), reason="reference fixtures not available"
)


@pytest.fixture(scope="module")
def record():
    with open(f"{HW}/test_1.xml", "rb") as f:
        recs = parse_marcxml_body(f.read())
    assert recs and recs[0]["error"] is None
    return recs[0]


def test_title(record):
    assert record["title"] == "“Pi of the Sky” Detector"


def test_date_published(record):
    assert record["date_published"] == "2010-01-26"


def test_authors_order_kept(record):
    assert [a["full_name"] for a in record["authors"]] == [
        "Małek, Katarzyna", "Batsch, Tadeusz"
    ]
    assert [a["surname"] for a in record["authors"]] == ["Małek", "Batsch"]
    assert record["authors"][0]["affiliations"] == [
        "Center for Theoretical Physics Polish Academy of Sciences"
    ]
    assert record["authors"][1]["affiliations"] == [
        "The Andrzej Soltan Institute for Nuclear Studies"
    ]


def test_source_and_doi(record):
    assert record["source"] == "Hindawi Publishing Corporation"
    assert record["dois"] == ["10.1155/2010/194946"]


def test_url_differentiation(record):
    assert record["pdf_urls"] == [
        "http://downloads.hindawi.com/journals/aa/2010/194946.pdf"
    ]
    assert record["xml_urls"] == [
        "http://downloads.hindawi.com/journals/aa/2010/194946.xml"
    ]
    assert record["splash_urls"] == ["http://dx.doi.org/10.1155/2010/194946"]


def test_publication_info(record):
    assert record["journal_title"] == "Advances in Astronomy"
    assert record["journal_year"] == 2010
    assert record["journal_issue"] == "898351"


def test_copyright_and_license(record):
    assert record["copyright_statement"] == (
        "Copyright \xa9 2010 Katarzyna Małek et al."
    )
    assert record["copyright_year"] == "2010"
    assert record["license"] == "CC-BY-3.0"
    assert record["license_url"] == "http://creativecommons.org/licenses/by/3.0/"


def test_oai_identifier(record):
    assert record["identifier"] == "oai:hindawi.com:10.1155/2010/194946"


def test_malformed_error_row():
    recs = parse_marcxml_body(b"<oops")
    assert len(recs) == 1 and recs[0]["error"] is not None


def test_spark_roundtrip(spark):
    import datetime

    from hepcrawl_spark.parsers.marcxml import parse_marcxml_pages

    with open(f"{HW}/test_1.xml", "rb") as f:
        body = f.read()
    pages = spark.createDataFrame(
        [("http://hindawi/oai", datetime.datetime(2024, 1, 1), body, None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    rows = parse_marcxml_pages(pages).collect()
    assert len(rows) == 1
    assert rows[0]["journal_title"] == "Advances in Astronomy"
