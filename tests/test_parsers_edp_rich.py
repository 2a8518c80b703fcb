"""Golden tests: EDP 'rich' EDPSArticle parser (expected values mirror
tests/unit/test_edp.py rich-format assertions)."""

import os

import pytest

from hepcrawl_spark.parsers.edp_rich import parse_edp_rich_body
from tests.conftest import FIXTURES

EDP = f"{FIXTURES}/edp"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EDP), reason="reference fixtures not available"
)


@pytest.fixture(scope="module")
def record():
    with open(f"{EDP}/rich.xml", "rb") as f:
        recs = parse_edp_rich_body(f.read())
    assert recs and recs[0]["error"] is None
    return recs[0]


def test_title_and_tex_subtitle(record):
    assert record["title"] == "A representative sample of Be stars"
    assert record["subtitle"] == "II. $K$ band spectroscopy"  # TeX verbatim


def test_date_and_pages(record):
    assert record["date_published"] == "2000-01"
    assert record["page_nr"] == "13"
    assert record["journal_fpage"] == "65"
    assert record["journal_lpage"] == "77"


def test_publication_info(record):
    assert record["journal_title"] == "Astronomy and Astrophysics Supplement Series"
    assert record["journal_year"] == 2000
    assert record["journal_volume"] == "141"
    assert record["dois"] == ["10.1051/aas:2000310"]


def test_authors_with_label_resolved_affiliations(record):
    assert [a["full_name"] for a in record["authors"]] == [
        "Clark, J.S.", "Steele, I.A."
    ]
    assert record["authors"][0]["affiliations"] == [
        "Astronomy Centre, CPES, University of Sussex, Brighton, BN1 9QH, UK"
    ]
    assert record["authors"][1]["affiliations"] == [
        "Astrophysics Research Institute, Liverpool John Moores University, "
        "Liverpool, L41 1LD, UK"
    ]


def test_malformed_error_row():
    recs = parse_edp_rich_body(b"<EDPSArticle><broken")
    assert len(recs) == 1 and recs[0]["error"] is not None
