"""Golden tests: NLM/IOP parser vs the reference fixture
(expected values mirror tests/unit/test_iop.py)."""

import os

import pytest

from hepcrawl_spark.parsers.nlm import parse_nlm_body
from tests.conftest import FIXTURES

IOP = f"{FIXTURES}/iop/xml"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(IOP), reason="reference fixtures not available"
)


@pytest.fixture(scope="module")
def record():
    with open(f"{IOP}/test_standard.xml", "rb") as f:
        recs = parse_nlm_body(f.read())
    assert recs and recs[0]["error"] is None
    return recs[0]


def test_abstract_and_dates(record):
    assert record["abstract"].startswith("Somatic BRAF mutation")
    assert record["date_published"] == "2015-03"
    assert record["journal_fpage"] == "336"
    assert record["journal_lpage"] == "343"
    assert record["page_nr"] == "8"


def test_dois_and_journal(record):
    assert record["dois"] == ["110.1309/AJCP4D7RXOBHLKGJ"]
    assert record["journal_title"] == "Am J Clin Pathol"
    assert record["journal_year"] == 2015
    assert record["journal_volume"] == "143"
    assert record["journal_issue"] == "3"
    assert record["journal_issn"] == ["1943-7722"]


def test_authors_and_affiliations(record):
    assert len(record["authors"]) == 6
    assert record["authors"][0]["full_name"] == "Roth, Rachel M"
    assert record["authors"][0]["affiliations"] == [
        "Department of Pathology, The Ohio State University Wexner "
        "Medical Center, Columbus"
    ]
    assert len(record["authors"][2]["affiliations"]) == 2


def test_copyright(record):
    assert record["copyright_holder"] == "American Society for Clinical Pathology"
    assert record["copyright_statement"] == (
        "Copyright\xa9 by the American Society for \n  Clinical Pathology"
    )


def test_pub_status_filter():
    body = (
        b"<Article><Journal><PubDate PubStatus='aheadofprint'>"
        b"<Year>2020</Year></PubDate></Journal>"
        b"<ArticleTitle>T</ArticleTitle></Article>"
    )
    assert parse_nlm_body(body) == []  # F3: aheadofprint dropped
    kept = parse_nlm_body(body, drop_statuses=False)
    assert len(kept) == 1 and kept[0]["pub_status"] == "aheadofprint"
