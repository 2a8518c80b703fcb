"""Golden tests: PoS pex-dc parser (expected values mirror
tests/unit/test_pos.py) and the EDP JATS-format feed through the shared
JATS parser."""

import os

import pytest

from hepcrawl_spark.parsers.jats import parse_jats_body
from hepcrawl_spark.parsers.pos import parse_pos_body
from tests.conftest import FIXTURES

POS = f"{FIXTURES}/pos"
EDP = f"{FIXTURES}/edp"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(POS), reason="reference fixtures not available"
)


@pytest.fixture(scope="module")
def pos_record():
    with open(f"{POS}/sample_pos_record.xml", "rb") as f:
        recs = parse_pos_body(f.read())
    assert recs and recs[0]["error"] is None
    return recs[0]


def test_pos_title_and_source(pos_record):
    assert pos_record["title"] == "Heavy Flavour Physics Review"
    assert pos_record["source"] == "Sissa Medialab"


def test_pos_publication_info(pos_record):
    assert pos_record["journal_title"] == "PoS"
    assert pos_record["journal_volume"] == "LATTICE 2013"
    assert pos_record["artid"] == "001"
    assert pos_record["year"] == 2014


def test_pos_authors_order_and_initials(pos_record):
    assert [a["full_name"] for a in pos_record["authors"]] == [
        "El-Khadra, Aida", "MacDonald, M.T.",
    ]
    assert pos_record["authors"][0]["affiliations"] == [
        "INFN and Universit\xe0 di Firenze"
    ]


def test_pos_language_english_dropped(pos_record):
    assert pos_record["language"] is None  # F6


def test_pos_doctype(pos_record):
    assert pos_record["document_type"] == "conference paper"


def test_edp_jats_via_shared_parser():
    with open(f"{EDP}/jats.xml", "rb") as f:
        rec = parse_jats_body(f.read())[0]
    assert rec["error"] is None
    assert rec["journal_title"] == "Astronomy and Astrophysics"
    assert rec["title"].startswith("Dielectronic recombination")
    assert rec["authors"]


def test_pos_malformed_error_row():
    recs = parse_pos_body(b"<nope")
    assert len(recs) == 1 and recs[0]["error"] is not None
