"""Golden tests: APS JSON fallback parser (expected values mirror
tests/unit/test_aps.py) + the APS JATS XML fixtures through the JATS parser
(expected = *_expected.yml)."""

import glob
import os

import pytest
import yaml

from hepcrawl_spark.parsers.aps import parse_aps_body
from hepcrawl_spark.parsers.jats import parse_jats_body
from tests.conftest import FIXTURES

APS = f"{FIXTURES}/aps"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(APS), reason="reference fixtures not available"
)


@pytest.fixture(scope="module")
def json_record():
    with open(f"{APS}/aps_single_response.json", "rb") as f:
        recs = parse_aps_body(f.read())
    assert len(recs) == 1
    return recs[0]


def test_json_title_abstract(json_record):
    assert json_record["title"] == (
        "You can run, you can hide: The epidemiology and statistical "
        "mechanics of zombies"
    )
    assert json_record["abstract"].startswith("We use a popular fictional disease")


def test_json_fields(json_record):
    r = json_record
    assert r["date_published"] == "2015-11-02"
    assert r["journal_year"] == 2015
    assert r["page_nr"] == 11
    assert r["doi"] == "10.1103/PhysRevE.92.052801"
    assert r["license_url"] == "http://creativecommons.org/licenses/by/3.0/"
    assert r["collaborations"] == ["OSQAR Collaboration"]
    assert r["journal_title"] == "Phys. Rev. E"
    assert r["journal_volume"] == "92"
    assert r["journal_issue"] == "5"


def test_json_affiliation_id_resolution(json_record):
    # J3: every Person author resolves affiliationIds against the
    # article-level affiliations dict
    assert len(json_record["authors"]) == 4
    assert all(a["affiliations"] for a in json_record["authors"])


APS_JATS_CASES = sorted(
    os.path.basename(p)[: -len("_expected.yml")]
    for p in glob.glob(f"{APS}/*_expected.yml")
)


@pytest.mark.parametrize("case", APS_JATS_CASES)
def test_aps_jats_golden(case):
    with open(f"{APS}/{case}.xml", "rb") as f:
        rec = parse_jats_body(f.read())[0]
    with open(f"{APS}/{case}_expected.yml") as f:
        exp = yaml.safe_load(f)
    assert rec["error"] is None
    simple = {
        "title": "title", "abstract": "abstract", "artid": "artid",
        "year": "year", "journal_volume": "journal_volume",
        "journal_issue": "journal_issue", "journal_title": "journal_title",
        "copyright_holder": "copyright_holder",
        "copyright_statement": "copyright_statement",
        "copyright_year": "copyright_year",
        "page_count": "number_of_pages", "license_url": "license_url",
        "license_statement": "license_statement",
        "article_type": "article_type",
        "imprint_date": "publication_date", "document_type": "document_type",
        "publisher": "publisher",
    }
    for mine, theirs in simple.items():
        if theirs in exp:
            assert str(rec[mine]) == str(exp[theirs]), (mine, rec[mine], exp[theirs])
    if "dois" in exp:
        assert rec["dois"] == [d["doi"] for d in exp["dois"]]
    if "authors" in exp:
        assert [a["full_name"] for a in rec["authors"]] == [
            a["full_name"] for a in exp["authors"]
        ]
        got_affs = [a["affiliations"] for a in rec["authors"]]
        want_affs = [
            [r["value"] for r in a.get("raw_affiliations", [])]
            for a in exp["authors"]
        ]
        assert got_affs == want_affs


def test_jats_date_absence_handled():
    with open(f"{APS}/PhysRevD.96.095036_no_date_nodes.xml", "rb") as f:
        rec = parse_jats_body(f.read())[0]
    assert rec["error"] is None
    assert rec["imprint_date"] is None and rec["year"] is None
