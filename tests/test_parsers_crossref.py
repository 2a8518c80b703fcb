"""Golden tests for the Crossref parser vs the reference's *_expected.yml."""

import glob
import json
import os

import pytest
import yaml

from hepcrawl_spark.parsers.crossref import parse_crossref_body
from tests.conftest import FIXTURES

CR = f"{FIXTURES}/crossref"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CR), reason="reference fixtures not available"
)

CASES = sorted(
    os.path.basename(p)[: -len("_expected.yml")]
    for p in glob.glob(f"{CR}/*_expected.yml")
)


@pytest.mark.parametrize("case", CASES)
def test_crossref_golden(case):
    with open(f"{CR}/{case}.json", "rb") as f:
        rec = parse_crossref_body(f.read())[0]
    with open(f"{CR}/{case}_expected.yml") as f:
        exp = yaml.safe_load(f)

    assert rec["error"] is None
    if "dois" in exp:
        assert rec["doi"] == exp["dois"][0]["doi"]
        assert rec["material"] == exp["dois"][0]["material"]
    if "title" in exp:
        assert rec["title"] == exp["title"]
    if "document_type" in exp:
        assert rec["document_type"] == exp["document_type"]
    if "journal_title" in exp:
        assert rec["journal_title"] == exp["journal_title"]
    if "journal_volume" in exp:
        assert rec["journal_volume"] == exp["journal_volume"]
    if "journal_issue" in exp:
        assert rec["journal_issue"] == exp["journal_issue"]
    if "year" in exp:
        assert rec["year"] == exp["year"]
    if "page_start" in exp:
        assert rec["page_start"] == exp["page_start"]
    if "page_end" in exp:
        assert rec["page_end"] == exp["page_end"]
    if "imprints" in exp:
        assert rec["imprint_date"] == exp["imprints"]
    if "authors" in exp:
        got = [a["full_name"] for a in rec["authors"]]
        want = [a["full_name"] for a in exp["authors"]]
        assert got == want
    if "license" in exp:
        assert rec["license_urls"] == [l["url"] for l in exp["license"] if l.get("url")]


def test_unknown_type_maps_to_article():
    with open(f"{CR}/sample_crossref_record_with_unknown_type.json", "rb") as f:
        rec = parse_crossref_body(f.read())[0]
    assert rec["document_type"] == "article"


def test_malformed_json_error_row():
    rec = parse_crossref_body(b"{not json")[0]
    assert rec["error"] is not None
