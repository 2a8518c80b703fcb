"""Golden tests: JATS structured reference extraction vs the APS expected
YMLs — every (label, dois, title, authors, pub-info) field across all
fixtures with reference lists must match."""

import glob
import os
import re
import xml.etree.ElementTree as ET

import pytest
import yaml

from hepcrawl_spark.parsers.jats import _strip_ns, extract_references
from tests.conftest import FIXTURES

APS = f"{FIXTURES}/aps"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(APS), reason="reference fixtures not available"
)

CASES = [
    os.path.basename(p)[: -len("_expected.yml")]
    for p in sorted(glob.glob(f"{APS}/*_expected.yml"))
]


def _refs_for(case):
    body = re.sub(
        r"<!DOCTYPE[^>]*>", "", open(f"{APS}/{case}.xml").read()
    )
    root = ET.fromstring(body)
    _strip_ns(root)
    return extract_references(root)


@pytest.mark.parametrize("case", CASES)
def test_reference_extraction_golden(case):
    with open(f"{APS}/{case}_expected.yml") as f:
        exp = yaml.safe_load(f).get("references")
    if not exp:
        pytest.skip("fixture has no references")
    refs = _refs_for(case)
    assert len(refs) == len(exp)
    for g, e in zip(refs, exp):
        er = e.get("reference", {})
        pi = er.get("publication_info", {})
        if "label" in er:
            assert g["label"] == er["label"]
        if "dois" in er:
            assert g["dois"] == er["dois"]
        if er.get("title"):
            assert g["title"] == er["title"]["title"]
        if er.get("authors"):
            assert g["authors"] == [a["full_name"] for a in er["authors"]]
        if "journal_title" in pi:
            assert g["journal_title"] == pi["journal_title"]
        if "journal_volume" in pi:
            assert g["journal_volume"] == pi["journal_volume"]
        if "page_start" in pi:
            assert g["page_start"] == pi["page_start"]
        if "year" in pi:
            assert g["year"] == pi["year"]


def test_references_through_spark(spark):
    import datetime

    from hepcrawl_spark.parsers.jats import parse_jats_references_pages

    with open(f"{APS}/PhysRevX.7.021022.xml", "rb") as f:
        body = f.read()
    pages = spark.createDataFrame(
        [("https://aps/x", datetime.datetime(2024, 1, 1), body, None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    rows = parse_jats_references_pages(pages).collect()
    assert len(rows) == 42
    assert all(r["record_doi"] == "10.1103/PhysRevX.7.021022" for r in rows)
    first = [r for r in rows if r["label"] == "1"][0]
    assert first["dois"] == ["10.1007/JHEP04(2015)163"]
    assert first["authors"][0] == "Almheiri, A."
