"""Golden tests: Elsevier structured reference extraction vs every expected
YML with a references section — full field parity."""

import glob
import os
import re
import xml.etree.ElementTree as ET

import pytest
import yaml

from hepcrawl_spark.parsers.elsevier import extract_elsevier_references
from hepcrawl_spark.parsers.jats import _strip_ns
from tests.conftest import FIXTURES

ELS = f"{FIXTURES}/elsevier"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ELS), reason="reference fixtures not available"
)

CASES = [
    os.path.basename(p)[: -len("_expected.yml")]
    for p in sorted(glob.glob(f"{ELS}/*_expected.yml"))
]


@pytest.mark.parametrize("case", CASES)
def test_elsevier_references_golden(case):
    with open(f"{ELS}/{case}_expected.yml") as f:
        exp = yaml.safe_load(f).get("references")
    if not exp:
        pytest.skip("fixture has no references")
    body = re.sub(r"<!DOCTYPE[^>]*>", "", open(f"{ELS}/{case}.xml").read())
    root = ET.fromstring(body)
    _strip_ns(root)
    refs = extract_elsevier_references(root)
    assert len(refs) == len(exp)
    for g, e in zip(refs, exp):
        er = e.get("reference", {}) or {}
        pi = er.get("publication_info", {}) or {}
        if "label" in er:
            assert g["label"] == er["label"]
        if "dois" in er:
            assert g["dois"] == er["dois"]
        if er.get("authors"):
            assert g["authors"] == [
                a["full_name"] for a in er["authors"]
                if a.get("inspire_role") == "author"
            ]
        for mine, theirs in (
            ("journal_title", "journal_title"),
            ("journal_volume", "journal_volume"),
            ("page_start", "page_start"),
            ("year", "year"),
            ("artid", "artid"),
        ):
            if theirs in pi:
                assert str(g[mine]) == str(pi[theirs]), (mine, g[mine], pi[theirs])
