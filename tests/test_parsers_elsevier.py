"""Golden tests: Elsevier parser vs every *_expected.yml reference fixture."""

import glob
import os
import re

import pytest
import yaml

from hepcrawl_spark.parsers.elsevier import DOCTYPES_TO_HARVEST, parse_elsevier_body
from tests.conftest import FIXTURES

ELS = f"{FIXTURES}/elsevier"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ELS), reason="reference fixtures not available"
)

CASES = sorted(
    os.path.basename(p)[: -len("_expected.yml")]
    for p in glob.glob(f"{ELS}/*_expected.yml")
)

_FIELDS = {
    "title": "title", "abstract": "abstract", "artid": "artid",
    "year": "year", "journal_volume": "journal_volume",
    "journal_issue": "journal_issue", "journal_title": "journal_title",
    "copyright_holder": "copyright_holder",
    "copyright_statement": "copyright_statement",
    "copyright_year": "copyright_year", "license_url": "license_url",
    "license_statement": "license_statement", "article_type": "article_type",
    "publication_date": "publication_date", "document_type": "document_type",
    "publisher": "publisher", "page_start": "page_start",
    "page_end": "page_end", "material": "material", "keywords": "keywords",
    "collaborations": "collaborations",
}


def _ws(x):
    return re.sub(r"\s+", " ", x) if isinstance(x, str) else x


@pytest.mark.parametrize("case", CASES)
def test_elsevier_golden(case):
    with open(f"{ELS}/{case}.xml", "rb") as f:
        rec = parse_elsevier_body(f.read())[0]
    with open(f"{ELS}/{case}_expected.yml") as f:
        exp = yaml.safe_load(f)
    assert rec["error"] is None
    for mine, theirs in _FIELDS.items():
        if theirs in exp:
            g, e = rec[mine], exp[theirs]
            if (g or None) is None and (e or None) is None:
                continue
            assert str(g) == str(e), (mine, g, e)
    if "authors" in exp:
        assert [a["full_name"] for a in rec["authors"]] == [
            a["full_name"] for a in exp["authors"]
        ]
        got_affs = [[_ws(x) for x in a["affiliations"]] for a in rec["authors"]]
        want_affs = [
            [_ws(r["value"]) for r in a.get("raw_affiliations", [])]
            for a in exp["authors"]
        ]
        assert got_affs == want_affs
    if "dois" in exp:
        assert rec["dois"][0] == exp["dois"][0]["doi"]


def test_harvest_doctype_gate():
    # F2 companion: the doctype allowlist contains the 9 harvestable types
    assert "full-length article" in DOCTYPES_TO_HARVEST
    assert len(DOCTYPES_TO_HARVEST) == 9


def test_malformed_error_row():
    rec = parse_elsevier_body(b"<broken")[0]
    assert rec["error"] is not None
