"""Golden-record tests: byte-identical extraction vs the reference fixtures
(tests/unit/responses/arxiv/**, the oracle named by the north rule).

Expected values mirror the reference's own test expectations
(tests/unit/test_arxiv_all.py) for the same inputs.
"""

import json
import os

import pytest

from hepcrawl_spark.parsers.arxiv import parse_arxiv_body
from tests.conftest import FIXTURES

ARXIV = f"{FIXTURES}/arxiv"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ARXIV), reason="reference fixtures not available"
)


@pytest.fixture(scope="module")
def feed_records():
    with open(f"{ARXIV}/sample_arxiv_record.xml", "rb") as f:
        return parse_arxiv_body(f.read())


def test_record_count(feed_records):
    assert len(feed_records) == 12


def test_page_nr(feed_records):
    expected = [6, 8, 10, 11, None, 4, 8, 24, 23, None, None, 54]
    assert [r["page_nr"] for r in feed_records] == expected


def test_document_types(feed_records):
    expected = [
        "conference paper", "conference paper", "conference paper",
        "conference paper", "article", "conference paper", "article",
        "article", "article", "conference paper", "thesis", "article",
    ]
    assert [r["document_type"] for r in feed_records] == expected


def test_collaborations(feed_records):
    expected = [
        ["Planck"], ["IceCube"], ["JLQCD"], ["NuPRISM", "Hyper-K"],
        ["BICEP2", "Keck Array"], ["Planck"], ["DES"], [],
        ["Super-Kamiokande"], ["CMS"], [], ["NA61/SHINE", "T2K Beam Group"],
    ]
    assert [r["collaborations"] for r in feed_records] == expected


def test_authors_full_names(feed_records):
    expected = [
        {"Wang, Jieci", "Tian, Zehua", "Jing, Jiliang", "Fan, Heng"},
        {"Montaruli, Teresa Maria"},
        {"Sinya"},
        {"Scott, Mark"},
        {"Ade, P.", "Ahmed, Z.", "Aikin, R.W.", "Alexander, K.D."},
        {"Burigana, Günter", "Trombetti, Tiziana", "Paoletti, Daniela",
         "Mandolesi, Nazzareno", "Natoli, Paolo"},
        {"Bufanda, E.", "Hollowood, D."},
        {"Saxton Walton, Curtis J.", "Younsi, Ziri", "Wu, Kinwah"},
        {"Abe, K.", "Suzuki, Y.", "Vagins, M.R.", "Nantais, C.M.",
         "Martin, J.F.", "de Perio, P."},
        {"Chudasama, Ruchi", "Dutta, Dipanwita"},
        {"Battista, Emmanuele"},
        {"Abgrall, N.", "Aduszkiewicz, A.", "Zimmerman, E.D.", "Zwaska, R.",
         "Berns, L.", "Fiorentini, G.A.", "Yu, M."},
    ]
    got = [{a["full_name"] for a in r["authors"]} for r in feed_records]
    assert got == expected


def test_affiliations_record7(feed_records):
    affs = [a["affiliations"] for a in feed_records[7]["authors"]]
    assert affs == [["Technion", "DESY"], ["U.Frankfurt"], []]


def test_private_note_warnings(feed_records):
    assert feed_records[4]["private_note"] == (
        "WARNING: Colon in authors before  P. Ade : "
        "Check author list for collaboration names!"
    )
    assert feed_records[0]["private_note"] is None


def test_report_numbers(feed_records):
    assert feed_records[2]["report_numbers"] == ["YITP-2016-26"]
    assert feed_records[6]["report_numbers"] == [
        "DES 2016-0158", "FERMILAB PUB-16-231-AE"
    ]


def test_category_normalization(feed_records):
    # chao-dyn (obsolete) -> nlin.CD
    assert feed_records[11]["arxiv_categories"] == ["hep-ex", "nucl-ex", "nlin.CD"]


def test_doi_split():
    # the single-record fixture carries a 3-DOI string split on ', ' and ';'
    with open(f"{ARXIV}/sample_arxiv_record0.xml", "rb") as f:
        rec = parse_arxiv_body(f.read())[0]
    assert rec["dois"] == [
        "10.1103/PhysRevD.93.016005",
        "10.1103/PhysRevD.98.079901",
        "10.1103/PhysRevD.98.079903",
    ]


def test_byte_identical_golden_record10():
    """The north-rule invariant: byte-identical extracted text per url."""
    with open(f"{ARXIV}/sample_arxiv_record10.xml", "rb") as f:
        rec = parse_arxiv_body(f.read())[0]
    with open(f"{ARXIV}/sample_arxiv_record10_parsed.json") as f:
        gold = json.load(f)[0]["results_data"][0]
    assert rec["title"] == gold["titles"][0]["title"]
    assert rec["abstract"] == gold["abstracts"][0]["value"]
    assert rec["public_note"] == gold["public_notes"][0]["value"]
    assert rec["preprint_date"] == gold["preprint_date"]
    assert rec["license_url"] == gold["license"][0]["url"]
    assert rec["document_type"] == gold["document_type"][0]
    assert [a["full_name"] for a in rec["authors"]] == [
        a["full_name"] for a in gold["authors"]
    ]
    assert rec["arxiv_eprint"] == gold["arxiv_eprints"][0]["value"]


def test_single_record_fixtures_all_parse():
    count = 0
    for i in list(range(12)):
        p = f"{ARXIV}/sample_arxiv_record{i}.xml"
        if not os.path.exists(p):
            continue
        with open(p, "rb") as f:
            recs = parse_arxiv_body(f.read())
        assert recs and recs[0]["error"] is None, p
        assert recs[0]["arxiv_eprint"]
        count += 1
    assert count >= 10


def test_malformed_body_yields_error_row():
    recs = parse_arxiv_body(b"<broken")
    assert len(recs) == 1
    assert recs[0]["error"] is not None


def test_spark_roundtrip(spark):
    """Through the real Arrow/pandas UDF path."""
    import datetime

    from hepcrawl_spark.parsers.arxiv import parse_arxiv_pages

    with open(f"{ARXIV}/sample_arxiv_record.xml", "rb") as f:
        body = f.read()
    pages = spark.createDataFrame(
        [("http://export.arxiv.org/oai2", datetime.datetime(2024, 1, 1), body, None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    recs = parse_arxiv_pages(pages)
    assert recs.count() == 12
    rows = recs.orderBy("arxiv_eprint").collect()
    assert rows[0]["arxiv_eprint"] == "1512.07978"
