"""Build the in-repo golden-fixture table for the f5x_arxiv_golden gate.

Reads the REFERENCE arxiv fixture bodies (read-only) and writes:
  fixtures/arxiv_golden_pages.parquet  — (url, warc_ts, html) pages rows
  fixtures/arxiv_golden_expected.json  — per-record expected constants

The expected constants come ONLY from reference-provided expectations —
`sample_arxiv_record10_parsed.json` (the reference's own golden output for
that record) and the assertions in the reference's test suite
(`tests/unit/test_arxiv_all.py`: page_nr, document_type, collaborations per
feed record; `test_arxiv_single.py`-style DOI split for record0) — NOT from
running this repo's parser, so the driver gate checks byte-identity against
the reference, not a self-fulfilling recipe. Feed positions are mapped to
arxiv ids by scanning the fixture XML's <id> tags directly (a verbatim
field copy, independent of the parser under test).

Usage:  python tools/make_fixture_tables.py
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/tests/unit/responses/arxiv"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")

FEED_URL = "https://export.arxiv.org/oai2/golden/feed"
R0_URL = "https://export.arxiv.org/oai2/golden/record0"
R10_URL = "https://export.arxiv.org/oai2/golden/record10"

# Mirrored from the reference's tests/unit/test_arxiv_all.py expectations
# for sample_arxiv_record.xml (12 records, in document order).
FEED_PAGE_NR = [6, 8, 10, 11, None, 4, 8, 24, 23, None, None, 54]
FEED_DOCTYPE = [
    "conference paper", "conference paper", "conference paper",
    "conference paper", "article", "conference paper", "article",
    "article", "article", "conference paper", "thesis", "article",
]
FEED_COLLABS = [
    ["Planck"], ["IceCube"], ["JLQCD"], ["NuPRISM", "Hyper-K"],
    ["BICEP2", "Keck Array"], ["Planck"], ["DES"], [],
    ["Super-Kamiokande"], ["CMS"], [], ["NA61/SHINE", "T2K Beam Group"],
]
# reference test_arxiv_single: record0's 3-DOI string splits on ', ' / ';'
R0_DOIS = [
    "10.1103/PhysRevD.93.016005",
    "10.1103/PhysRevD.98.079901",
    "10.1103/PhysRevD.98.079903",
]


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def feed_ids(body: str) -> list[str]:
    """arXiv <id> values in document order — a verbatim field, extracted
    without the parser under test."""
    ids = []
    for rec in re.findall(r"<record[ >].*?</record>", body, re.S):
        m = re.search(r"<id>([^<]+)</id>", rec)
        ids.append(m.group(1) if m else None)
    return ids


def main():
    os.makedirs(OUT, exist_ok=True)
    feed_body = open(f"{REF}/sample_arxiv_record.xml", encoding="utf-8").read()
    r0_body = open(f"{REF}/sample_arxiv_record0.xml", encoding="utf-8").read()
    r10_body = open(f"{REF}/sample_arxiv_record10.xml", encoding="utf-8").read()

    ids = feed_ids(feed_body)
    assert len(ids) == 12 and all(ids), ids
    r0_id = re.search(r"<id>([^<]+)</id>", r0_body).group(1)
    r10_id = re.search(r"<id>([^<]+)</id>", r10_body).group(1)

    gold = json.load(open(f"{REF}/sample_arxiv_record10_parsed.json"))[0][
        "results_data"
    ][0]
    expected = []
    for pos, (eid, pn, dt, co) in enumerate(
        zip(ids, FEED_PAGE_NR, FEED_DOCTYPE, FEED_COLLABS)
    ):
        expected.append(
            {
                "url": FEED_URL, "arxiv_eprint": eid, "page_nr": pn,
                "document_type": dt, "n_authors": None,
                "collabs": ",".join(co), "dois_str": None,
                "title_md5": None, "abstract_md5": None, "authors_md5": None,
                "preprint_date": None, "license_url": None,
            }
        )
    expected.append(
        {
            "url": R0_URL, "arxiv_eprint": r0_id, "page_nr": None,
            "document_type": None, "n_authors": None, "collabs": None,
            "dois_str": ",".join(R0_DOIS), "title_md5": None,
            "abstract_md5": None, "authors_md5": None,
            "preprint_date": None, "license_url": None,
        }
    )
    expected.append(
        {
            "url": R10_URL, "arxiv_eprint": r10_id, "page_nr": None,
            "document_type": gold["document_type"][0],
            "n_authors": len(gold["authors"]), "collabs": None,
            "dois_str": None,
            "title_md5": _md5(gold["titles"][0]["title"]),
            "abstract_md5": _md5(gold["abstracts"][0]["value"]),
            "authors_md5": _md5("|".join(a["full_name"] for a in gold["authors"])),
            "preprint_date": gold["preprint_date"],
            "license_url": gold["license"][0]["url"],
        }
    )
    with open(f"{OUT}/arxiv_golden_expected.json", "w") as f:
        json.dump(expected, f, indent=1)

    from hepcrawl_spark.session import get_spark

    spark = get_spark(master="local[2]", shuffle_partitions=2)
    rows = [
        (FEED_URL, feed_body.encode("utf-8")),
        (R0_URL, r0_body.encode("utf-8")),
        (R10_URL, r10_body.encode("utf-8")),
    ]
    df = (
        spark.createDataFrame(rows, "url string, html binary")
        .withColumn("warc_ts", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("2024-01-01 00:00:00").cast("timestamp"))
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{OUT}/arxiv_golden_pages.parquet")
    print("wrote", OUT, "records:", len(expected))
    spark.stop()


# -- Elsevier + Crossref golden staging (round 5) -----------------------------
# Same discipline as the arxiv staging above: fixture BODIES to parquet,
# expected constants ONLY from the reference's *_expected.yml files
# (tests/unit/responses/{elsevier,crossref}), with '' and missing fields
# normalized to None exactly like the reference tests treat them.

ELS_REF = "/root/reference/tests/unit/responses/elsevier"
CR_REF = "/root/reference/tests/unit/responses/crossref"
APS_REF = "/root/reference/tests/unit/responses/aps"

# author-affiliation serialization for the authors/affs digests: units
# separators so real text can't collide with the join
AFF_SEP = "\x1f"   # between affiliations of one author
AUTHOR_SEP = "\x1e"  # between authors


def _nz(v):
    """'' and None collapse to None (the reference tests' `(x or None)`)."""
    if v is None:
        return None
    s = str(v)
    return s if s != "" else None


def _mdz(v):
    return _md5(str(v)) if _nz(v) is not None else None


def stage_yaml_golden():
    import glob

    import yaml

    out = {"elsevier": {"pages": [], "expected": []},
           "crossref": {"pages": [], "expected": []},
           "aps": {"pages": [], "expected": []},
           "hindawi": {"pages": [], "expected": []}}

    # Hindawi MARCXML golden: one fixture record; the expected constants
    # are mirrored VERBATIM from the reference's own test assertions
    # (tests/unit/test_hindawi.py:36-147 — title, date, authors/surnames/
    # affiliations, source, file/xml/splash urls, copyright, doi, journal,
    # license), not from running this repo's parser.
    hw_url = "https://www.hindawi.com/oai-pmh/golden/test_1"
    out["hindawi"]["pages"].append(
        (
            hw_url,
            open(
                "/root/reference/tests/unit/responses/hindawi/test_1.xml",
                "rb",
            ).read(),
        )
    )
    hw_authors = ["Małek, Katarzyna", "Batsch, Tadeusz"]
    out["hindawi"]["expected"].append(
        {
            "url": hw_url,
            "title_md5": _md5("“Pi of the Sky” Detector"),
            "date_published": "2010-01-26",
            "source": "Hindawi Publishing Corporation",
            "identifier": "oai:hindawi.com:10.1155/2010/194946",
            "doi": "10.1155/2010/194946",
            "n_authors": len(hw_authors),
            "authors_md5": _md5(AUTHOR_SEP.join(hw_authors)),
            "surnames": "Małek,Batsch",
            # the reference asserts per-author affiliation MEMBERSHIP
            # (affiliations[i] in author[i].affiliations) — mirrored as
            # boolean columns, not whole-list equality
            "aff1_match": True,
            "aff2_match": True,
            "journal_title": "Advances in Astronomy",
            "journal_year_str": "2010",
            "journal_issue": "898351",
            "copyright_md5": _md5(
                "Copyright \xa9 2010 Katarzyna Małek et al."
            ),
            "copyright_year": "2010",
            "license": "CC-BY-3.0",
            "license_url": "http://creativecommons.org/licenses/by/3.0/",
            "pdf_url": "http://downloads.hindawi.com/journals/aa/2010/194946.pdf",
            "xml_url": "http://downloads.hindawi.com/journals/aa/2010/194946.xml",
            "splash_url": "http://dx.doi.org/10.1155/2010/194946",
        }
    )

    # APS JATS golden: 5 *_expected.yml cases parsed by the reference's
    # jats parser (our parse_jats_pages path). Field mapping mirrors the
    # reference test suite (tests/unit/test_aps.py style assertions, also
    # mirrored in tests/test_parsers_aps.py::test_aps_jats_golden):
    # number_of_pages -> page_count, publication_date -> imprint_date.
    for case_path in sorted(glob.glob(f"{APS_REF}/*_expected.yml")):
        case = os.path.basename(case_path)[: -len("_expected.yml")]
        exp = yaml.safe_load(open(case_path))
        url = f"https://harvest.aps.org/golden/{case}"
        out["aps"]["pages"].append(
            (url, open(f"{APS_REF}/{case}.xml", "rb").read())
        )
        authors = exp.get("authors")
        out["aps"]["expected"].append(
            {
                "url": url,
                "title_md5": _mdz(exp.get("title")),
                "abstract_md5": _mdz(exp.get("abstract")),
                "artid": _nz(exp.get("artid")),
                "document_type": _nz(exp.get("document_type")),
                "journal_title": _nz(exp.get("journal_title")),
                "journal_volume": _nz(exp.get("journal_volume")),
                "journal_issue": _nz(exp.get("journal_issue")),
                "year_str": _nz(exp.get("year")),
                "imprint_date": _nz(exp.get("publication_date")),
                "n_pages": exp.get("number_of_pages"),
                "copyright_holder": _nz(exp.get("copyright_holder")),
                "copyright_year_str": _nz(exp.get("copyright_year")),
                "doi": _nz(exp["dois"][0]["doi"]) if exp.get("dois") else None,
                "n_authors": len(authors) if authors is not None else None,
                "authors_md5": _md5(
                    AUTHOR_SEP.join(a["full_name"] for a in authors)
                )
                if authors is not None
                else None,
                "affs_md5": _md5(
                    AUTHOR_SEP.join(
                        AFF_SEP.join(
                            r["value"] for r in a.get("raw_affiliations", [])
                        )
                        for a in authors
                    )
                )
                if authors is not None
                else None,
            }
        )

    for case_path in sorted(glob.glob(f"{ELS_REF}/*_expected.yml")):
        case = os.path.basename(case_path)[: -len("_expected.yml")]
        exp = yaml.safe_load(open(case_path))
        url = f"https://consyn.elsevier.com/golden/{case}"
        out["elsevier"]["pages"].append(
            (url, open(f"{ELS_REF}/{case}.xml", "rb").read())
        )
        authors = exp.get("authors")
        out["elsevier"]["expected"].append(
            {
                "url": url,
                "title_md5": _mdz(exp.get("title")),
                "abstract_md5": _mdz(exp.get("abstract")),
                "document_type": _nz(exp.get("document_type")),
                "article_type": _nz(exp.get("article_type")),
                "journal_title": _nz(exp.get("journal_title")),
                "publication_date": _nz(exp.get("publication_date")),
                "year_str": _nz(exp.get("year")),
                "doi": _nz(exp["dois"][0]["doi"]) if exp.get("dois") else None,
                "n_authors": len(authors) if authors is not None else None,
                "authors_md5": _md5("|".join(a["full_name"] for a in authors))
                if authors is not None
                else None,
                "collabs": ",".join(exp.get("collaborations") or [])
                if "collaborations" in exp
                else None,
            }
        )

    for case_path in sorted(glob.glob(f"{CR_REF}/*_expected.yml")):
        case = os.path.basename(case_path)[: -len("_expected.yml")]
        exp = yaml.safe_load(open(case_path))
        url = f"https://api.crossref.org/golden/{case}"
        out["crossref"]["pages"].append(
            (url, open(f"{CR_REF}/{case}.json", "rb").read())
        )
        authors = exp.get("authors")
        lic = exp.get("license")
        out["crossref"]["expected"].append(
            {
                "url": url,
                "doi": _nz(exp["dois"][0]["doi"]) if exp.get("dois") else None,
                "material": _nz(exp["dois"][0].get("material"))
                if exp.get("dois")
                else None,
                "title_md5": _mdz(exp.get("title")),
                "document_type": _nz(exp.get("document_type")),
                "journal_title": _nz(exp.get("journal_title")),
                "journal_volume": _nz(exp.get("journal_volume")),
                "journal_issue": _nz(exp.get("journal_issue")),
                "year_str": _nz(exp.get("year")),
                "page_start": _nz(exp.get("page_start")),
                "page_end": _nz(exp.get("page_end")),
                "imprint_date": _nz(exp.get("imprints")),
                "n_authors": len(authors) if authors is not None else None,
                "authors_md5": _md5("|".join(a["full_name"] for a in authors))
                if authors is not None
                else None,
                "licenses": ",".join(
                    l["url"] for l in lic if l.get("url")
                )
                if lic is not None
                else None,
            }
        )

    from hepcrawl_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(master="local[2]", shuffle_partitions=2)
    for src in ("elsevier", "crossref", "aps", "hindawi"):
        with open(f"{OUT}/{src}_golden_expected.json", "w") as f:
            json.dump(out[src]["expected"], f, indent=1)
        df = (
            spark.createDataFrame(out[src]["pages"], "url string, html binary")
            .withColumn(
                "warc_ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
            )
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{OUT}/{src}_golden_pages.parquet"
        )
        print(f"staged {src}: {len(out[src]['expected'])} cases")
    spark.stop()


if __name__ == "__main__":
    main()
    stage_yaml_golden()
