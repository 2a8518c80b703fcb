"""tohep — hepcrawl-record -> INSPIRE hep-record normalization.

Re-expresses the reference's whole-record shaping stage:
- ``_normalize_hepcrawl_record``  (reference/hepcrawl/tohep.py:89-148):
  flat spider items -> nested titles/abstracts/imprints/copyright/
  publication_info.
- ``hepcrawl_to_hep``             (reference/hepcrawl/tohep.py:170-357):
  hepcrawl dict -> hep (INSPIRE literature schema) dict via the public
  inspire-schemas ``LiteratureBuilder``; the subset of builder semantics
  that function exercises is reimplemented here (empty-value pruning,
  sourced dicts, license-URL -> license-name, collaboration
  normalization, collections -> flags/document types, int page count).
- ``hep_to_hep``                  (reference/hepcrawl/tohep.py:151-167):
  already-hep records only get their ``documents`` patched (the J4
  operator, operators/records.py) and an acquisition_source.

The record shape is deeply nested and schema-variable, so the Spark
representation is a JSON string column transformed by an Arrow-batched
``mapInPandas`` (``tohep_normalize_pages``): records stay on executors, the
transform is narrow (no shuffle), and downstream relational work projects
the scalar columns it needs. Golden parity: the reference's own
``responses/tohep/*.yaml`` fixtures (tests/test_tohep.py).
"""

from __future__ import annotations

import json
import re
from typing import Iterator
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

# ---------------------------------------------------------------------------
# small public-semantics helpers (inspire-utils behavior, reimplemented)
# ---------------------------------------------------------------------------

_LICENSE_PATH = re.compile(r"/licenses/(?P<code>[-\w]+)(?:/(?P<version>[.\d]+))?")
_PUBLIC_DOMAIN = re.compile(r"/publicdomain(?:/(?P<kind>[-\w]+))?(?:/(?P<version>[.\d]+))?")
_COLLAB_AND = re.compile(r"\s+(?:and|&)\s+", re.IGNORECASE)
_COLLAB_LEADING = re.compile(r"^\s*(?:the\b)?\s*", re.IGNORECASE)
_COLLAB_TRAILING = re.compile(r"\s*\bcollaborations?\b\s*$", re.IGNORECASE)


def get_license_from_url(url: str | None) -> str | None:
    """License display name from a license URL.

    'http://creativecommons.org/licenses/by/3.0/' -> 'CC BY 3.0';
    arxiv.org license urls -> 'arXiv <code> <version>'; public-domain CC
    urls -> 'CC0 ...'/'public domain'. Unknown hosts raise ValueError (the
    caller keeps its explicit license string in that case)."""
    if not url:
        return None
    parts = urlsplit(url, scheme="http")
    host = parts.netloc.lower()
    if host == "creativecommons.org":
        if "publicdomain" in parts.path:
            m = _PUBLIC_DOMAIN.match(parts.path)
            if m is None or not any(m.groups()):
                return "public domain"
            words = ["CC0"] + [g for g in m.groups() if g]
            return " ".join(words)
        words = ["CC"]
        m = _LICENSE_PATH.match(parts.path)
        if m:
            words.extend(g.upper() for g in m.groups() if g)
        return " ".join(words)
    if host == "arxiv.org":
        words = ["arXiv"]
        m = _LICENSE_PATH.match(parts.path)
        if m:
            words.extend(g for g in m.groups() if g)
        return " ".join(words)
    raise ValueError(f"unknown license URL {url!r}")


def normalize_collaboration(collaboration: str | None) -> list[str]:
    """'OSQAR Collaboration' -> ['OSQAR']; 'A and B Collaborations' ->
    ['A', 'B']; parenthesized input unwrapped."""
    if not collaboration:
        return []
    collaboration = collaboration.strip()
    if collaboration.startswith("(") and collaboration.endswith(")"):
        collaboration = collaboration[1:-1]
    out = []
    for part in _COLLAB_AND.split(collaboration):
        part = _COLLAB_LEADING.sub("", part)
        part = _COLLAB_TRAILING.sub("", part)
        part = part.strip()
        if part:
            out.append(part)
    return out


def _empty(v) -> bool:
    return v is None or v == "" or v == [] or v == {}


def _pruned(d: dict) -> dict:
    return {k: v for k, v in d.items() if not _empty(v)}


# ---------------------------------------------------------------------------
# the flat -> nested hepcrawl normalization (tohep.py:89-148)
# ---------------------------------------------------------------------------

_PUBINFO_KEYS = (
    "pubinfo_freetext", "journal_volume", "journal_title", "journal_year",
    "journal_issue", "journal_fpage", "journal_lpage", "journal_artid",
    "journal_doctype",
)


def normalize_hepcrawl_record(item: dict, source: str) -> dict:
    """Flat spider item -> nested hepcrawl record (exact reference
    semantics, including the empty-string placeholders the builder later
    prunes)."""
    item = dict(item)
    if "related_article_doi" in item:
        item["dois"] = item.get("dois", []) + item.pop("related_article_doi")

    item["titles"] = [{
        "title": item.pop("title", ""),
        "subtitle": item.pop("subtitle", ""),
        "source": item.pop("source", source),
    }]
    item["abstracts"] = [{"value": item.pop("abstract", ""), "source": source}]
    item["imprints"] = [{"date": item.pop("date_published", "")}]
    item["copyright"] = [{
        "holder": item.pop("copyright_holder", ""),
        "year": item.pop("copyright_year", ""),
        "statement": item.pop("copyright_statement", ""),
        "material": item.pop("copyright_material", ""),
    }]
    if any(item.get(k) for k in _PUBINFO_KEYS):
        pub = {
            "journal_title": item.pop("journal_title", ""),
            "journal_volume": item.pop("journal_volume", ""),
            "journal_issue": item.pop("journal_issue", ""),
            "artid": item.pop("journal_artid", ""),
            "page_start": item.pop("journal_fpage", ""),
            "page_end": item.pop("journal_lpage", ""),
            "note": item.pop("journal_doctype", ""),
            "pubinfo_freetext": item.pop("pubinfo_freetext", ""),
            "pubinfo_material": item.pop("pubinfo_material", ""),
        }
        if item.get("journal_year"):
            pub["year"] = int(item.pop("journal_year"))
        item["publication_info"] = [pub]
    for k in _PUBINFO_KEYS + ("pubinfo_material",):
        item.pop(k, None)
    return item


# ---------------------------------------------------------------------------
# hepcrawl -> hep (tohep.py:170-357 + the LiteratureBuilder subset it uses)
# ---------------------------------------------------------------------------

_PUBLICATION_TYPES = ["introductory", "lectures", "review", "manual"]
_DOCUMENT_TYPES = ["book", "note", "report", "proceedings", "thesis"]


class _Builder:
    """The slice of the public inspire-schemas LiteratureBuilder that
    ``hepcrawl_to_hep`` exercises. Every ``add_*`` prunes empty values and
    skips entries whose primary value is empty; ``_sourced`` dicts default
    ``source`` to the builder source."""

    def __init__(self, source: str):
        self.source = source
        self.rec: dict = {}

    def _append(self, key: str, entry: dict, primary: str | None = None):
        entry = _pruned(entry)
        if not entry or (primary is not None and primary not in entry):
            return
        self.rec.setdefault(key, []).append(entry)

    def _sourced(self, source: str | None = None, **kw) -> dict:
        kw["source"] = source or self.source
        return kw

    # -- list fields ---------------------------------------------------------
    def add_author(self, full_name, raw_affiliations):
        self._append(
            "authors",
            {
                "full_name": full_name,
                "raw_affiliations": [
                    self._sourced(value=v) for v in raw_affiliations
                ],
            },
            primary="full_name",
        )

    def add_title(self, title, subtitle, source):
        self._append(
            "titles", self._sourced(source, title=title, subtitle=subtitle),
            primary="title",
        )

    def add_abstract(self, abstract, source):
        self._append(
            "abstracts", self._sourced(source, value=abstract), primary="value"
        )

    def add_arxiv_eprint(self, arxiv_id, categories):
        self._append(
            "arxiv_eprints",
            {"value": arxiv_id, "categories": categories},
            primary="value",
        )

    def add_doi(self, doi, material):
        self._append(
            "dois", self._sourced(value=doi, material=material), primary="value"
        )

    def add_private_note(self, note):
        self._append("_private_notes", self._sourced(value=note), primary="value")

    def add_public_note(self, note, source):
        self._append(
            "public_notes", self._sourced(source, value=note), primary="value"
        )

    def add_license(self, url, license, material):
        try:
            from_url = get_license_from_url(url)
            if from_url is not None:
                license = from_url
        except ValueError:
            pass
        self._append(
            "license", {"url": url, "license": license, "material": material}
        )

    def add_collaboration(self, collaboration):
        for c in normalize_collaboration(collaboration):
            self._append("collaborations", {"value": c}, primary="value")

    def add_imprint_date(self, date):
        self._append("imprints", {"date": date}, primary="date")

    def add_copyright(self, holder, material, statement):
        self._append(
            "copyright",
            {"holder": holder, "material": material, "statement": statement},
        )

    def add_preprint_date(self, date):
        if not _empty(date):
            self.rec["preprint_date"] = date

    def add_acquisition_source(self, method, date, source, submission_number):
        self.rec["acquisition_source"] = _pruned(
            {
                "method": method,
                "datetime": date,
                "source": source,
                "submission_number": submission_number,
            }
        )

    def add_number_of_pages(self, n):
        if n is not None:
            self.rec["number_of_pages"] = n

    def add_publication_info(self, **kw):
        self._append("publication_info", _pruned(kw))

    def add_report_number(self, report_number, source):
        self._append(
            "report_numbers", self._sourced(source, value=report_number),
            primary="value",
        )

    def add_url(self, url):
        self._append("urls", {"value": url}, primary="value")

    def add_document(self, **kw):
        self._append("documents", _pruned(kw), primary="key")

    def add_publication_type(self, t):
        self.rec.setdefault("publication_type", []).append(t)

    def add_document_type(self, t):
        self.rec.setdefault("document_type", []).append(t)

    def set_flag(self, key, value):
        self.rec[key] = value

    @property
    def record(self) -> dict:
        out = dict(self.rec)
        out.setdefault("_collections", ["Literature"])
        out.setdefault("curated", False)
        return out


def hepcrawl_to_hep(crawler_record: dict) -> dict:
    """hepcrawl-format dict -> hep-format dict (tohep.py:170-357)."""
    b = _Builder(source=crawler_record["acquisition_source"]["source"])

    for author in crawler_record.get("authors", []):
        b.add_author(
            author["full_name"],
            [a.get("value") for a in author.get("affiliations", []) if a.get("value")],
        )
    for t in crawler_record.get("titles", []):
        b.add_title(t.get("title"), t.get("subtitle"), t.get("source"))
    for a in crawler_record.get("abstracts", []):
        b.add_abstract(a.get("value"), a.get("source"))
    for e in crawler_record.get("arxiv_eprints", []):
        b.add_arxiv_eprint(e.get("value"), e.get("categories"))
    for d in crawler_record.get("dois", []):
        b.add_doi(d.get("value"), d.get("material"))
    for n in crawler_record.get("private_notes", []):
        b.add_private_note(n)
    for n in crawler_record.get("public_notes", []):
        b.add_public_note(n.get("value"), n.get("source"))
    for li in crawler_record.get("license", []):
        b.add_license(li.get("url"), li.get("license"), li.get("material"))
    for c in crawler_record.get("collaborations", []):
        b.add_collaboration(c.get("value"))
    for im in crawler_record.get("imprints", []):
        b.add_imprint_date(im.get("date"))
    for c in crawler_record.get("copyright", []):
        b.add_copyright(c.get("holder"), c.get("material"), c.get("statement"))
    b.add_preprint_date(crawler_record.get("preprint_date"))

    acq = crawler_record.get("acquisition_source", {})
    b.add_acquisition_source(
        method=acq["method"],
        date=acq["datetime"],
        source=acq["source"],
        submission_number=acq["submission_number"],
    )
    try:
        b.add_number_of_pages(int(crawler_record.get("page_nr", [])[0]))
    except (TypeError, ValueError, IndexError):
        pass

    added_doc_type = False
    for collection in crawler_record.get("collections", []):
        c = collection["primary"].strip().lower()
        if c == "arxiv":
            continue
        elif c == "citeable":
            b.set_flag("citeable", True)
        elif c == "core":
            b.set_flag("core", True)
        elif c == "noncore":
            b.set_flag("core", False)
        elif c == "published":
            b.set_flag("refereed", True)
        elif c == "withdrawn":
            b.set_flag("withdrawn", True)
        elif c in _PUBLICATION_TYPES:
            b.add_publication_type(c)
        elif c == "bookchapter":
            added_doc_type = True
            b.add_document_type("book chapter")
        elif c == "conferencepaper":
            added_doc_type = True
            b.add_document_type("conference paper")
        elif c in _DOCUMENT_TYPES:
            added_doc_type = True
            b.add_document_type(c)
    if not added_doc_type:
        b.add_document_type("article")

    pub = crawler_record.get("publication_info", [{}])[0]
    b.add_publication_info(
        year=pub.get("year"),
        artid=pub.get("artid"),
        page_end=pub.get("page_end"),
        page_start=pub.get("page_start"),
        journal_issue=pub.get("journal_issue"),
        journal_title=pub.get("journal_title"),
        journal_volume=pub.get("journal_volume"),
        pubinfo_freetext=pub.get("pubinfo_freetext"),
        material=pub.get("pubinfo_material"),
    )
    for r in crawler_record.get("report_numbers", []):
        b.add_report_number(r.get("value"), r.get("source"))
    for u in crawler_record.get("urls", []):
        b.add_url(u.get("value"))
    for d in crawler_record.get("documents", []):
        b.add_document(
            description=d.get("description"),
            fulltext=d.get("fulltext"),
            hidden=d.get("hidden"),
            key=d["key"],
            material=d.get("material"),
            original_url=d.get("original_url"),
            url=d["url"],
        )
    return b.record


def hep_to_hep(hep_record: dict, record_files: list[dict]) -> dict:
    """Already-hep records: only patch documents (tohep.py:151-167).
    ``record_files``: [{'name', 'path'}]. The array-column twin is
    operators/records.patch_document_urls."""
    if not record_files:
        return hep_record
    index = {f["name"].rsplit("/", 1)[-1]: f["path"] for f in record_files}
    new_docs = []
    for doc in hep_record.get("documents", []):
        doc = dict(doc)
        url = doc.get("old_url") or doc.get("url") or ""
        base = url.rsplit("/", 1)[-1] if url else ""
        if url and base in index:
            doc["old_url"] = doc.get("url")
            doc["url"] = index[base]
            doc.setdefault("key", base)
        elif url:
            # unmatched: restore the pre-pipeline url, but NEVER null a doc
            # that only ever had `url` (the reference raises KeyError on
            # document['old_url'] there; keep-the-url is the lossless analog
            # — round-2 ADVICE).
            doc["url"] = doc.get("old_url") or doc.get("url")
        new_docs.append(doc)
    hep_record["documents"] = new_docs
    return hep_record


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

TOHEP_SCHEMA = StructType(
    [
        StructField("record_id", StringType()),
        StructField("hep_json", StringType()),
        StructField("title", StringType()),
        StructField("document_types", StringType()),
        StructField("license_name", StringType()),
        StructField("collaborations", StringType()),
        StructField("journal_title", StringType()),
        StructField("year", StringType()),
        StructField("number_of_pages", StringType()),
    ]
)


def tohep_normalize_pages(
    records: DataFrame,
    json_col: str = "record_json",
    id_col: str = "record_id",
    pre_normalize_source: str | None = None,
) -> DataFrame:
    """hepcrawl-record JSON column -> hep-record JSON column + the scalar
    projections relational consumers (and the driver oracle) care about.

    Narrow mapInPandas; record bytes never shuffle. When
    ``pre_normalize_source`` is set, flat spider items are first run through
    ``normalize_hepcrawl_record`` (the two-stage reference lifecycle)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[json_col]):
                rec = json.loads(blob)
                if pre_normalize_source is not None:
                    rec = normalize_hepcrawl_record(rec, pre_normalize_source)
                hep = hepcrawl_to_hep(rec)
                pub = hep.get("publication_info", [{}])[0]
                out.append(
                    (
                        str(rid),
                        json.dumps(hep, sort_keys=True, ensure_ascii=False),
                        (hep.get("titles") or [{}])[0].get("title"),
                        ",".join(hep.get("document_type", [])),
                        (hep.get("license") or [{}])[0].get("license"),
                        ",".join(
                            c["value"] for c in hep.get("collaborations", [])
                        ),
                        pub.get("journal_title"),
                        str(pub["year"]) if "year" in pub else None,
                        str(hep["number_of_pages"])
                        if "number_of_pages" in hep
                        else None,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in TOHEP_SCHEMA.fields])

    return records.mapInPandas(batches, TOHEP_SCHEMA)
