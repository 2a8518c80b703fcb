"""Record-level harvest gates (F2/F4) as tested column predicates.

F2 — Elsevier harvest-worthiness (reference/hepcrawl/parsers/elsevier.py:
686-696 ``should_record_be_harvested`` over DOCTYPES_TO_HARVEST, :79-89):
harvest iff article_type is in the allowlist AND title AND journal_title
AND journal_volume AND (artid OR page_start) are all truthy. The reference
evaluates this per record in Python; here it is one JVM boolean column —
pushed into the scan when the inputs are parquet columns.

F4 — EDP open-access two-way frontier split (reference/hepcrawl/spiders/
edp_spider.py:125-127, 243-253): records with a DOI in an open-access
journal go fetch their PDF (a second request wave); everything else builds
the record directly. Expressed as a boolean split column so BOTH branches
stay one DataFrame until the caller forks them — no double scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..parsers.elsevier import DOCTYPES_TO_HARVEST

# reference/hepcrawl/spiders/edp_spider.py:125-127
OPEN_ACCESS_JOURNALS = ["EPJ Web of Conferences"]


def _truthy(c: Column) -> Column:
    """Python truthiness for a string column: not NULL and not ''."""
    return c.isNotNull() & (c != F.lit(""))


def harvest_worthy(
    article_type: Column | str = "article_type",
    title: Column | str = "title",
    journal_title: Column | str = "journal_title",
    journal_volume: Column | str = "journal_volume",
    artid: Column | str = "artid",
    page_start: Column | str = "page_start",
) -> Column:
    """F2: the full Elsevier harvest-worthiness conjunction as one column."""
    col = lambda c: F.col(c) if isinstance(c, str) else c
    return (
        col(article_type).isin(DOCTYPES_TO_HARVEST)
        & _truthy(col(title))
        & _truthy(col(journal_title))
        & _truthy(col(journal_volume))
        & (_truthy(col(artid)) | _truthy(col(page_start)))
    )


def needs_pdf_fetch(
    doi: Column | str = "doi",
    journal_title: Column | str = "journal_title",
    oa_journals: list[str] | None = None,
) -> Column:
    """F4 predicate: fetch the PDF iff the record has a DOI and its journal
    is open access (edp_spider.py:243: ``if dois and journal_title in
    self.OPEN_ACCESS_JOURNALS``)."""
    col = lambda c: F.col(c) if isinstance(c, str) else c
    return _truthy(col(doi)) & col(journal_title).isin(
        oa_journals or OPEN_ACCESS_JOURNALS
    )


def split_by_open_access(
    records: DataFrame,
    doi_col: str = "doi",
    journal_col: str = "journal_title",
    oa_journals: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """F4: (pdf_fetch_wave, direct_build) fork of the record stream."""
    flag = needs_pdf_fetch(doi_col, journal_col, oa_journals)
    flagged = records.withColumn("_needs_pdf", flag)
    return (
        flagged.filter(F.col("_needs_pdf")).drop("_needs_pdf"),
        flagged.filter(~F.col("_needs_pdf")).drop("_needs_pdf"),
    )


def host_suffixes(host_col: Column | str, max_labels: int = 8) -> Column:
    """All domain suffixes of a host, most-specific first: ``a.b.c`` ->
    ``[a.b.c, b.c, c]``. Pure array expression (split + transform + slice)
    so the suffix chain is built JVM-side with no Python and no explode
    until the caller asks for one."""
    h = F.col(host_col) if isinstance(host_col, str) else host_col
    labels = F.split(F.lower(h), r"\.")
    n = F.size(labels)
    # keep the SHORTEST max_labels suffixes: blocklist entries are mostly
    # 2-3-label registrable domains, so a deep subdomain chain must still
    # emit them — truncating from the long end would let a 9+-label host
    # evade a 2-label blocklist entry
    return F.transform(
        F.sequence(F.greatest(n - max_labels, F.lit(0)), n - 1),
        lambda i: F.array_join(F.slice(labels, i + 1, n), "."),
    )


def blocklist_gate(
    urls: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    entry_col: str = "entry",
) -> DataFrame:
    """UT1-style domain blocklist filter: a URL is blocked when its host
    equals a blocklist entry OR is a subdomain of one (suffix match on
    label boundaries — ``ads.example.org`` matches entry ``example.org``
    but ``notexample.org`` does not).

    Plan shape for 100 TB: explode the (short, bounded) suffix chain of
    each host, LEFT SEMI join against the blocklist to find blocked ids,
    then LEFT ANTI the input against that. The blocklist is a curated
    list (UT1 is ~4 M lines, a few MB) — always broadcast, so the whole
    gate is two broadcast joins and ZERO shuffles of the corpus.
    """
    bl = F.broadcast(
        blocklist.select(F.lower(F.col(entry_col)).alias("_bl_entry")).distinct()
    )
    sfx = urls.select(
        F.lower(F.col(host_col)).alias("_h"),
        F.explode(host_suffixes(host_col)).alias("_sfx"),
    ).distinct()
    blocked_hosts = (
        sfx.join(bl, sfx["_sfx"] == bl["_bl_entry"], "left_semi")
        .select(F.col("_h").alias("_blocked_host"))
        .distinct()
    )
    return urls.join(
        F.broadcast(blocked_hosts),
        F.lower(F.col(host_col)) == F.col("_blocked_host"),
        "left_anti",
    )
