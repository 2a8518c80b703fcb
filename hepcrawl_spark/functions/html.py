"""HTML -> visible text extraction (the html:binary -> text:string leg).

The engine's input table (BASELINE.json input_hint) carries both
``html: binary`` and ``text: string``; real crawls only have the former.
This module supplies the extraction the reference gets from Scrapy
selectors (response.xpath('//text()') patterns throughout the spiders),
rebuilt on the stdlib ``html.parser`` so it runs in this container:

- script/style/noscript/template subtrees are dropped whole;
- character/entity references decode (convert_charrefs);
- text nodes join with single spaces, whitespace collapsed — the C4
  whitespace-collapse contract, so downstream token/quality features see
  the same normal form either way;
- a title column is extracted separately (head text is not body text).

Vectorized mapInPandas over the page rows: the parse is pure python per
document (HTMLParser is a character-level state machine — there is nothing
Arrow can vectorize here), but batches cross to the worker once, bytes
decode with errors='replace' so a mojibake page degrades instead of
killing the task, and the plan stays narrow (no shuffle).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_SKIP = {"script", "style", "noscript", "template"}
# block-level elements whose close (or self-close, for br/hr) ends a text
# block when the caller asks for paragraph structure
_BLOCK = {
    "p", "div", "li", "td", "th", "tr", "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "pre", "section", "article", "br", "hr",
}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[list[str]] = []   # completed text blocks
        self.parts: list[str] = []          # the open block
        self.title_parts: list[str] = []
        self._skip_depth = 0
        self._in_title = False

    def _flush(self):
        if self.parts:
            self.blocks.append(self.parts)
            self.parts = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
        elif tag == "title":
            self._in_title = True
        elif tag in _BLOCK:
            # a block START also ends any open text run: '<p>a<p>b' (the
            # implicitly-closed form real pages use constantly) must yield
            # two blocks, and '<div>intro<p>para</p></div>' must not merge
            # intro into the paragraph
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP and self._skip_depth:
            self._skip_depth -= 1
        elif tag == "title":
            self._in_title = False
        elif tag in _BLOCK:
            self._flush()

    def handle_data(self, data):
        if self._skip_depth:
            return
        chunk = data.split()
        if not chunk:
            return
        (self.title_parts if self._in_title else self.parts).append(
            " ".join(chunk)
        )

    def text(self, block_separator: str = " ") -> str:
        """Joined visible text. The default single-space separator is
        byte-identical to the historical flat join (the c23 oracle
        contract); a blank-line separator preserves block structure so
        downstream paragraph-level operators (``dedup.paragraph_dedup``)
        see real paragraphs."""
        self._flush()
        return block_separator.join(" ".join(b) for b in self.blocks)


def extract_text(
    html: bytes | str | None, block_separator: str = " "
) -> tuple[str | None, str | None]:
    """-> (visible text, title) — driver/test-side single-doc twin."""
    if html is None:
        return None, None
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _Extractor()
    p.feed(html)
    p.close()
    return p.text(block_separator), " ".join(p.title_parts) or None


def html_to_text(
    pages: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
    block_separator: str = " ",
) -> DataFrame:
    """Append ``out_col`` (visible text) + ``title`` extracted from the
    binary/string html column. Narrow mapInPandas; all other columns carry
    through unchanged. ``block_separator="\n\n"`` keeps block boundaries
    as blank lines (paragraph-preserving mode for the corpus pipeline);
    the default flat join is byte-identical to the historical behavior."""
    keep = list(pages.schema.fields)
    out_schema = StructType(
        keep + [StructField(out_col, StringType()), StructField("title", StringType())]
    )
    names = [f.name for f in keep]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, titles = [], []
            for blob in pdf[html_col]:
                t, ti = extract_text(blob, block_separator)
                texts.append(t)
                titles.append(ti)
            out = pdf[names].copy()
            out[out_col] = texts
            out["title"] = titles
            yield out

    return pages.mapInPandas(run, out_schema)


# robots meta directives (page-level crawler obligations): a compliant
# crawler must not INDEX a noindex page (drop it from the corpus/search
# index — still fetchable) and must not FOLLOW links off a nofollow page.
# Lookahead regexes keep the attribute ORDER free (name before or after
# content); Java regex only — the oracle twins synthesize fixed-order tags.
_META_ROBOTS_NOINDEX_RE = (
    r'(?is)<meta\b(?=[^>]*\bname\s*=\s*["\']?robots)'
    r'(?=[^>]*\bcontent\s*=\s*["\'][^"\'>]*noindex)[^>]*>'
)
_META_ROBOTS_NOFOLLOW_RE = (
    r'(?is)<meta\b(?=[^>]*\bname\s*=\s*["\']?robots)'
    r'(?=[^>]*\bcontent\s*=\s*["\'][^"\'>]*nofollow)[^>]*>'
)


def meta_robots_noindex(html_col) -> "Column":
    """True when the page carries <meta name=robots content=...noindex...>."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    return c.cast("string").rlike(_META_ROBOTS_NOINDEX_RE)


def meta_robots_nofollow(html_col) -> "Column":
    """True when the page carries <meta name=robots content=...nofollow...>
    (every outlink on the page must be treated as rel=nofollow)."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    return c.cast("string").rlike(_META_ROBOTS_NOFOLLOW_RE)
