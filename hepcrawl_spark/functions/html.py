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
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

_SKIP = {"script", "style", "noscript", "template"}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
        elif tag == "title":
            self._in_title = True

    def handle_endtag(self, tag):
        if tag in _SKIP and self._skip_depth:
            self._skip_depth -= 1
        elif tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._skip_depth:
            return
        chunk = data.split()
        if not chunk:
            return
        (self.title_parts if self._in_title else self.parts).append(
            " ".join(chunk)
        )


def extract_text(html: bytes | str | None) -> tuple[str | None, str | None]:
    """-> (visible text, title) — driver/test-side single-doc twin."""
    if html is None:
        return None, None
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _Extractor()
    p.feed(html)
    p.close()
    return " ".join(p.parts), " ".join(p.title_parts) or None


def html_to_text(
    pages: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Append ``out_col`` (visible text) + ``title`` extracted from the
    binary/string html column. Narrow mapInPandas; all other columns carry
    through unchanged."""
    keep = list(pages.schema.fields)
    out_schema = StructType(
        keep + [StructField(out_col, StringType()), StructField("title", StringType())]
    )
    names = [f.name for f in keep]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, titles = [], []
            for blob in pdf[html_col]:
                t, ti = extract_text(blob)
                texts.append(t)
                titles.append(ti)
            out = pdf[names].copy()
            out[out_col] = texts
            out["title"] = titles
            yield out

    return pages.mapInPandas(run, out_schema)
