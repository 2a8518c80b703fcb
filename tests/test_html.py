"""HTML -> visible text extraction."""

import pytest

from hepcrawl_spark.functions.html import extract_text, html_to_text

DOC = b"""<html><head><title>A &amp; B</title>
<script>var x = "<p>not text</p>";</script>
<style>.c { color: red }</style></head>
<body><h1>Heading</h1>
<p>Para one with <b>bold</b> and &lt;escaped&gt;.</p>
<noscript>fallback junk</noscript>
<div>  spaced
   lines </div></body></html>"""


def test_extract_text_semantics():
    text, title = extract_text(DOC)
    assert title == "A & B"
    assert text == "Heading Para one with bold and <escaped>. spaced lines"


def test_extract_null_and_mojibake():
    assert extract_text(None) == (None, None)
    text, _ = extract_text(b"<p>ok \xff\xfe broken</p>")
    assert "ok" in text and "broken" in text  # errors='replace', no raise


def test_html_to_text_dataframe(spark):
    pages = spark.createDataFrame(
        [(1, bytearray(DOC)), (2, bytearray(b"<p>two</p>")), (3, None)],
        "page_id long, html binary",
    )
    out = {r["page_id"]: r for r in html_to_text(pages).collect()}
    assert out[1]["text"].startswith("Heading Para one")
    assert out[1]["title"] == "A & B"
    assert out[2]["text"] == "two" and out[2]["title"] is None
    assert out[3]["text"] is None
    # passthrough columns intact
    assert set(out[1].asDict()) == {"page_id", "html", "text", "title"}


def test_no_shuffle(spark):
    from hepcrawl_spark.plans import exchange_count

    pages = spark.createDataFrame(
        [(1, bytearray(b"<p>x</p>"))], "page_id long, html binary"
    )
    assert exchange_count(html_to_text(pages)) == 0


def test_block_separator_handles_implicit_close(spark):
    """'<p>a<p>b' (the implicitly-closed form real pages use constantly)
    must yield two blocks in paragraph mode, and text before a block start
    must not merge into the block; the default flat join is unchanged."""
    from hepcrawl_spark.functions.html import extract_text

    t, _ = extract_text("<p>first para<p>second para</p>", "\n\n")
    assert t == "first para\n\nsecond para"
    t2, _ = extract_text("<div>intro<p>para</p></div>", "\n\n")
    assert t2 == "intro\n\npara"
    flat, _ = extract_text("<p>first para<p>second para</p>")
    assert flat == "first para second para"
