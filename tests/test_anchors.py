"""Anchor-text extraction + per-target rollup."""

import pyspark.sql.functions as F
import pytest

from hepcrawl_spark.operators.anchors import anchor_text_table, extract_anchors


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        # two pages on h1 both point at /t with the same phrase
        ("https://h1.example.org/a",
         '<p>x</p><a href="https://t.example.org/t">Great <b>Page</b></a>'),
        ("https://h1.example.org/b",
         '<a  class="x" href="https://t.example.org/t">great   page</a>'
         '<a href="https://t.example.org/t">Great Page</a>'),
        # a second host, different phrase + an empty-text image link
        ("https://h2.example.org/c",
         '<a href="https://t.example.org/t">the t page</a>'
         '<a href="https://t.example.org/u"><img src="i.png"/></a>'),
        # no anchors at all
        ("https://h3.example.org/d", "<html><body>plain</body></html>"),
    ]
    return spark.createDataFrame(rows, "url string, html string")


def test_extract_anchors_alignment_and_cleanup(spark, pages):
    got = {
        (r["src_url"], r["target_url"], r["anchor_text"])
        for r in extract_anchors(pages).collect()
    }
    assert ("https://h1.example.org/a", "https://t.example.org/t", "Great Page") in got
    # whitespace collapsed, attributes tolerated
    assert ("https://h1.example.org/b", "https://t.example.org/t", "great page") in got
    # inner markup stripped to empty
    assert ("https://h2.example.org/c", "https://t.example.org/u", "") in got
    assert len(got) == 5


def test_rollup_per_host_unique_guards_spam(spark, pages):
    t = {
        r["target_url"]: r
        for r in anchor_text_table(extract_anchors(pages)).collect()
    }
    r = t["https://t.example.org/t"]
    # h1 contributes 'Great Page' ONCE (duplicate on page b deduped),
    # 'great page' once; h2 contributes 'the t page'
    assert r["n_anchors"] == 3
    assert r["n_hosts"] == 2
    # counts all tie at 1 -> lexicographically smallest wins
    assert r["top_anchor"] == "Great Page"


def test_rollup_multiplicity_without_guard(spark, pages):
    t = {
        r["target_url"]: r
        for r in anchor_text_table(
            extract_anchors(pages), per_host_unique=False
        ).collect()
    }
    r = t["https://t.example.org/t"]
    assert r["n_anchors"] == 4  # the page-b duplicate now counts
    assert r["top_anchor"] == "Great Page"  # cnt 2 beats the singletons


def test_no_python_in_plan(spark, pages):
    plan = (
        anchor_text_table(extract_anchors(pages))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
