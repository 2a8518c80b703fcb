"""BM25 inverted index + ranked retrieval."""

import math

import pyspark.sql.functions as F
import pytest

from hepcrawl_spark.operators.search import build_bm25_index, bm25_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "spark engine spark"),           # tf(spark)=2, dl=3
        (1, "spark"),                        # tf(spark)=1, dl=1
        (2, "duck engine"),                  # no 'spark'
        (3, "totally unrelated words here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def index(docs):
    return build_bm25_index(docs)


def test_index_stats(index):
    assert index.n_docs == 4 and index.total_len == 10
    p = {
        (r["term"], r["doc_id"]): r
        for r in index.postings.collect()
    }
    assert p[("spark", 0)]["tf"] == 2 and p[("spark", 0)]["dl"] == 3
    assert p[("spark", 0)]["df"] == 2  # docs 0 and 1
    assert p[("engine", 2)]["df"] == 2


def test_bm25_exact_score_and_ranking(spark, index):
    q = spark.createDataFrame([(0, "spark")], "query_id long, term string")
    out = {r["doc_id"]: r for r in bm25_topk(index, q, k=10).collect()}
    assert set(out) == {0, 1}

    def bm25(tf, dl, df, n=4, avgdl=2.5, k1=1.2, b=0.75):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert out[0]["score"] == pytest.approx(bm25(2, 3, 2), rel=1e-12)
    assert out[1]["score"] == pytest.approx(bm25(1, 1, 2), rel=1e-12)
    # doc 1 is shorter; with tf 1 vs 2 the longer doc still wins here
    assert out[0]["rank"] == 1 if out[0]["score"] > out[1]["score"] else 2


def test_multi_term_query_sums_contributions(spark, index):
    q = spark.createDataFrame(
        [(7, "spark"), (7, "engine"), (7, "engine")],  # dup term collapses
        "query_id long, term string",
    )
    out = {r["doc_id"]: r["score"] for r in bm25_topk(index, q, k=10).collect()}
    solo = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(
            index,
            spark.createDataFrame([(7, "engine")], "query_id long, term string"),
            k=10,
        ).collect()
    }
    # doc 0 matches both terms: its combined score exceeds either alone
    assert out[0] > solo.get(0, 0.0)
    assert set(out) == {0, 1, 2}


def test_no_python_and_broadcast_join(spark, index):
    q = spark.createDataFrame([(0, "spark")], "query_id long, term string")
    plan = bm25_topk(index, q)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # query terms broadcast the postings


def test_rrf_fusion(spark):
    from hepcrawl_spark.operators.search import rrf_fuse

    bm25 = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id long, doc_id long, rank long",
    )
    ann = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2), (0, 10, 3)],
        "query_id long, doc_id long, rank long",
    )
    out = {r["doc_id"]: r for r in rrf_fuse([bm25, ann], k=4).collect()}
    # doc 11 appears rank2+rank1, doc 10 rank1+rank3 -> 11 wins
    assert out[11]["rank"] == 1 and out[10]["rank"] == 2
    assert out[11]["n_lists"] == 2
    assert out[11]["rrf_score"] == pytest.approx(1 / 62 + 1 / 61, rel=1e-12)
    assert out[12]["n_lists"] == 1  # single-list docs still rank
