"""CCNet-style bigram-LM perplexity scoring."""

import math

import pyspark.sql.functions as F
import pytest

from hepcrawl_spark.operators import perplexity as P


@pytest.fixture(scope="module")
def target(spark):
    rows = [(i, "the cat sat on the mat") for i in range(8)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),        # in-domain
        (1, "the cat sat"),                   # in-domain prefix
        (2, "zqx wvv kjj qqp zzl mmn"),       # gibberish
        (3, "single"),                        # < 2 tokens -> NULL
        (4, ""),                              # empty -> NULL
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ranking_and_nulls(spark, target, docs):
    model = P.fit_bigram_lm(target, num_buckets=64)
    out = {r["doc_id"]: r for r in P.lm_score(docs, model).collect()}
    assert out[0]["perplexity"] < out[2]["perplexity"]
    assert out[1]["perplexity"] < out[2]["perplexity"]
    assert out[3]["cross_entropy"] is None and out[3]["n_bigrams"] == 0
    assert out[4]["cross_entropy"] is None


def test_exact_cross_entropy(spark, target, docs):
    """Replay the fold in plain python over the same md5 buckets."""
    import hashlib

    B, a = 64, 1.0
    model = P.fit_bigram_lm(target, num_buckets=B, alpha=a)

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:7], 16) % B

    toks = "the cat sat".split()
    s = 0.0
    for i in range(len(toks) - 1):
        c1 = model.unigram[bucket(toks[i])]
        c2 = model.bigram[bucket(toks[i] + " " + toks[i + 1])]
        s += math.log((c2 + a) / (c1 + a * B))
    want = -s / (len(toks) - 1)
    got = {
        r["doc_id"]: r for r in P.lm_score(docs, model).collect()
    }[1]["cross_entropy"]
    assert got == pytest.approx(want, rel=1e-12)


def test_terciles_and_filter(spark, target):
    rows = [(i, "the cat sat on the mat") for i in range(6)] + [
        (10 + i, f"zz{i} qq{i} ww{i} vv{i}") for i in range(6)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = P.fit_bigram_lm(target, num_buckets=64)
    lab = P.perplexity_terciles(P.lm_score(docs, model))
    by_id = {r["doc_id"]: r["ppl_bucket"] for r in lab.collect()}
    assert by_id[0] == "head"          # in-domain = lowest perplexity
    assert by_id[15] in ("middle", "tail")
    kept = P.ccnet_filter(target, docs, num_buckets=64)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 0 in ids and len(ids) < len(rows)


def test_no_python_in_plan(spark, target, docs):
    model = P.fit_bigram_lm(target, num_buckets=64)
    plan = (
        P.lm_score(docs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
