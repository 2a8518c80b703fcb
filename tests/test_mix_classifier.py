"""Temperature mixing, semantic dedup, and the hashed perceptron."""

import pyspark.sql.functions as F

from hepcrawl_spark.operators import classifier, mix
from hepcrawl_spark.operators.dedup import semantic_dedup


# -- temperature_mix ---------------------------------------------------------

def test_temperature_budgets_largest_remainder():
    # sqrt weights: floor(sqrt(n)*1000) -> 3162, 9486, 20000; W = 32648
    counts = {"small": 10, "mid": 90, "big": 400}
    b = mix.temperature_budgets(counts, 100, tau=0.5)
    assert sum(b.values()) == 100
    # integer quotas 9/29/61 leave one seat; largest remainder is "small"
    assert b == {"small": 10, "mid": 29, "big": 61}
    # tau=1.0 approaches the natural distribution
    b1 = mix.temperature_budgets(counts, 100, tau=1.0)
    assert b1["big"] > b["big"] and b1["small"] < b["small"]


def test_temperature_budgets_edges():
    assert mix.temperature_budgets({"a": 5, "b": 0}, 0) == {"a": 0, "b": 0}
    assert mix.temperature_budgets({"a": 0, "b": 0}, 7) == {"a": 0, "b": 0}
    b = mix.temperature_budgets({"a": 1}, 3)
    assert b == {"a": 3}  # budget may exceed the domain's count


def test_temperature_mix_deterministic_and_budgeted(spark):
    docs = spark.createDataFrame(
        [(i, "d" + str(len(str(i))), "txt") for i in range(1, 301)],
        "doc_id bigint, source string, text string",
    )
    out = mix.temperature_mix(docs, 60, domain_col="source").collect()
    assert len(out) == 60
    per = {}
    for r in out:
        per[r["source"]] = per.get(r["source"], 0) + 1
        assert r["domain_rank"] <= r["budget"]
    # flattening: the 9-doc 1-digit domain is over-represented vs natural
    assert per["d1"] / 9 > per["d3"] / 201
    # determinism: same seed -> identical id set; ranks repartition-stable
    again = mix.temperature_mix(
        docs.repartition(7), 60, domain_col="source"
    ).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in out}


# -- semantic_dedup ----------------------------------------------------------

def test_semantic_dedup_earlier_neighbor_rule(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),   # kept (first in bucket)
            (2, [1.0, 0.05], 0),  # ~dup of 1 -> dropped
            (3, [0.0, 1.0], 0),   # orthogonal -> kept
            (4, [0.0, 1.0], 1),   # other bucket -> kept (no cross-bucket pairs)
            (5, [0.05, 1.0], 1),  # ~dup of 4 -> dropped
        ],
        "vec_id bigint, embedding array<float>, label int",
    )
    out = {r["vec_id"]: r["kept"] for r in semantic_dedup(emb, 0.95).collect()}
    assert out == {1: True, 2: False, 3: True, 4: True, 5: False}


def test_semantic_dedup_chain_is_aggressive(spark):
    # a~b and b~c but a!~c: earlier-neighbor drops BOTH b and c
    emb = spark.createDataFrame(
        # angles 0deg / 20deg / 40deg: cos(0,20)=0.94, cos(20,40)=0.94,
        # cos(0,40)=0.77 — adjacent pairs clear 0.9, the ends do not
        [(1, [1.0, 0.0], 0), (2, [0.9397, 0.342], 0), (3, [0.766, 0.6428], 0)],
        "vec_id bigint, embedding array<float>, label int",
    )
    out = {r["vec_id"]: r["kept"] for r in semantic_dedup(emb, 0.9).collect()}
    assert out == {1: True, 2: False, 3: False}


# -- perceptron --------------------------------------------------------------

def _labeled(spark):
    pos = [(i, "neutrino oscillation detector beam flux physics", 1)
           for i in range(10)]
    neg = [(100 + i, "casino bonus spins win money deals online", -1)
           for i in range(10)]
    return spark.createDataFrame(
        pos + neg, "doc_id bigint, text string, label int"
    )


def test_perceptron_learns_separable_corpus(spark):
    docs = _labeled(spark)
    w = classifier.perceptron_train(docs, num_buckets=64, epochs=3)
    assert len(w) == 64 and any(x != 0 for x in w)
    scored = classifier.perceptron_score(docs, w).collect()
    assert all(
        (r["score"] > 0) == (r["label"] > 0) for r in scored
    ), "separable corpus must be classified perfectly"


def test_perceptron_deterministic_under_repartition(spark):
    docs = _labeled(spark)
    w1 = classifier.perceptron_train(docs, num_buckets=32, epochs=2)
    w2 = classifier.perceptron_train(docs.repartition(5), num_buckets=32, epochs=2)
    assert w1 == w2  # integer arithmetic -> partitioning-invariant


def test_perceptron_converged_early_stop(spark):
    docs = _labeled(spark)
    # epoch 1 separates this corpus; later epochs find no misclassified
    # docs and break, so more epochs change nothing
    w3 = classifier.perceptron_train(docs, num_buckets=64, epochs=3)
    w9 = classifier.perceptron_train(docs, num_buckets=64, epochs=9)
    assert w3 == w9


def test_temperature_mix_null_domains_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "a", "t"), (2, None, "t"), (3, "a", "t"), (4, "b", "t")],
        "doc_id bigint, source string, text string",
    )
    out = mix.temperature_mix(docs, 3, domain_col="source").collect()
    assert all(r["source"] is not None for r in out)
    assert len(out) == 3


def test_semantic_dedup_over_ivf_cells(spark):
    """The production path: bucket = the IVF coarse cell from
    similarity.ivf_build (spill=1 -> one cell per vector), so the
    per-bucket self-join is bounded by the largest k-means cell."""
    from hepcrawl_spark.operators.similarity import (
        ivf_build,
        synthesize_clustered_embeddings,
    )

    emb = synthesize_clustered_embeddings(
        spark, 200, dim=16, n_clusters=8, spread=0.15
    )
    _, assigned = ivf_build(emb, n_cells=8, iterations=4, spill=1)
    out = semantic_dedup(
        assigned, threshold=0.9, id_col="vec_id",
        vec_col="embedding", bucket_col="cell",
    )
    rows = out.collect()
    assert len(rows) == 200
    kept = sum(1 for r in rows if r["kept"])
    # tight synthetic clusters -> heavy within-cell redundancy removed,
    # but at least one exemplar per cell survives
    assert 8 <= kept < 200
    cells_kept = {r["cell"] for r in rows if r["kept"]}
    cells_all = {r["cell"] for r in rows}
    assert cells_kept == cells_all
