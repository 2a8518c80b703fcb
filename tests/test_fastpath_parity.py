"""Bit-parity tests for the round-6 vectorized fast paths.

Each optimized operator must produce EXACTLY what the JVM expression
implementation it replaced produced (the DuckDB oracle gates hash the
values). These tests pin the Python/NumPy twins against the original
expression recipes on edge-case inputs the synthetic tables never hit.
"""

import math

import pyspark.sql.functions as F
import pytest

from hepcrawl_spark.operators.dsir import (
    DEFAULT_BUCKETS,
    dsir_score,
    gram_buckets,
    py_gram_ids,
)

EDGE_TEXTS = [
    "",
    " ",
    "one",
    "two words",
    "  leading and   trailing\t tabs \n newlines \x0b vt \f ff \r cr  ",
    "MiXeD CaSe AND UPPER",
    "unicode éÉ straße İstanbul",
    "a b c d e f g h i j",
    "repeat repeat repeat repeat",
]


def test_py_gram_ids_matches_jvm_gram_buckets(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(EDGE_TEXTS)], "i int, text string")
    jvm = {
        r["i"]: r["g"]
        for r in df.select("i", gram_buckets("text", DEFAULT_BUCKETS).alias("g")).collect()
    }
    for i, t in enumerate(EDGE_TEXTS):
        assert py_gram_ids(t, DEFAULT_BUCKETS) == jvm[i], f"text={t!r}"


def test_dsir_score_bit_identical_to_jvm_fold(spark):
    # the fold the Arrow path replaced: sequential double accumulation in
    # gram order through a broadcast array — rebuilt inline here
    lr = [math.sin(b) / 7.0 for b in range(64)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)], "doc_id int, text string"
    )
    arr = spark.createDataFrame([(list(lr),)], "__lr: array<double>")
    old = {
        r["doc_id"]: r["logw"]
        for r in df.crossJoin(F.broadcast(arr))
        .withColumn(
            "logw",
            F.aggregate(
                gram_buckets("text", len(lr)),
                F.lit(0.0),
                lambda acc, b: acc + F.element_at(F.col("__lr"), (b + 1).cast("int")),
            ),
        )
        .collect()
    }
    new = {r["doc_id"]: r["logw"] for r in dsir_score(df, lr).collect()}
    assert new == old  # exact float equality, not approx


def test_embedding_neardup_pairs_matches_bruteforce(spark):
    import numpy as np

    from hepcrawl_spark.operators.dedup import embedding_neardup_pairs

    rng = np.random.RandomState(7)
    rows = []
    for i in range(60):
        v = rng.randn(8).astype("float32")
        rows.append((i, [float(x) for x in v], i % 3))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_pairs(emb, threshold=0.2).collect()
    }
    want = {}
    by_label = {}
    for i, v, l in rows:
        by_label.setdefault(l, []).append((i, np.asarray(v, dtype=np.float64)))
    for l, items in by_label.items():
        for ai in range(len(items)):
            for bi in range(ai + 1, len(items)):
                ia, va = items[ai]
                ib, vb = items[bi]
                cos = float(
                    va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
                )
                if cos >= 0.2:
                    want[(ia, ib)] = cos
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_neardup_edge_cases_match_old_join_semantics(spark):
    """Round-6 review fixes: NULL buckets never pair (null join keys),
    NULL vectors drop out (null cosine never passed the filter), zero-norm
    duplicates DO pair (Spark NaN >= threshold is true), and duplicate ids
    never self-pair (the join filtered id_a < id_b by value)."""
    from hepcrawl_spark.operators.dedup import embedding_neardup_pairs

    rows = [
        (1, [0.0, 0.0], 7),      # zero vector
        (2, [0.0, 0.0], 7),      # zero vector dup -> NaN cosine -> pair
        (3, [1.0, 0.0], None),   # null bucket: pairs with nothing
        (4, [1.0, 0.0], None),
        (5, None, 7),            # null vector: pairs with nothing
        (6, [1.0, 0.0], 8),
        (6, [1.0, 0.0], 8),      # duplicate id: must not self-pair
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {(r["id_a"], r["id_b"]) for r in
           embedding_neardup_pairs(emb, threshold=0.5).collect()}
    assert got == {(1, 2)}


def test_perceptron_null_label_filtered_not_crashing(spark):
    from hepcrawl_spark.operators.classifier import perceptron_train

    base = [(1, "alpha beta", 1), (2, "gamma delta", -1), (3, "alpha gamma", 1)]
    with_null = base + [(4, "beta delta", None)]
    df_b = spark.createDataFrame(base, "doc_id long, text string, label int")
    df_n = spark.createDataFrame(with_null, "doc_id long, text string, label int")
    w_b = perceptron_train(df_b, num_buckets=32, epochs=2)
    w_n = perceptron_train(df_n, num_buckets=32, epochs=2)
    assert w_b == w_n  # the old SQL filter silently excluded the null row


def test_cosine_topk_null_vectors_rank_last(spark):
    """Null corpus vectors had NULL cosine, which orders NULLS LAST under
    the rank window; with fewer than k scored candidates they appear in
    the top-k exactly as the old plan emitted them."""
    from hepcrawl_spark.operators.similarity import cosine_topk

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, None),
            (4, None),
        ],
        "vec_id long, embedding array<float>",
    )
    out = cosine_topk(emb, emb.filter("vec_id = 1"), k=3).collect()
    assert [(r["neighbor_id"], r["rank"]) for r in out] == [(2, 1), (3, 2), (4, 3)]
    assert out[1]["cosine"] is None and out[2]["cosine"] is None


def test_hyperplane_signature_null_vector_is_zero(spark):
    from hepcrawl_spark.operators.similarity import hyperplane_signature

    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5, 3.0]), (2, None)],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["s"] for r in df.select(
        "vec_id", hyperplane_signature("embedding", 4, 4).alias("s")).collect()}
    assert got[2] == 0  # old when(NULL > 0) fell to otherwise(0) per bit
    assert got[1] != 0
