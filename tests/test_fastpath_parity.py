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
