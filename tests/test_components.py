"""connected_components (large-star/small-star) + dedup_clusters."""

import pyspark.sql.functions as F
import pytest

from hepcrawl_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def _edges(spark, pairs, typ="long"):
    return spark.createDataFrame(pairs, f"src {typ}, dst {typ}")


def _cc(spark, pairs, **kw):
    return {
        r["node"]: r["component"]
        for r in connected_components(_edges(spark, pairs), **kw).collect()
    }


def test_two_components_and_chain(spark):
    # a 6-node chain (diameter forces >1 alternation round) + a triangle
    chain = [(i, i + 1) for i in range(5)]
    tri = [(10, 11), (11, 12), (12, 10)]
    got = _cc(spark, chain + tri)
    assert got == {**{i: 0 for i in range(6)}, **{i: 10 for i in (10, 11, 12)}}


def test_long_chain_converges_logarithmically(spark):
    # 64-node path: naive min-propagation needs 64 rounds; star-contraction
    # must finish well within the 25-round ceiling
    got = _cc(spark, [(i, i + 1) for i in range(63)])
    assert got == {i: 0 for i in range(64)}


def test_celebrity_node(spark):
    # one doc near-duplicated by 200 others (the skew case: groupBy-min
    # handles it; a collect_list formulation would materialize the array)
    got = _cc(spark, [(0, i) for i in range(1, 201)])
    assert got == {i: 0 for i in range(201)}


def test_string_ids(spark):
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            _edges(spark, [("u/b", "u/a"), ("u/c", "u/b"), ("x/z", "x/y")], "string")
        ).collect()
    }
    assert got == {
        "u/a": "u/a", "u/b": "u/a", "u/c": "u/a", "x/z": "x/y", "x/y": "x/y",
    }


def test_duplicate_and_self_edges_ignored(spark):
    got = _cc(spark, [(1, 2), (2, 1), (1, 2), (3, 3)])
    assert got[1] == 1 and got[2] == 1
    # a pure self-loop node has no real edge; it is absent entirely
    assert 3 not in got


def test_dedup_clusters_canonical_pick(spark):
    docs = spark.createDataFrame(
        [(i, float(i % 3)) for i in range(10)], "doc_id long, badness double"
    )
    pairs = _edges(spark, [(1, 2), (2, 3), (7, 8)], "long").toDF("id_a", "id_b")
    out = dedup_clusters(pairs, docs, id_col="doc_id").collect()
    comp = {r["doc_id"]: r["component"] for r in out}
    canon = {r["doc_id"] for r in out if r["is_canonical"]}
    assert comp[1] == comp[2] == comp[3] == 1 and comp[7] == comp[8] == 7
    # singletons survive; each multi-doc component keeps exactly its min id
    assert canon == {0, 1, 4, 5, 6, 7, 9}


def test_dedup_clusters_order_col(spark):
    # order_col picks the BEST doc (lowest badness), not the lowest id
    docs = spark.createDataFrame(
        [(1, 5.0), (2, 1.0), (3, 3.0)], "doc_id long, badness double"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = dedup_clusters(pairs, docs, order_col="badness").collect()
    assert {r["doc_id"] for r in out if r["is_canonical"]} == {2}


def test_lsh_pipeline_end_to_end(spark):
    """The production chain: near-dup docs -> LSH candidate pairs ->
    clusters -> one canonical survivor per near-dup group."""
    from hepcrawl_spark.operators.dedup import minhash_lsh_candidates

    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = []
    for g in range(5):
        for v in range(3):  # 3 near-identical variants per group
            rows.append((g * 10 + v, base * 4 + f"tail{g} v{v}"))
        rows.append(
            (g * 10 + 9, " ".join(f"w{g}x{i}y{(g * 7 + i) % 13}" for i in range(40)))
        )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_candidates(docs, num_hashes=16, bands=8)
    out = dedup_clusters(pairs, docs, id_col="doc_id")
    survivors = {r["doc_id"] for r in out.filter("is_canonical").collect()}
    # each variant-group collapses to one survivor; every unique doc stays.
    # (the base text dominates shingles, so variant GROUPS may also merge
    # with each other — never with the unique docs)
    uniques = {g * 10 + 9 for g in range(5)}
    assert uniques <= survivors
    assert 1 <= len(survivors - uniques) <= 5
    n_variants_kept = out.filter(
        "is_canonical AND doc_id % 10 < 3"
    ).count()
    assert n_variants_kept == len(survivors - uniques)
