"""PageRank: known-graph values, mass conservation, dangling handling."""

import pytest

from hepcrawl_spark.operators.linkrank import pagerank, rank_seeds


def _ranks(spark, pairs, **kw):
    e = spark.createDataFrame(pairs, "src long, dst long")
    return {r["node"]: r["rank"] for r in pagerank(e, **kw).collect()}


def test_cycle_is_uniform(spark):
    got = _ranks(spark, [(0, 1), (1, 2), (2, 0)], iterations=20)
    for v in got.values():
        assert abs(v - 1 / 3) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_star_concentrates_rank(spark):
    # 4 leaves all pointing at the hub; hub dangles (mass redistributes)
    got = _ranks(spark, [(i, 99) for i in range(1, 5)], iterations=30)
    assert got[99] > max(got[i] for i in range(1, 5)) * 3
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_matches_numpy_power_iteration(spark):
    import numpy as np

    pairs = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (1, 3)]
    n, d, k = 4, 0.85, 12
    # same update rule, dense numpy
    deg = {0: 2, 1: 2, 2: 1, 3: 1}
    r = np.full(n, 1 / n)
    for _ in range(k):
        new = np.full(n, (1 - d) / n)
        dang = sum(r[i] for i in range(n) if i not in deg)
        for s, t in pairs:
            new[t] += d * r[s] / deg[s]
        new += d * dang / n
        r = new
    got = _ranks(spark, pairs, iterations=k)
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-12


def test_tol_early_stop_and_seed_ranking(spark):
    e = spark.createDataFrame([(0, 1), (1, 0), (2, 1)], "src long, dst long")
    ranks = pagerank(e, iterations=50, tol=1e-10)
    seeds = spark.createDataFrame(
        [(0, "h", 0.5), (7, "h", 0.5)], "url long, host string, priority double"
    )
    out = {r["url"]: r["priority"] for r in rank_seeds(seeds, ranks).collect()}
    assert out[0] > 0 and out[0] != 0.5   # ranked url got link priority
    assert out[7] == 0.5                  # unranked keeps its own


def test_hits_bipartite_hubs_vs_authorities(spark):
    """On a pure bipartite graph h1,h2 -> a1,a2,a3 the sources are pure
    hubs (authority 0) and the sinks pure authorities (hub 0); a2 is
    pointed at by both hubs so it dominates."""
    from hepcrawl_spark.operators.linkrank import hits

    e = spark.createDataFrame(
        [("h1", "a1"), ("h1", "a2"), ("h2", "a2"), ("h2", "a3")],
        "src string, dst string",
    )
    out = {r.node: r for r in hits(e, iterations=3).collect()}
    assert abs(sum(r.hub for r in out.values()) - 1.0) < 1e-9
    assert abs(sum(r.authority for r in out.values()) - 1.0) < 1e-9
    for a in ("a1", "a2", "a3"):
        assert out[a].hub == 0.0
    for h in ("h1", "h2"):
        assert out[h].authority == 0.0
    assert out["a2"].authority > out["a1"].authority
    assert abs(out["a1"].authority - out["a3"].authority) < 1e-12
    assert abs(out["h1"].hub - 0.5) < 1e-9
