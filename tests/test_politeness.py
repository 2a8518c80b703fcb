import datetime

import pyspark.sql.functions as F

from hepcrawl_spark.operators import politeness as P

TS = datetime.datetime


def _frontier(spark, n_hosts=3, per_host=20):
    rows = []
    for h in range(n_hosts):
        for i in range(per_host):
            rows.append(
                (
                    f"https://h{h}.org/p/{i}",
                    f"h{h}.org",
                    float(i % 5),
                    TS(2024, 1, 1, 0, i),
                )
            )
    return spark.createDataFrame(
        rows, "url string, host string, priority double, discovered_ts timestamp"
    )


def test_wave_cap_exact(spark):
    wave = P.select_wave(_frontier(spark), max_per_host=7, salt=1)
    counts = {r["host"]: r["n"] for r in wave.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert all(v == 7 for v in counts.values())


def test_wave_cap_with_salt_not_exceeded(spark):
    wave = P.select_wave(_frontier(spark), max_per_host=8, salt=2)
    counts = [r["n"] for r in wave.groupBy("host").agg(F.count("*").alias("n")).collect()]
    assert all(v <= 8 for v in counts)


def test_wave_order_priority_then_fifo(spark):
    wave = P.select_wave(_frontier(spark), max_per_host=3, salt=1)
    h0 = sorted(
        [(r["wave_rank"], r["priority"]) for r in wave.filter("host='h0.org'").collect()]
    )
    # top ranks must be the highest-priority rows
    assert h0[0][1] >= h0[-1][1]


def test_crawl_order_deterministic(spark):
    fr = _frontier(spark)
    a = [r["url"] for r in P.crawl_order(fr).orderBy("dispatch_order").collect()]
    b = [r["url"] for r in P.crawl_order(fr).orderBy("dispatch_order").collect()]
    assert a == b
    # priority DESC first
    first = P.crawl_order(fr).filter("dispatch_order = 1").collect()[0]
    assert first["priority"] == 4.0


def test_robots_gate_prefix(spark):
    fr = _frontier(spark)
    robots = spark.createDataFrame(
        [("h0.org", "/p/1", "disallow")], "host string, path_prefix string, allow string"
    )
    out = P.robots_gate(fr, robots)
    kept = [r["url"] for r in out.filter("host='h0.org'").collect()]
    # /p/1, /p/10..19 are disallowed (prefix match), /p/0, /p/2..9 kept
    assert all(not u.split("/p/")[1].startswith("1") for u in kept)
    # other hosts untouched
    assert out.filter("host='h1.org'").count() == 20


def test_decay_priority(spark):
    fr = _frontier(spark).withColumn("attempt", F.lit(0))
    out = P.decay_priority(fr.filter("priority = 4.0"))
    row = out.collect()[0]
    assert row["priority"] == 2.0 and row["attempt"] == 1


def test_host_caps_from_crawl_delay(spark):
    """robots Crawl-delay overrides the per-host wave cap:
    cap = floor(wave_budget / delay), never above max_per_host, min 1."""
    from hepcrawl_spark.operators.politeness import select_wave

    rows = [(f"https://{h}/p{i}", h, 1.0, i)
            for h in ("slow.org", "fast.org", "plain.org") for i in range(20)]
    frontier = spark.createDataFrame(
        rows, "url string, host string, priority double, discovered_ts long"
    )
    caps = spark.createDataFrame(
        [("slow.org", 30.0), ("fast.org", 0.5)], "host string, crawl_delay double"
    )
    wave = select_wave(
        frontier, max_per_host=10, host_caps=caps, wave_budget_s=60.0
    )
    got = {r[0]: r[1] for r in wave.groupBy("host").count().collect()}
    # slow: floor(60/30)=2; fast: floor(60/0.5)=120 -> capped at 10; plain: 10
    assert got == {"slow.org": 2, "fast.org": 10, "plain.org": 10}
    assert "_host_cap" not in wave.columns
    # salted variant still respects the per-host total (cap split per shard)
    wave_s = select_wave(
        frontier, max_per_host=10, salt=2, host_caps=caps, wave_budget_s=60.0
    )
    got_s = {r[0]: r[1] for r in wave_s.groupBy("host").count().collect()}
    assert got_s["slow.org"] <= 2 and got_s["plain.org"] <= 10


def test_adaptive_host_salt_bounds_hot_host_shards(spark):
    """SURVEY §7(e): the salting factor adapts to the live frontier's skew.
    A host with 250x the median pending count must be split into enough
    shards that no (host, shard) politeness window exceeds ~k x median
    rows — a static salt=4 would leave 1/4 of the hot host on each task."""
    hot = [(f"https://arxiv.org/abs/{i}", "arxiv.org", 1.0, TS(2024, 1, 1))
           for i in range(5000)]
    cold = [(f"https://h{h}.org/p/{i}", f"h{h}.org", 1.0, TS(2024, 1, 1))
            for h in range(10) for i in range(20)]
    frontier = spark.createDataFrame(
        hot + cold,
        "url string, host string, priority double, discovered_ts timestamp",
    )
    salts = {r["host"]: r["salt"]
             for r in P.adaptive_host_salt(frontier, k_times_median=8).collect()}
    # only the hot host is listed, with ~n/(k*median) = 5000/160 ~ 32 shards
    assert set(salts) == {"arxiv.org"}
    assert 16 <= salts["arxiv.org"] <= 64
    # shard balance: recompute the salted key the window partitions on
    factor = salts["arxiv.org"]
    shard_counts = [
        r["n"]
        for r in frontier.filter("host = 'arxiv.org'")
        .groupBy(F.pmod(F.xxhash64("url"), F.lit(factor)).alias("s"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert len(shard_counts) == factor
    assert max(shard_counts) <= 2 * 8 * 20  # <= c x (k x median), c=2
    # the politeness cap still divides exactly across the hot host's shards
    wave = P.select_wave(
        frontier, max_per_host=64, salt=1,
        host_salts=P.adaptive_host_salt(frontier, k_times_median=8),
    )
    per_host = {r["host"]: r["n"]
                for r in wave.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert per_host["arxiv.org"] <= 64
    assert all(v <= 64 for v in per_host.values())
    # cold hosts keep the base (salt=1) behavior: full cap available
    assert per_host["h0.org"] == 20


def test_exact_cap_division_across_shards(spark):
    """A cap smaller than the shard count must admit exactly cap rows, not
    one per shard (the old floor let a host overshoot its remaining crawl
    budget by up to salt-1 fetches); larger caps divide exactly too."""
    fr = _frontier(spark, n_hosts=1, per_host=40)
    caps = spark.createDataFrame([("h0.org", 1)], "host string, cap int")
    for salt in (1, 4, 8):
        wave = P.select_wave(fr, max_per_host=10, salt=salt, host_fetch_caps=caps)
        assert wave.count() == 1, f"salt={salt}"
    # cap 0 admits nothing at any salt
    zero = spark.createDataFrame([("h0.org", 0)], "host string, cap int")
    assert P.select_wave(fr, 10, salt=4, host_fetch_caps=zero).count() == 0
    # cap=7, salt=4: exactly 7 (old code admitted floor(7/4)=1 x 4 = 4)
    seven = spark.createDataFrame([("h0.org", 7)], "host string, cap int")
    assert P.select_wave(fr, 10, salt=4, host_fetch_caps=seven).count() == 7
    # adaptive path: same exactness through per-host salt factors
    hot = spark.createDataFrame([("h0.org", 4)], "host string, salt int")
    assert P.select_wave(fr, 10, salt=1, host_salts=hot,
                         host_fetch_caps=seven).count() == 7


def test_shard_cap_rotation_unstrands_zero_quota_shards(spark):
    """cap < shard count: shard assignment is a deterministic url hash, so
    without rotation a url landing in a zero-quota shard is unselectable
    every wave (stranded budget). Rotating the remainder assignment by the
    caller's iteration counter gives every shard a turn while keeping the
    per-wave total exact."""
    fr = _frontier(spark, n_hosts=1, per_host=40)
    caps = spark.createDataFrame([("h0.org", 1)], "host string, cap int")
    url_shard = {
        r["url"]: r["s"]
        for r in fr.select(
            "url", F.pmod(F.xxhash64("url"), F.lit(4)).alias("s")
        ).collect()
    }
    assert len(set(url_shard.values())) == 4  # all four shards populated
    picked_shards = []
    for rot in range(4):
        rows = P.select_wave(
            fr, max_per_host=10, salt=4, host_fetch_caps=caps, rotation=rot
        ).collect()
        assert len(rows) == 1, f"rotation={rot}"  # exactness at every rotation
        picked_shards.append(url_shard[rows[0]["url"]])
    # the quota shard shifts each wave: 4 rotations touch 4 distinct shards
    assert len(set(picked_shards)) == 4
