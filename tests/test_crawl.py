"""Fixpoint-loop invariants: determinism, filter-mode equivalence, resume.

These are the engine-level analogues of the north rule's "crawl ordering and
final URL-seen set must match the reference scheduler under the same seed
list and politeness budget": same seeds + same budget -> identical final
url_seen set and identical per-iteration schedule, regardless of which
membership filter accelerates the gate and regardless of checkpoint/resume.
"""

import shutil

import pyspark.sql.functions as F
import pytest

from hepcrawl_spark.crawl.frontier import CrawlConfig, run_crawl
from hepcrawl_spark.sources.pages import synthesize_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    pages = synthesize_corpus(spark, n_pages=600, n_hosts=8, links_per_page=3)
    pages.persist()
    pages.count()
    return pages


@pytest.fixture(scope="module")
def seeds(corpus):
    return corpus.orderBy("page_id").limit(10).select(
        "url", "host", F.lit(1.0).alias("priority"),
        F.col("warc_ts").alias("discovered_ts"),
    )


def _final_seen(spark, state_dir):
    from hepcrawl_spark.crawl.frontier import read_manifest

    m = read_manifest(state_dir)
    return {
        r["url"]
        for r in spark.read.parquet(f"{state_dir}/iter_{m['iteration']:04d}/url_seen").collect()
    }


def test_fixpoint_progress_and_metrics(spark, corpus, seeds, tmp_path):
    sd = str(tmp_path / "s1")
    res = run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=4, max_per_host=20, salt=1, filter_mode="none",
                    state_dir=sd, detailed_stats=True),
    )
    assert len(res.iterations) >= 2
    assert res.total_fetched > 10
    # monotone url_seen growth
    seen_sizes = [i.seen_size for i in res.iterations]
    assert seen_sizes == sorted(seen_sizes)
    # metrics table written with per-partition rows
    metrics = spark.read.parquet(f"{sd}/metrics")
    assert metrics.count() > 0
    assert metrics.filter("fetched < 0").count() == 0


def test_filter_modes_equivalent(spark, corpus, seeds, tmp_path):
    """bloom- and cuckoo-accelerated gates must not change the crawl result."""
    seen = {}
    scheds = {}
    for mode in ("none", "bloom", "bloom_table", "cuckoo"):
        sd = str(tmp_path / f"m_{mode}")
        res = run_crawl(
            spark, corpus, seeds,
            CrawlConfig(max_iterations=3, max_per_host=15, salt=1, filter_mode=mode,
                        state_dir=sd, n_expected_urls=5000),
        )
        seen[mode] = _final_seen(spark, sd)
        scheds[mode] = [i.scheduled for i in res.iterations]
    assert seen["none"] == seen["bloom"] == seen["bloom_table"] == seen["cuckoo"]
    assert scheds["none"] == scheds["bloom"] == scheds["bloom_table"] == scheds["cuckoo"]


def test_bloom_table_mode_keeps_filter_off_the_driver(spark, corpus, seeds, tmp_path, monkeypatch):
    """filter_mode='bloom_table': probe and delta-merge are cogroups — the
    DRIVER must never touch a bitmap or a hash blob. Driver-side filter
    entry points are patched to raise; executor-side workers re-import the
    module fresh, so the patch only guards the driver process."""
    import hepcrawl_spark.crawl.frontier as FR

    def _boom(*a, **k):
        raise AssertionError("driver-side filter state touched in bloom_table mode")

    monkeypatch.setattr(FR, "build_bloom_sharded", _boom)
    monkeypatch.setattr(FR, "sharded_might_contain_udf", _boom)
    monkeypatch.setattr(FR, "build_cuckoo", _boom)
    monkeypatch.setattr(FR.ShardedBloom, "add", _boom)
    monkeypatch.setattr(FR.ShardedBloom, "might_contain", _boom)
    sd = str(tmp_path / "bt")
    res = run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=3, max_per_host=15, salt=1,
                    filter_mode="bloom_table", state_dir=sd, n_expected_urls=5000),
    )
    assert res.total_fetched > 0
    # resume also comes from the bloom parquet snapshot, not a driver build
    res2 = run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=4, max_per_host=15, salt=1,
                    filter_mode="bloom_table", state_dir=sd, n_expected_urls=5000),
        resume=True,
    )
    assert len(res2.iterations) >= 1


def test_auto_filter_mode_switches_on_scale(spark, corpus, seeds, tmp_path, monkeypatch):
    """filter_mode='auto': below the threshold the cheap broadcast bloom
    runs; above it the run MUST take the zero-driver cogroup path — same
    driver-side tripwires as the explicit bloom_table test. Results match
    the explicit modes either way."""
    import hepcrawl_spark.crawl.frontier as FR

    # small expected scale -> broadcast bloom (driver path allowed)
    sd_small = str(tmp_path / "auto_small")
    res_small = run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=3, max_per_host=15, salt=1,
                    filter_mode="auto", state_dir=sd_small,
                    n_expected_urls=5000),
    )
    assert res_small.total_fetched > 0

    # the caller's config object is not mutated by the auto resolution
    probe_cfg = CrawlConfig(max_iterations=1, max_per_host=5, salt=1,
                            filter_mode="auto",
                            state_dir=str(tmp_path / "auto_nm"),
                            n_expected_urls=5000)
    run_crawl(spark, corpus, seeds, probe_cfg)
    assert probe_cfg.filter_mode == "auto"

    # large expected scale -> bloom_table; any driver-side filter touch raises
    def _boom(*a, **k):
        raise AssertionError("driver-side filter state touched in auto mode")

    monkeypatch.setattr(FR, "build_bloom_sharded", _boom)
    monkeypatch.setattr(FR, "sharded_might_contain_udf", _boom)
    monkeypatch.setattr(FR.ShardedBloom, "add", _boom)
    monkeypatch.setattr(FR.ShardedBloom, "might_contain", _boom)
    sd_big = str(tmp_path / "auto_big")
    res_big = run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=3, max_per_host=15, salt=1,
                    filter_mode="auto", state_dir=sd_big,
                    n_expected_urls=6_000_000),  # > auto_filter_threshold
    )
    assert res_big.total_fetched > 0
    # both resolutions produce the same crawl
    assert _final_seen(spark, sd_small) == _final_seen(spark, sd_big)
    assert [i.scheduled for i in res_small.iterations] == [
        i.scheduled for i in res_big.iterations
    ]


def test_cuckoo_resident_delta_no_per_iteration_rebuild(spark, corpus, seeds, tmp_path, monkeypatch):
    """The cuckoo filter must be built at most once (resume) and then
    delta-updated; the round-2 O(|seen|) rebuild per iteration is a scale
    regression the loop must not reintroduce."""
    import hepcrawl_spark.crawl.frontier as FR

    calls = []
    real = FR.build_cuckoo
    monkeypatch.setattr(
        FR, "build_cuckoo", lambda *a, **k: (calls.append(1), real(*a, **k))[1]
    )
    sd = str(tmp_path / "ck")
    run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=3, max_per_host=15, salt=1, filter_mode="cuckoo",
                    state_dir=sd, n_expected_urls=5000),
    )
    assert calls == []  # fresh run: empty sized filter + per-wave inserts
    run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=5, max_per_host=15, salt=1, filter_mode="cuckoo",
                    state_dir=sd, n_expected_urls=5000),
        resume=True,
    )
    # resume restores the persisted shard blobs — zero rebuilds, ever
    assert calls == []
    # only a pre-persistence snapshot (no cuckoo dir) falls back to ONE
    # rebuild from url_seen
    import shutil as _sh

    from hepcrawl_spark.crawl.frontier import read_manifest

    m = read_manifest(sd)
    _sh.rmtree(m["cuckoo"])
    run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=m["iteration"] + 2, max_per_host=15, salt=1,
                    filter_mode="cuckoo", state_dir=sd, n_expected_urls=5000),
        resume=True,
    )
    assert len(calls) == 1


def test_meta_threads_through_two_hop_chain(spark, corpus, seeds, tmp_path):
    """PoS-shape chained harvest (reference pos_spider.py:118-126): hop-1
    state rides Request.meta and hop-2 parsing reads it. Here: seeds carry
    meta {job: pos2019}; link_meta stamps each outlink with its parent url;
    the hop-2 records (iteration 1) must surface BOTH."""
    sd = str(tmp_path / "meta")
    seeded = seeds.withColumn(
        "meta", F.create_map(F.lit("job"), F.lit("pos2019"))
    )
    res = run_crawl(
        spark, corpus, seeded,
        CrawlConfig(
            max_iterations=2, max_per_host=15, salt=1, filter_mode="none",
            state_dir=sd, keep_snapshots=5,
            link_meta={"hop1_url": F.col("url")},
        ),
    )
    assert len(res.iterations) == 2 and res.iterations[1].fetched > 0
    hop1 = {r["url"] for r in spark.read.parquet(f"{sd}/iter_0000/records").collect()}
    hop2 = spark.read.parquet(f"{sd}/iter_0001/records").collect()
    assert hop2, "hop 2 produced no records"
    for r in hop2:
        # hop-2 record reads hop-1 state: the seed job id AND the parent url
        assert r["meta"]["job"] == "pos2019"
        assert r["meta"]["hop1_url"] in hop1
    # the frontier snapshot itself carries the threaded meta column
    front = spark.read.parquet(f"{sd}/iter_0001/frontier")
    assert dict(front.dtypes)["meta"] == "map<string,string>"


def test_recrawl_cutoff_invalidates_and_refetches(spark, corpus, tmp_path):
    """reference middlewares.py:134-155: an entry whose stored timestamp is
    older than the new capture must be re-crawled. A frontier of already-
    seen urls with OLD discovered_ts is blocked by the gate; setting
    recrawl_cutoff invalidates those url_seen entries (cuckoo mode DELETES
    their fingerprints from the resident filter) and the urls re-fetch."""
    from hepcrawl_spark.crawl.frontier import _write_manifest

    sd = str(tmp_path / "inv")
    seeds10 = corpus.orderBy("page_id").limit(10).select(
        "url", "host", F.lit(1.0).alias("priority"),
        F.col("warc_ts").alias("discovered_ts"),
    )
    run_crawl(
        spark, corpus, seeds10,
        CrawlConfig(max_iterations=2, max_per_host=15, salt=1, filter_mode="cuckoo",
                    state_dir=sd, n_expected_urls=5000),
    )
    from hepcrawl_spark.crawl.frontier import read_manifest

    m = read_manifest(sd)
    url_seen = spark.read.parquet(m["url_seen"])
    n_seen = url_seen.count()
    # craft a resume state whose frontier re-offers ALREADY-SEEN urls with
    # discovered_ts strictly OLDER than their stored last_ts
    refeed = url_seen.select(
        "url",
        F.lower(F.parse_url("url", F.lit("HOST"))).alias("host"),
        F.lit(1.0).alias("priority"),
        (F.col("last_ts") - F.expr("INTERVAL 1 DAY")).alias("discovered_ts"),
        F.lit(0).alias("attempt"),
    )
    it_dir = f"{sd}/iter_{m['iteration']:04d}"
    refeed.write.mode("overwrite").parquet(f"{it_dir}/frontier")
    _write_manifest(sd, m["iteration"], {
        "frontier": f"{it_dir}/frontier",
        "url_seen": m["url_seen"],
        "seen_size": n_seen,
    })

    # without invalidation: every wave row is seen with an older capture ->
    # gate blocks all, nothing fetched
    res_blocked = run_crawl(
        spark, corpus, seeds10,
        CrawlConfig(max_iterations=m["iteration"] + 2, max_per_host=1000, salt=1,
                    filter_mode="cuckoo", state_dir=sd, n_expected_urls=5000),
        resume=True,
    )
    assert sum(i.fetched for i in res_blocked.iterations) == 0

    # with a cutoff past every last_ts: entries invalidate (cuckoo deletes),
    # and the same urls re-fetch
    refeed.write.mode("overwrite").parquet(f"{it_dir}/frontier")
    _write_manifest(sd, m["iteration"], {
        "frontier": f"{it_dir}/frontier",
        "url_seen": m["url_seen"],
        "seen_size": n_seen,
    })
    res_inval = run_crawl(
        spark, corpus, seeds10,
        CrawlConfig(max_iterations=m["iteration"] + 2, max_per_host=1000, salt=1,
                    filter_mode="cuckoo", state_dir=sd, n_expected_urls=5000,
                    recrawl_cutoff="2100-01-01 00:00:00"),
        resume=True,
    )
    assert res_inval.iterations[0].fetched == n_seen


def test_resume_equals_straight_run(spark, corpus, seeds, tmp_path):
    cfgkw = dict(max_per_host=15, salt=1, filter_mode="none")
    sd_full = str(tmp_path / "full")
    run_crawl(spark, corpus, seeds, CrawlConfig(max_iterations=4, state_dir=sd_full, **cfgkw))

    sd_resume = str(tmp_path / "resume")
    run_crawl(spark, corpus, seeds, CrawlConfig(max_iterations=2, state_dir=sd_resume, **cfgkw))
    run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=4, state_dir=sd_resume, **cfgkw),
        resume=True,
    )
    assert _final_seen(spark, sd_full) == _final_seen(spark, sd_resume)


def test_determinism_same_seeds_same_result(spark, corpus, seeds, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for sd in (a, b):
        run_crawl(
            spark, corpus, seeds,
            CrawlConfig(max_iterations=3, max_per_host=10, salt=2, filter_mode="none", state_dir=sd),
        )
    assert _final_seen(spark, a) == _final_seen(spark, b)


def test_robots_blocked_urls_are_retired(spark, corpus, tmp_path):
    """A robots-disallowed URL must leave the frontier permanently (the
    reference's robots middleware drops denied requests for good) — it must
    not be re-selected every wave, starving allowed same-host URLs."""
    from hepcrawl_spark.crawl.frontier import read_manifest

    rows = (
        corpus.filter("host = 'host1.example.org'")
        .orderBy("page_id")
        .limit(3)
        .collect()
    )
    blocked, a1, a2 = rows
    seeds = spark.createDataFrame(
        [
            (blocked["url"], blocked["host"], 3.0, blocked["warc_ts"]),
            (a1["url"], a1["host"], 2.0, a1["warc_ts"]),
            (a2["url"], a2["host"], 1.0, a2["warc_ts"]),
        ],
        "url string, host string, priority double, discovered_ts timestamp",
    )
    robots = spark.createDataFrame(
        [(blocked["host"], f"/p/{blocked['page_id']}", "disallow")],
        "host string, path_prefix string, allow string",
    )
    sd = str(tmp_path / "robots")
    run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=2, max_per_host=2, salt=1,
                    filter_mode="none", state_dir=sd),
        robots=robots,
    )
    seen = _final_seen(spark, sd)
    assert a1["url"] in seen
    assert blocked["url"] not in seen
    m = read_manifest(sd)
    final_frontier = {
        r["url"]
        for r in spark.read.parquet(
            f"{sd}/iter_{m['iteration']:04d}/frontier"
        ).collect()
    }
    assert blocked["url"] not in final_frontier


def test_fully_blocked_wave_does_not_halt_crawl(spark, corpus, tmp_path):
    """When an entire wave is robots-blocked the crawl must retire it and
    keep going, not stop with allowed URLs still pending."""
    rows = (
        corpus.filter("host = 'host2.example.org'")
        .orderBy("page_id")
        .limit(2)
        .collect()
    )
    blocked, allowed = rows
    seeds = spark.createDataFrame(
        [
            (blocked["url"], blocked["host"], 2.0, blocked["warc_ts"]),
            (allowed["url"], allowed["host"], 1.0, allowed["warc_ts"]),
        ],
        "url string, host string, priority double, discovered_ts timestamp",
    )
    robots = spark.createDataFrame(
        [(blocked["host"], f"/p/{blocked['page_id']}", "disallow")],
        "host string, path_prefix string, allow string",
    )
    sd = str(tmp_path / "halting")
    res = run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=3, max_per_host=1, salt=1,
                    filter_mode="none", state_dir=sd),
        robots=robots,
    )
    # iteration 0: wave = {blocked} -> 0 fetched but crawl continues;
    # iteration 1 fetches the allowed URL.
    assert res.total_fetched >= 1
    assert allowed["url"] in _final_seen(spark, sd)


def test_meta_threading_is_pay_for_use(spark, corpus, seeds, tmp_path):
    """Without any meta source (no seed meta, no link_meta) the link rows
    must not carry the map/parent columns, and the resulting frontier still
    has the uniform (empty-map) meta column."""
    from hepcrawl_spark.crawl.frontier import extract_outlinks

    links = extract_outlinks(corpus.limit(5), thread_meta=False)
    assert "meta" not in links.columns and "_parent" not in links.columns
    sd = str(tmp_path / "nometa")
    res = run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=2, max_per_host=15, salt=1,
                    filter_mode="none", state_dir=sd),
    )
    assert res.total_fetched > 0
    front = spark.read.parquet(f"{sd}/iter_0001/frontier")
    assert dict(front.dtypes)["meta"] == "map<string,string>"
    assert front.filter(F.size(F.map_keys("meta")) > 0).count() == 0


def test_failed_fetch_retry_backoff(spark, corpus, seeds, tmp_path):
    """P6 in the live loop: a seed url with no corpus row (fetch failure)
    re-enters the frontier with attempt+1 and decayed priority until
    max_attempts, then drops for good."""
    ghost = spark.createDataFrame(
        [("https://ghost.example.org/nope", "ghost.example.org", 8.0)],
        "url string, host string, priority double",
    ).withColumn("discovered_ts", F.current_timestamp())
    sd = str(tmp_path / "retry")
    res = run_crawl(
        spark, corpus, seeds.unionByName(ghost),
        CrawlConfig(max_iterations=4, max_per_host=15, salt=1,
                    filter_mode="none", state_dir=sd, keep_snapshots=10,
                    max_attempts=3, retry_decay=0.5),
    )
    assert res.total_fetched > 0
    f0 = spark.read.parquet(f"{sd}/iter_0000/frontier").filter(
        "host = 'ghost.example.org'").collect()
    assert len(f0) == 1 and f0[0]["attempt"] == 1 and f0[0]["priority"] == 4.0
    f1 = spark.read.parquet(f"{sd}/iter_0001/frontier").filter(
        "host = 'ghost.example.org'").collect()
    assert len(f1) == 1 and f1[0]["attempt"] == 2 and f1[0]["priority"] == 2.0
    # attempt 2 == max_attempts-1: retired after its third strike
    f2 = spark.read.parquet(f"{sd}/iter_0002/frontier").filter(
        "host = 'ghost.example.org'").count()
    assert f2 == 0
    # default config: failures retire immediately (historical behavior)
    sd2 = str(tmp_path / "noretry")
    run_crawl(
        spark, corpus, seeds.unionByName(ghost),
        CrawlConfig(max_iterations=2, max_per_host=15, salt=1,
                    filter_mode="none", state_dir=sd2, keep_snapshots=10),
    )
    assert spark.read.parquet(f"{sd2}/iter_0000/frontier").filter(
        "host = 'ghost.example.org'").count() == 0


def test_adaptive_salt_mode_in_live_loop(spark, corpus, seeds, tmp_path):
    """salt_mode='adaptive' recomputes per-host factors each wave. On the
    balanced synthetic corpus no host crosses the hot threshold, so the
    crawl must be IDENTICAL to the static run (the adaptive machinery adds
    only the tiny per-wave host agg); a skewed frontier is covered at the
    operator level in test_politeness."""
    sd_a = str(tmp_path / "adaptive")
    res_a = run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=3, max_per_host=15, salt=1,
                    filter_mode="none", state_dir=sd_a, salt_mode="adaptive"),
    )
    sd_s = str(tmp_path / "static")
    res_s = run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=3, max_per_host=15, salt=1,
                    filter_mode="none", state_dir=sd_s),
    )
    assert res_a.total_fetched == res_s.total_fetched > 0
    assert _final_seen(spark, sd_a) == _final_seen(spark, sd_s)


def test_retry_row_wins_over_same_wave_rediscovery(spark, tmp_path):
    """A url whose fetch failed AND which a fetched page rediscovered as an
    outlink in the same wave must yield ONE frontier row (the attempt+1
    retry), not two — the attempt=0 duplicate would respawn fresh retries
    forever, retrying a dead url past max_attempts (round-3 ADVICE)."""
    ghost_url = "https://ghost.example.org/nope"
    pages = (
        spark.createDataFrame(
            [("https://a.example.org/p1", f'x <a href="{ghost_url}">g</a>')],
            "url string, text string",
        )
        .withColumn("warc_ts", F.current_timestamp())
        .withColumn("html", F.encode("text", "UTF-8"))
        .withColumn("lang", F.lit("en"))
    )
    seeds2 = spark.createDataFrame(
        [
            ("https://a.example.org/p1", "a.example.org", 1.0),
            (ghost_url, "ghost.example.org", 8.0),
        ],
        "url string, host string, priority double",
    ).withColumn("discovered_ts", F.current_timestamp())
    sd = str(tmp_path / "rr")
    run_crawl(
        spark, pages, seeds2,
        CrawlConfig(max_iterations=1, max_per_host=10, salt=1,
                    filter_mode="none", state_dir=sd, keep_snapshots=10,
                    max_attempts=3, retry_decay=0.5),
    )
    rows = spark.read.parquet(f"{sd}/iter_0000/frontier").filter(
        F.col("url") == ghost_url
    ).collect()
    assert len(rows) == 1
    assert rows[0]["attempt"] == 1 and rows[0]["priority"] == 4.0


def test_pagerank_priority_refresh(spark, corpus, seeds, tmp_path):
    """rank_priorities_every: the frontier's priorities become normalized
    link-authority ranks — an edge log accumulates per wave and the refresh
    rewrites priorities in [0, 1] with rank order respected."""
    sd = str(tmp_path / "ranked")
    res = run_crawl(
        spark, corpus, seeds,
        CrawlConfig(max_iterations=3, max_per_host=15, salt=1,
                    filter_mode="none", state_dir=sd, keep_snapshots=5,
                    rank_priorities_every=1, rank_iterations=3),
    )
    assert res.total_fetched > 0
    edges = spark.read.parquet(f"{sd}/edges")
    assert edges.count() > 0 and set(edges.columns) == {"src", "dst"}
    # final frontier was ranked against the FULL edge log (each iteration
    # appends its wave's edges before its refresh)
    last = max(int(d[5:]) for d in __import__("os").listdir(sd) if d.startswith("iter_"))
    front = spark.read.parquet(f"{sd}/iter_{last:04d}/frontier")
    pr = [r["priority"] for r in front.collect()]
    assert pr and all(0.0 <= p <= 1.0 for p in pr)
    # ranked priorities actually vary (not the flat seed default)
    assert len({round(p, 6) for p in pr}) > 1
    # the refresh respects rank order: frontier priority of a ranked url
    # equals its normalized pagerank
    from hepcrawl_spark.operators.linkrank import pagerank
    import pyspark.sql.functions as F2
    ranks = pagerank(edges, iterations=3)
    top = ranks.agg(F2.max("rank")).collect()[0][0]
    joined = front.join(
        ranks.withColumnRenamed("node", "url"), "url", "inner"
    ).collect()
    assert joined
    for r in joined:
        assert abs(r["priority"] - r["rank"] / top) < 1e-9


def test_robots_auto_from_corpus(spark, tmp_path):
    """robots='auto': the rules come from the corpus's own /robots.txt
    pages (the Scrapy fetch-and-obey flow). Disallowed paths never fetch;
    other hosts crawl normally."""
    rows = [
        ("https://a.org/robots.txt", "User-agent: *\nDisallow: /private/\n"),
        ("https://a.org/private/x", "secret"),
        ("https://a.org/public/y", "fine"),
        ("https://b.org/anything", "open"),
    ]
    pages = (
        spark.createDataFrame(rows, "url string, text string")
        .withColumn("warc_ts", F.current_timestamp())
        .withColumn("html", F.encode("text", "UTF-8"))
        .withColumn("lang", F.lit("en"))
    )
    seeds2 = spark.createDataFrame(
        [(u, h, 1.0) for u, h in [
            ("https://a.org/private/x", "a.org"),
            ("https://a.org/public/y", "a.org"),
            ("https://b.org/anything", "b.org"),
        ]],
        "url string, host string, priority double",
    ).withColumn("discovered_ts", F.current_timestamp())
    sd = str(tmp_path / "autorobots")
    run_crawl(
        spark, pages, seeds2,
        CrawlConfig(max_iterations=2, max_per_host=10, salt=1,
                    filter_mode="none", state_dir=sd, keep_snapshots=10),
        robots="auto",
    )
    fetched = {r["url"] for r in
               spark.read.parquet(f"{sd}/iter_0000/records").collect()}
    assert "https://a.org/private/x" not in fetched
    assert {"https://a.org/public/y", "https://b.org/anything"} <= fetched


def test_max_depth_limits_link_following(spark, tmp_path):
    """Scrapy DEPTH_LIMIT parity: a seed -> hop1 -> hop2 chain crawled with
    max_depth=1 fetches the seed and hop1 but never admits hop2."""
    chain = [
        ("https://c.org/seed", 'x <a href="https://c.org/hop1">l</a>'),
        ("https://c.org/hop1", 'x <a href="https://c.org/hop2">l</a>'),
        ("https://c.org/hop2", "deep page"),
    ]
    pages = (
        spark.createDataFrame(chain, "url string, text string")
        .withColumn("warc_ts", F.current_timestamp())
        .withColumn("html", F.encode("text", "UTF-8"))
        .withColumn("lang", F.lit("en"))
    )
    seeds2 = spark.createDataFrame(
        [("https://c.org/seed", "c.org", 1.0)],
        "url string, host string, priority double",
    ).withColumn("discovered_ts", F.current_timestamp())
    sd = str(tmp_path / "depth1")
    res = run_crawl(
        spark, pages, seeds2,
        CrawlConfig(max_iterations=4, max_per_host=10, salt=1,
                    filter_mode="none", state_dir=sd, keep_snapshots=10,
                    max_depth=1),
    )
    fetched = set()
    import os as _os
    for d in _os.listdir(sd):
        if d.startswith("iter_") and _os.path.isdir(f"{sd}/{d}") and \
                _os.path.exists(f"{sd}/{d}/records"):
            fetched |= {r["url"] for r in
                        spark.read.parquet(f"{sd}/{d}/records").collect()}
    assert "https://c.org/seed" in fetched
    assert "https://c.org/hop1" in fetched
    assert "https://c.org/hop2" not in fetched
    # unlimited: the whole chain crawls
    sd2 = str(tmp_path / "nodepth")
    run_crawl(
        spark, pages, seeds2,
        CrawlConfig(max_iterations=4, max_per_host=10, salt=1,
                    filter_mode="none", state_dir=sd2, keep_snapshots=10),
    )
    all_fetched = set()
    for d in _os.listdir(sd2):
        if d.startswith("iter_") and _os.path.isdir(f"{sd2}/{d}") and \
                _os.path.exists(f"{sd2}/{d}/records"):
            all_fetched |= {r["url"] for r in
                            spark.read.parquet(f"{sd2}/{d}/records").collect()}
    assert "https://c.org/hop2" in all_fetched


def test_host_budget_carry_over_across_iterations(spark, tmp_path):
    """SURVEY §7(d) in the batch loop: a per-host crawl budget whose
    consumption carries over across iterations AND across resume. Host A
    has 30 crawlable pages, budget 12, wave cap 5 -> fetches 5, 5, 2 and
    then nothing; host B (under budget) is unaffected."""
    rows = [(f"https://a.org/p{i}", "no links here") for i in range(30)]
    rows += [(f"https://b.org/p{i}", "no links here") for i in range(4)]
    pages = (
        spark.createDataFrame(rows, "url string, text string")
        .withColumn("warc_ts", F.current_timestamp())
        .withColumn("html", F.encode("text", "UTF-8"))
        .withColumn("lang", F.lit("en"))
    )
    seeds2 = pages.select(
        "url",
        F.lower(F.parse_url("url", F.lit("HOST"))).alias("host"),
        F.lit(1.0).alias("priority"),
        F.col("warc_ts").alias("discovered_ts"),
    )
    sd = str(tmp_path / "budget")
    res = run_crawl(
        spark, pages, seeds2,
        CrawlConfig(max_iterations=3, max_per_host=5, salt=1,
                    filter_mode="none", state_dir=sd, keep_snapshots=10,
                    host_budget=12),
    )
    per_host = lambda d: {
        r["host"]: r["n"]
        for r in spark.read.parquet(f"{sd}/{d}/records")
        .select(F.lower(F.parse_url("url", F.lit("HOST"))).alias("host"))
        .groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert per_host("iter_0000") == {"a.org": 5, "b.org": 4}
    assert per_host("iter_0001")["a.org"] == 5
    assert per_host("iter_0002")["a.org"] == 2  # budget 12 = 5 + 5 + 2
    # the budget survives RESUME: two more iterations admit nothing from A
    res2 = run_crawl(
        spark, pages, seeds2,
        CrawlConfig(max_iterations=5, max_per_host=5, salt=1,
                    filter_mode="none", state_dir=sd, keep_snapshots=10,
                    host_budget=12),
        resume=True,
    )
    assert sum(i.fetched for i in res2.iterations) == 0


def test_robots_auto_allow_precedence(spark, tmp_path):
    """'Disallow: / + Allow: /public/' must NOT black-hole the host: rules
    with Allow rows route through the RFC 9309 longest-match gate in the
    live loop."""
    rows = [
        ("https://a.org/robots.txt",
         "User-agent: *\nDisallow: /\nAllow: /public/\n"),
        ("https://a.org/public/ok", "allowed content"),
        ("https://a.org/private/no", "blocked content"),
        ("https://b.org/free", "open host"),
    ]
    pages = (
        spark.createDataFrame(rows, "url string, text string")
        .withColumn("warc_ts", F.current_timestamp())
        .withColumn("html", F.encode("text", "UTF-8"))
        .withColumn("lang", F.lit("en"))
    )
    seeds2 = spark.createDataFrame(
        [("https://a.org/public/ok", "a.org", 1.0),
         ("https://a.org/private/no", "a.org", 1.0),
         ("https://b.org/free", "b.org", 1.0)],
        "url string, host string, priority double",
    ).withColumn("discovered_ts", F.current_timestamp())
    sd = str(tmp_path / "allowprec")
    run_crawl(
        spark, pages, seeds2,
        CrawlConfig(max_iterations=2, max_per_host=10, salt=1,
                    filter_mode="none", state_dir=sd, keep_snapshots=10),
        robots="auto",
    )
    fetched = {r["url"] for r in
               spark.read.parquet(f"{sd}/iter_0000/records").collect()}
    assert fetched == {"https://a.org/public/ok", "https://b.org/free"}


def test_all_failed_wave_still_retries_in_fast_mode(spark, tmp_path):
    """A wave whose fetches ALL fail lands on the empty-fetch branch in
    fast mode (scheduled approximated by fetched_n == 0); with
    max_attempts > 1 those urls must re-enter with attempt+1 — exactly as
    a detailed_stats=True run would — not silently drop at attempt 0."""
    pages = (
        spark.createDataFrame(
            [("https://real.org/p", "content")], "url string, text string"
        )
        .withColumn("warc_ts", F.current_timestamp())
        .withColumn("html", F.encode("text", "UTF-8"))
        .withColumn("lang", F.lit("en"))
    )
    ghosts = spark.createDataFrame(
        [(f"https://gone.org/{i}", "gone.org", 1.0) for i in range(3)],
        "url string, host string, priority double",
    ).withColumn("discovered_ts", F.current_timestamp())
    sd = str(tmp_path / "failwave")
    res = run_crawl(
        spark, pages, ghosts,  # every seed fails -> all-failed waves
        CrawlConfig(max_iterations=5, max_per_host=10, salt=1,
                    filter_mode="none", state_dir=sd, keep_snapshots=10,
                    max_attempts=3, retry_decay=0.5),
    )
    f0 = spark.read.parquet(f"{sd}/iter_0000/frontier")
    assert f0.count() == 3 and {r["attempt"] for r in f0.collect()} == {1}
    f1 = spark.read.parquet(f"{sd}/iter_0001/frontier")
    assert f1.count() == 3 and {r["attempt"] for r in f1.collect()} == {2}
    # attempt 2 == max_attempts-1: retired for good, crawl terminates
    f2 = spark.read.parquet(f"{sd}/iter_0002/frontier")
    assert f2.count() == 0
    assert len(res.iterations) == 3


def test_robots_auto_parses_raw_bytes_when_text_collapsed(spark, tmp_path):
    """robots='auto' must read the RAW fetched bytes: a robots.txt body
    that went through html_to_text has its newlines collapsed to spaces
    (one directive-free line), so parsing `text` would silently obey no
    rules. The `html` column carries the line-oriented original."""
    body = "User-agent: *\nDisallow: /private/\n"
    collapsed = " ".join(body.split())
    rows = [
        ("https://a.org/robots.txt", collapsed, body),
        ("https://a.org/private/x", "secret", "secret"),
        ("https://a.org/public/y", "fine", "fine"),
    ]
    pages = (
        spark.createDataFrame(rows, "url string, text string, raw string")
        .withColumn("html", F.encode("raw", "UTF-8"))
        .drop("raw")
        .withColumn("warc_ts", F.current_timestamp())
        .withColumn("lang", F.lit("en"))
    )
    seeds2 = pages.select(
        "url",
        F.lower(F.parse_url("url", F.lit("HOST"))).alias("host"),
        F.lit(1.0).alias("priority"),
        F.col("warc_ts").alias("discovered_ts"),
    ).filter(~F.col("url").endswith("robots.txt"))
    sd = str(tmp_path / "rawrobots")
    run_crawl(
        spark, pages, seeds2,
        CrawlConfig(max_iterations=2, max_per_host=10, salt=1,
                    filter_mode="none", state_dir=sd, keep_snapshots=10),
        robots="auto",
    )
    fetched = {r["url"] for r in
               spark.read.parquet(f"{sd}/iter_0000/records").collect()}
    assert "https://a.org/private/x" not in fetched
    assert "https://a.org/public/y" in fetched


def test_robots_auto_warns_when_no_rules_parse(spark, tmp_path):
    """If the corpus HAS /robots.txt pages but zero rules parse from them
    (e.g. byte-less corpus with whitespace-collapsed text), the crawl must
    say so loudly instead of silently obeying nothing."""
    body = "User-agent: *\nDisallow: /private/\n"
    collapsed = " ".join(body.split())
    rows = [
        ("https://a.org/robots.txt", collapsed),
        ("https://a.org/public/y", "fine"),
    ]
    pages = (
        spark.createDataFrame(rows, "url string, text string")
        .withColumn("html", F.encode(F.lit(""), "UTF-8"))  # byte-less corpus
        .withColumn("warc_ts", F.current_timestamp())
        .withColumn("lang", F.lit("en"))
    )
    seeds2 = pages.select(
        "url",
        F.lower(F.parse_url("url", F.lit("HOST"))).alias("host"),
        F.lit(1.0).alias("priority"),
        F.col("warc_ts").alias("discovered_ts"),
    ).filter(~F.col("url").endswith("robots.txt"))
    sd = str(tmp_path / "warnrobots")
    with pytest.warns(UserWarning, match="zero rules"):
        run_crawl(
            spark, pages, seeds2,
            CrawlConfig(max_iterations=1, max_per_host=10, salt=1,
                        filter_mode="none", state_dir=sd, keep_snapshots=10),
            robots="auto",
        )


def test_host_budget_charges_distinct_urls_on_multicapture_corpus(spark, tmp_path):
    """A corpus holding multiple captures per url (multiple warc_ts — the
    recrawl scenario) multiplies the fetch join; the host budget must
    charge each admitted url ONCE, not once per capture."""
    rows = []
    for i in range(3):
        for ts in ("2024-01-01 00:00:00", "2024-02-01 00:00:00"):
            rows.append((f"https://a.org/p{i}", "no links here", ts))
    pages = (
        spark.createDataFrame(rows, "url string, text string, ts string")
        .withColumn("warc_ts", F.col("ts").cast("timestamp"))
        .drop("ts")
        .withColumn("html", F.encode("text", "UTF-8"))
        .withColumn("lang", F.lit("en"))
    )
    seeds2 = (
        pages.select(
            "url",
            F.lower(F.parse_url("url", F.lit("HOST"))).alias("host"),
            F.lit(1.0).alias("priority"),
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("discovered_ts"),
        )
        .distinct()
    )
    sd = str(tmp_path / "multicap")
    run_crawl(
        spark, pages, seeds2,
        CrawlConfig(max_iterations=3, max_per_host=1, salt=1,
                    filter_mode="none", state_dir=sd, keep_snapshots=10,
                    host_budget=2),
    )
    import os as _os
    fetched = set()
    for d in _os.listdir(sd):
        if d.startswith("iter_") and _os.path.exists(f"{sd}/{d}/records"):
            fetched |= {r["url"] for r in
                        spark.read.parquet(f"{sd}/{d}/records").collect()}
    # budget 2 at one url/wave: exactly 2 distinct urls crawl (a count(*)
    # charge would bill the first url twice and stop after one)
    assert len(fetched) == 2


def test_trap_detect_gates_exploding_template(spark, tmp_path):
    """trap_detect_every: after wave 1 the /cal/N/view template (15 of the
    25 fetched urls on the host) is flagged; every remaining /cal url is
    dropped from the frontier, so the crawl ends having fetched all /art
    pages and ONLY wave-1's share of the trap."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(10):
        rows.append((f"https://t.ex/art{i}", t, None, f"article {i}", "en", "t.ex"))
    for i in range(60):
        rows.append((f"https://t.ex/cal/{i}/view", t, None, f"cal {i}", "en", "t.ex"))
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string, host string"
    )
    seeds = pages.select(
        "url", "host", F.lit(1.0).alias("priority"),
        F.col("warc_ts").alias("discovered_ts"),
    )
    sd = str(tmp_path / "traps")
    res = run_crawl(
        spark, pages, seeds,
        CrawlConfig(
            max_iterations=6, max_per_host=25, salt=1, salt_mode="static",
            state_dir=sd, trap_detect_every=1, trap_min_urls=15,
            trap_min_share_ppm=500_000,
        ),
    )
    seen = _final_seen(spark, sd)
    # all articles fetched ('a' sorts before 'c': wave 1 = 10 art + 15 cal)
    assert all(f"https://t.ex/art{i}" in seen for i in range(10))
    # the trap stopped expanding after detection: only wave-1's cal urls
    assert sum(1 for u in seen if "/cal/" in u) == 15
    assert res.total_fetched == 25


def test_recrawl_over_threshold_rebuilds_filter(spark, corpus, tmp_path):
    """Round-5 verdict What's-wrong #1: when the recrawl sweep invalidates
    more rows than auto_filter_threshold, the driver must NOT collect the
    hash list — the cuckoo filter is rebuilt from the surviving url_seen
    instead. Forced here with auto_filter_threshold=0; behavior (everything
    re-fetches) must match the collect+delete path."""
    from hepcrawl_spark.crawl.frontier import _write_manifest, read_manifest

    sd = str(tmp_path / "inv2")
    seeds10 = corpus.orderBy("page_id").limit(10).select(
        "url", "host", F.lit(1.0).alias("priority"),
        F.col("warc_ts").alias("discovered_ts"),
    )
    run_crawl(
        spark, corpus, seeds10,
        CrawlConfig(max_iterations=2, max_per_host=15, salt=1,
                    filter_mode="cuckoo", state_dir=sd, n_expected_urls=5000),
    )
    m = read_manifest(sd)
    url_seen = spark.read.parquet(m["url_seen"])
    n_seen = url_seen.count()
    refeed = url_seen.select(
        "url",
        F.lower(F.parse_url("url", F.lit("HOST"))).alias("host"),
        F.lit(1.0).alias("priority"),
        (F.col("last_ts") - F.expr("INTERVAL 1 DAY")).alias("discovered_ts"),
        F.lit(0).alias("attempt"),
    )
    it_dir = f"{sd}/iter_{m['iteration']:04d}"
    refeed.write.mode("overwrite").parquet(f"{it_dir}/frontier")
    _write_manifest(sd, m["iteration"], {
        "frontier": f"{it_dir}/frontier",
        "url_seen": m["url_seen"],
        "seen_size": n_seen,
    })
    res = run_crawl(
        spark, corpus, seeds10,
        CrawlConfig(max_iterations=m["iteration"] + 2, max_per_host=1000,
                    salt=1, filter_mode="cuckoo", state_dir=sd,
                    n_expected_urls=5000,
                    recrawl_cutoff="2100-01-01 00:00:00",
                    auto_filter_threshold=0),
        resume=True,
    )
    assert res.iterations[0].fetched == n_seen
