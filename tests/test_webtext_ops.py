"""Round-5 webtext-pipeline operators: C4 filters, recrawl priority,
sessionization, unicode hygiene, blocklist gate, per-host cap."""

import datetime as dt

from pyspark.sql import functions as F

from hepcrawl_spark.functions.text import strip_controls, unicode_clean
from hepcrawl_spark.operators.filters import blocklist_gate, host_suffixes
from hepcrawl_spark.operators.recrawl import capture_changes, recrawl_schedule
from hepcrawl_spark.operators.scrub import cap_per_key
from hepcrawl_spark.operators.textstats import c4_rules
from hepcrawl_spark.streaming.events import sessionize


# -- C4 filters ---------------------------------------------------------------

GOOD = "This is a perfectly ordinary first sentence.\nAnd here is another full sentence.\nFinally a third complete sentence appears."


def _c4(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return c4_rules(df).collect()[0]


def test_c4_clean_page_passes(spark):
    r = _c4(spark, GOOD)
    assert r.passes and r.n_kept_lines == 3 and r.n_sentences == 3


def test_c4_javascript_line_dropped_page_survives(spark):
    r = _c4(spark, GOOD + "\nPlease enable JavaScript to view comments.")
    assert r.n_lines == 4 and r.n_kept_lines == 3 and r.passes


def test_c4_short_line_and_no_terminal_punct_dropped(spark):
    r = _c4(spark, GOOD + "\nHome | About | Contact\nclick here.")
    # nav line has no terminal punct; 'click here.' has < 5 words
    assert r.n_kept_lines == 3


def test_c4_min_sentences(spark):
    r = _c4(spark, "Only one good sentence lives here.")
    assert not r.passes and r.n_sentences == 1


def test_c4_lorem_and_brace_page_drops(spark):
    assert _c4(spark, GOOD + "\nlorem ipsum dolor sit amet.").has_lorem
    assert not _c4(spark, GOOD + "\nlorem ipsum dolor sit amet.").passes
    r = _c4(spark, GOOD + "\nif (x) { return; }")
    assert r.has_brace and not r.passes


def test_c4_clean_text_is_kept_lines(spark):
    r = _c4(spark, GOOD + "\nnoise js javascript junk here.")
    assert r.clean_text == GOOD


# -- recrawl priority ---------------------------------------------------------

def _hist(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), d)
         for (u, h, d) in rows],
        "url string, warc_ts timestamp, content_md5 string",
    )


def test_capture_changes_counts_transitions(spark):
    hist = _hist(spark, [
        ("a", 0, "v0"), ("a", 1, "v0"), ("a", 2, "v1"), ("a", 3, "v1"),
        ("b", 0, "w0"), ("b", 5, "w1"), ("b", 10, "w2"),
        ("c", 0, "x0"), ("c", 24, "x0"),
    ])
    out = {r.url: r for r in capture_changes(hist).collect()}
    assert out["a"].n_captures == 4 and out["a"].n_changes == 1
    assert out["b"].n_changes == 2
    assert out["c"].n_changes == 0 and out["c"].span_s == 24 * 3600
    # b changed 2x over 10h -> 4.8 changes/day
    assert out["b"].changes_per_day_ppm == 2 * 86400000000 // (10 * 3600)
    assert out["a"].change_rate_ppm == 1000000 // 3


def test_recrawl_schedule_bands(spark):
    hist = _hist(spark, [
        ("fast", 0, "a"), ("fast", 1, "b"), ("fast", 2, "c"),
        ("slow", 0, "a"), ("slow", 1, "a"), ("slow", 2, "b"),
        ("never", 0, "a"), ("never", 1, "a"),
    ])
    bands = {r.url: r.recrawl_band
             for r in recrawl_schedule(capture_changes(hist), top_frac_fast=0.34).collect()}
    assert bands["fast"] == 0 and bands["never"] == 2 and bands["slow"] == 1


# -- sessionization -----------------------------------------------------------

def test_sessionize_gap_splits(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    ev = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=s), 7) for i, s in
         enumerate([0, 60, 120, 4000, 4100, 9000])],
        "event_id long, ts timestamp, user_id long",
    )
    out = sessionize(ev, gap_s=1800).orderBy("session_idx").collect()
    assert [r.session_idx for r in out] == [1, 2, 3]
    assert [r.n_events for r in out] == [3, 2, 1]
    assert out[0].duration_s == 120 and out[0].session_start == "2024-01-01 12:00:00"


def test_sessionize_boundary_is_strict_gt(spark):
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, t0, 1), (2, t0 + dt.timedelta(seconds=1800), 1),
         (3, t0 + dt.timedelta(seconds=3601), 1)],
        "event_id long, ts timestamp, user_id long",
    )
    out = sessionize(ev, gap_s=1800).collect()
    assert sorted(r.n_events for r in out) == [1, 2]


# -- unicode hygiene ----------------------------------------------------------

def test_unicode_clean_composes_and_strips(spark):
    df = spark.createDataFrame(
        [(1, "Café menu"), (2, "a\x07b\x00c"), (3, "tab\tok\nline")],
        "id long, text string",
    )
    got = {r.id: r.c for r in df.select("id", unicode_clean("text").alias("c")).collect()}
    assert got[1] == "Café menu"
    assert got[2] == "abc"
    assert got[3] == "tab\tok\nline"


def test_strip_controls_keeps_plan_python_free(spark):
    df = spark.createDataFrame([(1, "x\x1fy")], "id long, t string")
    sel = df.select(strip_controls("t").alias("c"))
    assert sel.collect()[0].c == "xy"
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


# -- blocklist gate -----------------------------------------------------------

def test_host_suffixes_chain(spark):
    df = spark.createDataFrame([("Ads.Sub.Example.ORG",)], "host string")
    chain = df.select(host_suffixes("host").alias("s")).collect()[0].s
    assert chain == ["ads.sub.example.org", "sub.example.org", "example.org", "org"]


def test_blocklist_suffix_and_exact(spark):
    urls = spark.createDataFrame(
        [(1, "ads.bad.example"), (2, "bad.example"), (3, "notbad.example"),
         (4, "deep.exact.example"), (5, "good.example")],
        "doc_id long, host string",
    )
    bl = spark.createDataFrame(
        [("bad.example",), ("deep.exact.example",)], "entry string"
    )
    kept = sorted(r.doc_id for r in blocklist_gate(urls, bl).collect())
    # 1 (subdomain of bad.example) and 2 (exact) and 4 (exact) blocked;
    # 3 is NOT a label-boundary match for bad.example
    assert kept == [3, 5]


def test_blocklist_no_corpus_shuffle(spark):
    urls = spark.createDataFrame([(1, "a.b"), (2, "c.d")], "doc_id long, host string")
    bl = spark.createDataFrame([("b",)], "entry string")
    plan = blocklist_gate(urls, bl)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# -- per-host cap -------------------------------------------------------------

def test_cap_per_key_keeps_topk_deterministically(spark):
    rows = [(i, "h%d" % (i % 2), float(i % 5)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, host string, quality double")
    out = cap_per_key(df, key_col="host", order_col="quality", k=3).collect()
    assert len(out) == 6
    for r in out:
        assert r.key_rank <= 3
    # best quality (4.0) rows rank first; ties broken by doc_id asc
    h0 = sorted(r.doc_id for r in out if r.host == "h0")
    assert h0 == [4, 8, 14]


# -- trap detection -----------------------------------------------------------

def test_url_template_collapses_digits_and_hex(spark):
    from hepcrawl_spark.operators.traps import url_template
    df = spark.createDataFrame(
        [("/cal/2024/01/item9",), ("/s/deadbeef42cafe/p/3",), ("/about",)],
        "path string",
    )
    got = [r.t for r in df.select(url_template("path").alias("t")).collect()]
    assert got == ["/cal/N/N/itemN", "/s/H/p/N", "/about"]


def test_detect_traps_flags_exploding_template(spark):
    from hepcrawl_spark.operators.traps import detect_traps, trap_gate
    rows = [("h.ex", "/cal/%d/x" % i, "https://h.ex/cal/%d/x" % i)
            for i in range(30)]
    rows += [("h.ex", "/about%d" % i, "https://h.ex/about%d" % i)
             for i in range(3)]
    urls = spark.createDataFrame(rows, "host string, path string, url string")
    traps = detect_traps(urls, min_urls=20, min_share_ppm=500_000)
    flagged = {(r.host, r.template): r for r in traps.collect()}
    assert flagged[("h.ex", "/cal/N/x")].is_trap
    assert not flagged[("h.ex", "/aboutN")].is_trap
    assert flagged[("h.ex", "/cal/N/x")].share_ppm == 30 * 1_000_000 // 33
    kept = trap_gate(urls, traps).collect()
    assert len(kept) == 3 and all("/about" in r.path for r in kept)


# -- compression ratio ---------------------------------------------------------

def test_compression_ratio_orders_repetitive_below_prose(spark):
    from hepcrawl_spark.operators.textstats import compression_ratio
    df = spark.createDataFrame(
        [(1, "spam " * 400),
         (2, "A genuinely varied sentence mentioning quarks, hadrons, "
             "lattices, regularization, and seventeen unrelated concepts "
             "that keep the entropy respectable for this test." * 3),
         (3, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in compression_ratio(df).collect()}
    assert out[1].compress_ppm < out[2].compress_ppm
    assert out[1].n_bytes == 2000
    assert out[3].n_bytes == 0 and out[3].compress_ppm >= 0


def test_compression_ratio_is_deterministic(spark):
    from hepcrawl_spark.operators.textstats import compression_ratio
    df = spark.createDataFrame([(i, "text %d " % i * 50) for i in range(50)],
                               "doc_id long, text string")
    a = sorted(map(tuple, compression_ratio(df).collect()))
    b = sorted(map(tuple, compression_ratio(df.repartition(7)).collect()))
    assert a == b


# -- table profiler -----------------------------------------------------------

def test_profile_table_exact(spark):
    from hepcrawl_spark.operators.profile import profile_table
    df = spark.createDataFrame(
        [(1, "a", 9), (2, "a", 10), (3, None, 100), (4, "b", None)],
        "id long, s string, v long",
    )
    out = {r.col_name: r for r in profile_table(df).collect()}
    assert out["id"].n_rows == 4 and out["id"].n_nulls == 0
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
    # native-type comparison: 9 < 10 < 100 numerically, not lexically
    assert out["v"].min_s == "9" and out["v"].max_s == "100"
    assert out["v"].n_nulls == 1 and out["v"].n_distinct == 3


def test_profile_table_approx_single_pass(spark):
    from hepcrawl_spark.operators.profile import profile_table
    df = spark.createDataFrame([(i, "x%d" % (i % 5)) for i in range(100)],
                               "id long, s string")
    prof = profile_table(df, exact=False)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan  # HLL path: no countDistinct expansion
    out = {r.col_name: r for r in prof.collect()}
    assert abs(out["s"].n_distinct - 5) <= 1


# -- dedup canonicalization + mojibake ------------------------------------

def test_canonicalize_url_dedup_strips_tracking(spark):
    from hepcrawl_spark.functions.urls import canonicalize_url_dedup
    df = spark.createDataFrame(
        [(1, "https://A.Org:443/x?utm_source=tw&b=2&a=1&fbclid=f"),
         (2, "https://a.org/x?a=1&b=2"),
         (3, "https://a.org/only-tracking?UTM_MEDIUM=email")],
        "id long, url string",
    )
    got = {r.id: r.c for r in df.select("id", canonicalize_url_dedup("url").alias("c")).collect()}
    assert got[1] == "https://a.org/x?a=1&b=2"
    assert got[1] == got[2]
    assert got[3] == "https://a.org/only-tracking"


def test_fix_double_utf8(spark):
    from hepcrawl_spark.functions.text import fix_double_utf8_udf
    broken = "Café".encode("utf-8").decode("latin-1")        # 'CafÃ©'
    curly = "it’s".encode("utf-8").decode("cp1252")      # cp1252 path
    df = spark.createDataFrame(
        [(1, broken), (2, "already clean é and 日本語"), (3, curly),
         (4, "plain ascii."), (5, None)],
        "id long, t string",
    )
    fix = fix_double_utf8_udf()
    got = {r.id: r.c for r in df.select("id", fix("t").alias("c")).collect()}
    assert got[1] == "Café"
    assert got[2] == "already clean é and 日本語"   # never corrupted
    assert got[3] == "it’s"
    assert got[4] == "plain ascii."
    assert got[5] is None


def test_host_suffixes_keeps_registrable_domain_on_deep_chains(spark):
    deep = ".".join("a%d" % i for i in range(10)) + ".example.org"
    df = spark.createDataFrame([(deep,)], "host string")
    chain = df.select(host_suffixes("host", max_labels=8).alias("s")).collect()[0].s
    assert len(chain) == 8
    assert "example.org" in chain and "org" in chain  # short end survives
    bl = spark.createDataFrame([("example.org",)], "entry string")
    urls = spark.createDataFrame([(1, deep)], "doc_id long, host string")
    assert blocklist_gate(urls, bl).count() == 0


# -- meta robots + nofollow + packing ----------------------------------------

def test_extract_anchors_nofollow_flag(spark):
    from hepcrawl_spark.operators.anchors import extract_anchors
    html = ('<html><a rel="nofollow" href="https://t/1">a</a>'
            '<a href="https://t/2" rel="ugc nofollow">b</a>'
            '<a href="https://t/3">c</a></html>')
    pages = spark.createDataFrame([("https://s.org/p", html)], "url string, html string")
    got = {r.target_url: r.nofollow for r in extract_anchors(pages).collect()}
    assert got == {"https://t/1": True, "https://t/2": True, "https://t/3": False}


def test_meta_robots_attribute_order_free(spark):
    from hepcrawl_spark.functions.html import (
        meta_robots_nofollow, meta_robots_noindex,
    )
    df = spark.createDataFrame(
        [(1, '<meta name="robots" content="noindex, nofollow">'),
         (2, '<meta content="NOINDEX" name=robots>'),
         (3, '<meta name="viewport" content="noindex">'),
         (4, '<meta name="googlebot" content="nofollow">')],
        "id long, html string",
    )
    out = {r.id: (r.ni, r.nf) for r in df.select(
        "id",
        meta_robots_noindex("html").alias("ni"),
        meta_robots_nofollow("html").alias("nf"),
    ).collect()}
    assert out[1] == (True, True)
    assert out[2] == (True, False)   # reversed attribute order
    assert out[3] == (False, False)  # wrong meta name
    assert out[4] == (False, False)  # googlebot-specific tag is not robots


def test_pack_chunks_bins_and_offsets(spark):
    from hepcrawl_spark.operators.scrub import pack_chunks
    rows = [(i, 0, "b", 100) for i in range(5)]       # 5 chunks x 100 tokens
    df = spark.createDataFrame(rows, "doc_id long, chunk_id long, src string, n_tokens long")
    out = {r.doc_id: r for r in
           pack_chunks(df, capacity=256, bucket_col="src").collect()}
    assert [out[i].start_offset for i in range(5)] == [0, 100, 200, 300, 400]
    assert [out[i].bin for i in range(5)] == [0, 0, 0, 1, 1]


def test_pack_chunks_hash_bucketing_deterministic(spark):
    from hepcrawl_spark.operators.scrub import pack_chunks
    df = spark.createDataFrame([(i, 0, 7) for i in range(50)],
                               "doc_id long, chunk_id long, n_tokens long")
    a = sorted(map(tuple, pack_chunks(df, capacity=64, n_buckets=4).collect()))
    b = sorted(map(tuple, pack_chunks(df.repartition(5), capacity=64, n_buckets=4).collect()))
    assert a == b
