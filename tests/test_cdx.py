import pyspark.sql.functions as F

from hepcrawl_spark.sources import cdx


def test_surt_key(spark):
    cases = [
        ("https://www.Example.org:8080/A/b?z=1&a=2", "org,example)/a/b?a=2&z=1"),
        ("http://sub.host.com/", "com,host,sub)/"),
        ("https://host.com", "com,host)/"),
        ("https://h.com/p#frag", "com,h)/p"),
        ("https://h.com/Path/X", "com,h)/path/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["k"] for r in df.select(cdx.surt_key("url").alias("k")).collect()]
    assert got == [k for _, k in cases]


def _cdxj_lines(spark):
    rows = [
        # two captures of the same urlkey (dedup must keep ts=...0202)
        'org,example)/a 20240101000000 {"url": "https://example.org/a", '
        '"mime": "text/html", "status": "200", "digest": "sha1:AAA", '
        '"length": "100", "offset": "0", "filename": "w1.warc.gz"}',
        'org,example)/a 20240202000000 {"url": "https://example.org/a", '
        '"mime": "text/html", "status": "200", "digest": "sha1:BBB", '
        '"length": "120", "offset": "9", "filename": "w2.warc.gz"}',
        # non-fetchables: 404 and a pdf
        'org,example)/gone 20240101000000 {"url": "https://example.org/gone", '
        '"mime": "text/html", "status": "404", "digest": "sha1:CCC", '
        '"length": "1", "offset": "2", "filename": "w1.warc.gz"}',
        'org,example)/f.pdf 20240101000000 {"url": "https://example.org/f.pdf", '
        '"mime": "application/pdf", "status": "200", "digest": "sha1:DDD", '
        '"length": "5", "offset": "3", "filename": "w1.warc.gz"}',
        # malformed tail
        "garbage-without-timestamp",
    ]
    return spark.createDataFrame([(l,) for l in rows], "line string")


def test_parse_cdxj_rows_and_errors(spark):
    out = {(r["urlkey"], str(r["ts"])): r for r in cdx.parse_cdxj(_cdxj_lines(spark)).collect()}
    assert len(out) == 5
    good = out[("org,example)/a", "2024-01-01 00:00:00")]
    assert good["status"] == 200 and good["length"] == 100
    assert good["warc_filename"] == "w1.warc.gz" and good["error"] is None
    bad = out[(None, "None")]
    assert bad["error"].startswith("malformed cdxj")


def test_cdx_seeds_latest_fetchable(spark):
    seeds = cdx.cdx_seeds(cdx.parse_cdxj(_cdxj_lines(spark))).collect()
    assert len(seeds) == 1  # 404/pdf/malformed dropped, 2 captures deduped
    s = seeds[0]
    assert s["url"] == "https://example.org/a"
    assert s["host"] == "example.org"
    assert s["digest"] == "sha1:BBB"  # the NEWER capture won
    assert str(s["discovered_ts"]).startswith("2024-02-02")


def test_parse_cdx11(spark):
    lines = spark.createDataFrame(
        [
            ("org,example)/a 20240101000000 https://example.org/a text/html "
             "200 sha1:AAA - - 100 7 w1.warc.gz",),
            ("too short",),
        ],
        "line string",
    )
    rows = {r["urlkey"]: r for r in cdx.parse_cdx11(lines).collect()}
    good = rows["org,example)/a"]
    assert good["status"] == 200 and good["offset"] == 7
    assert good["error"] is None
    assert rows[None]["error"].startswith("malformed cdx11")


def test_cdx_pipeline_is_narrow_until_dedup(spark):
    plan = (
        cdx.parse_cdxj(_cdxj_lines(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
    # the dedup groupBy partial-aggregates (ObjectHashAggregate/SortAggregate
    # both carry a partial_ pass before the exchange)
    seeds_plan = (
        cdx.cdx_seeds(cdx.parse_cdxj(_cdxj_lines(spark)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert seeds_plan.count("Exchange") == 1
