"""spark-submit packaging: the zip imports standalone, the job CLI parses."""

import subprocess
import sys
import zipfile


def test_zip_builds_and_imports(tmp_path):
    from tools.make_submit import build_zip

    out = build_zip(str(tmp_path / "pkg.zip"))
    names = zipfile.ZipFile(out).namelist()
    assert "hepcrawl_spark/crawl/frontier.py" in names
    assert "hepcrawl_spark/sources/merge_store.py" in names
    # determinism: same tree -> same bytes
    out2 = build_zip(str(tmp_path / "pkg2.zip"))
    assert open(out, "rb").read() == open(out2, "rb").read()
    # the zip must import WITHOUT the repo on sys.path (the --py-files
    # contract: executors see only the zip). pandas_udf modules import
    # lazily/session-free, so a plain import is the real check.
    code = (
        f"import sys; sys.path.insert(0, {out!r}); "
        "import hepcrawl_spark.crawl.frontier as fr; "
        "import hepcrawl_spark.operators.components; "
        "import hepcrawl_spark.parsers.sitemap; "
        "print(fr.CrawlConfig().filter_mode)"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd="/tmp"
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "bloom"


def test_job_cli_parses():
    from jobs.crawl_job import parse_args

    a = parse_args(
        ["--pages", "/p", "--seeds", "/s", "--state", "/st",
         "--filter-mode", "bloom_table", "--seen-store", "merge",
         "--snapshot-every", "5", "--resume"]
    )
    assert a.filter_mode == "bloom_table" and a.seen_store == "merge"
    assert a.snapshot_every == 5 and a.resume
