"""Structured Streaming twins: windowed agg with watermark + streaming
dedup, drained via availableNow triggers (real micro-batch execution)."""

import pyspark.sql.functions as F
import pytest

from hepcrawl_spark.streaming.events import (
    run_available_now,
    stream_events,
    streaming_url_seen_dedup,
    windowed_counts,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # copy events into a streaming source dir (file source requires a dir)
    d = tmp_path_factory.mktemp("events_stream")
    spark.read.parquet(f"{SF_SMALL}/events.parquet").write.mode("overwrite").parquet(
        str(d / "in")
    )
    return str(d / "in")


def test_windowed_counts_match_batch(spark, events_dir, tmp_path):
    stream = stream_events(spark, events_dir)
    agg = windowed_counts(stream, window="1 hour", watermark="2 hours")
    rows = run_available_now(agg, str(tmp_path / "ckpt"))

    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("win_start"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 3).alias("total"))
    )
    expected = {
        (r["win_start"], r["event_type"]): (r["n"], r["total"])
        for r in batch.collect()
    }
    got = {(r["win_start"], r["event_type"]): (r["n"], r["total"]) for r in rows}
    assert got == expected


def test_streaming_dedup_drops_duplicates(spark, events_dir, tmp_path):
    stream = stream_events(spark, events_dir)
    deduped = streaming_url_seen_dedup(stream, key_col="props", ts_col="ts")
    rows = run_available_now(deduped, str(tmp_path / "ckpt2"))
    keys = [r["props"] for r in rows]
    # repeat visits (same key, different ts) are suppressed, not just
    # exact duplicates
    assert len(keys) == len(set(keys))
    assert len(rows) <= spark.read.parquet(events_dir).count()


def test_streaming_host_budget_persists_across_batches(spark, tmp_path):
    """The stateful per-host budget must carry over micro-batch boundaries:
    a host that exhausts its budget in batch 1 admits nothing in batch 2."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from hepcrawl_spark.streaming.politeness import streaming_host_budget

    schema = StructType(
        [StructField("host", StringType()), StructField("rid", LongType())]
    )
    src = tmp_path / "frontier_in"
    src.mkdir()
    # batch 1: hostA x5, hostB x2 ; batch 2: hostA x5, hostB x2
    b1 = spark.createDataFrame(
        [("hostA", i) for i in range(5)] + [("hostB", 100 + i) for i in range(2)],
        schema,
    )
    b2 = spark.createDataFrame(
        [("hostA", 10 + i) for i in range(5)] + [("hostB", 200 + i) for i in range(2)],
        schema,
    )
    b1.coalesce(1).write.parquet(str(src / "f1"))
    b2.coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    admitted = streaming_host_budget(stream, max_per_host=6)
    name = "budget_sink"
    q = (
        admitted.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r["rid"])
    # hostA: 10 offered over 2+ batches, only 6 admitted in total
    assert len(by_host["hostA"]) == 6
    # hostB: 4 offered, all within budget
    assert sorted(by_host["hostB"]) == [100, 101, 200, 201]


def test_incremental_harvest_with_cross_restart_dedup(spark, tmp_path):
    """availableNow harvest: each run processes only NEW files (checkpoint),
    and url dedup state survives the restart — a url ingested in run 1 is
    dropped when it reappears in run 2 within the watermark."""
    import datetime as dt

    from hepcrawl_spark.schemas import PAGES_SCHEMA
    from hepcrawl_spark.streaming.harvest import run_harvest_increment

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write_chunk(rows):
        spark.createDataFrame(
            [(u, t, None, txt, "en") for u, txt in rows], PAGES_SCHEMA
        ).coalesce(1).write.mode("append").parquet(pages_dir)

    write_chunk([("https://h/a", "alpha text one"), ("https://h/b", "beta text two")])
    run_harvest_increment(spark, pages_dir, out_dir, ckpt)
    first = {r["url"] for r in spark.read.parquet(out_dir).collect()}
    assert first == {"https://h/a", "https://h/b"}

    # second increment: b repeats (must dedup via restored state), c is new
    write_chunk([("https://h/b", "beta text two"), ("https://h/c", "gamma text three")])
    run_harvest_increment(spark, pages_dir, out_dir, ckpt)
    out = spark.read.parquet(out_dir).collect()
    urls = sorted(r["url"] for r in out)
    assert urls == ["https://h/a", "https://h/b", "https://h/c"]
    assert all(r["n_tokens"] == 3 for r in out)


def test_sessionize_stream_closes_on_gap_and_timeout(spark, tmp_path):
    """Stateful streaming sessionization: a mid-batch gap closes a session
    immediately; an open session survives the first availableNow run in
    state and is closed by the event-time timeout once a later batch
    advances the watermark."""
    import datetime as dt

    from hepcrawl_spark.streaming.events import (
        EVENTS_SCHEMA,
        sessionize_stream,
        stream_events,
    )

    ev_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    out_dir = str(tmp_path / "out")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write_chunk(rows):
        spark.createDataFrame(
            [
                (i, t0 + dt.timedelta(seconds=s), uid, "e", 0.0, None)
                for i, (uid, s) in enumerate(rows)
            ],
            EVENTS_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(ev_dir)

    def drain():
        q = (
            sessionize_stream(
                stream_events(spark, ev_dir), gap_s=600, watermark="10 minutes"
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        try:
            return spark.read.parquet(out_dir).collect()
        except Exception:
            return []

    # batch 1: user 7 has two sessions separated by a 2000 s gap (the first
    # closes mid-batch); the second stays open in state
    write_chunk([(7, 0), (7, 60), (7, 120), (7, 2120), (7, 2180)])
    out1 = drain()
    assert len(out1) == 1
    assert out1[0].n_events == 3 and out1[0].duration_s == 120

    # batch 2: a much later event for another user pushes the watermark far
    # past user 7's open session -> its event-time timeout fires and closes it
    write_chunk([(9, 90000)])
    out2 = drain()
    closed = {(r.user_id, r.n_events, r.duration_s) for r in out2}
    assert (7, 2, 60) in closed

    # batch 3: drain once more; user 9's session closes via timeout too
    write_chunk([(9, 180000)])
    out3 = drain()
    assert (9, 1, 0) in {(r.user_id, r.n_events, r.duration_s) for r in out3}


def test_sessionize_stream_late_event_not_absorbed(spark, tmp_path):
    """A late event arriving in a later batch, EARLIER than the open
    session's start and outside the gap, must close as its own session —
    not be silently absorbed into the open one."""
    import datetime as dt

    from hepcrawl_spark.streaming.events import (
        EVENTS_SCHEMA,
        sessionize_stream,
        stream_events,
    )

    ev_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    out_dir = str(tmp_path / "out")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write_chunk(rows):
        spark.createDataFrame(
            [(i, t0 + dt.timedelta(seconds=s), uid, "e", 0.0, None)
             for i, (uid, s) in enumerate(rows)],
            EVENTS_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(ev_dir)

    def drain():
        q = (
            sessionize_stream(
                stream_events(spark, ev_dir), gap_s=600, watermark="6 hours"
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        try:
            return spark.read.parquet(out_dir).collect()
        except Exception:
            return []

    # batch 1: open session for user 7 at +7200 s
    write_chunk([(7, 7200), (7, 7260)])
    drain()
    # batch 2 (within the 6 h watermark): a LATE event at +0 s — 2 h before
    # the open session, far outside the 600 s gap -> its own session
    write_chunk([(7, 0)])
    out = drain()
    closed = {(r.n_events, r.duration_s) for r in out}
    assert (1, 0) in closed        # the late lone event
    # the open session was not corrupted: nothing merged it backwards
    assert all(r.duration_s <= 60 for r in out)

    # batch 3: a late event INSIDE the gap below the open session start
    # extends it backwards instead of splitting
    write_chunk([(7, 6900)])
    write_chunk([(9, 90000)])      # watermark push -> timeout closes user 7
    out = drain()
    assert (3, 360) in {(r.n_events, r.duration_s) for r in out}
