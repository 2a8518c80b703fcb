"""Structured Streaming ingest (SURVEY.md §2.11).

The reference is a batch harvester, but its incremental semantics (watermark
resume, late/duplicate handling, per-set state) map onto Structured
Streaming when the corpus arrives as a feed instead of a table. This module
provides the streaming twins of the batch operators:

- ``stream_events``: file-source stream over an events-shaped directory
  (url-discovery events, fetch telemetry, ...).
- ``windowed_counts``: tumbling-window counts with a watermark — the
  streaming twin of the batch ``w1_tumbling_window`` query, so late rows are
  handled instead of reprocessed (oaipmh from_date semantics).
- ``streaming_url_seen_dedup``: ``dropDuplicates`` keyed on url within the
  watermark horizon — the streaming twin of the crawl-once gate (D1) for a
  frontier that arrives as a stream.

Tested with ``trigger(availableNow=True)`` against the driver testdata
(tests/test_streaming.py) so the pipelines run real micro-batches without a
long-lived daemon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a directory of events parquet files."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 3).alias("total"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


def streaming_url_seen_dedup(
    frontier_stream: DataFrame,
    watermark: str = "24 hours",
    ts_col: str = "ts",
    key_col: str = "props",
) -> DataFrame:
    """Streaming crawl-once: first occurrence per key within the watermark
    horizon passes; repeat visits (same key, ANY timestamp inside the
    horizon) are dropped by the state store. State size is bounded by the
    watermark — the streaming analogue of the bloom-gated anti-join (D1).

    ``dropDuplicatesWithinWatermark`` keys on the url alone, so the same URL
    re-arriving with a different timestamp is still suppressed — keying on
    (key, ts) would only remove exact duplicates, not repeat visits."""
    return frontier_stream.withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark([key_col])


def run_available_now(stream_df: DataFrame, checkpoint: str) -> list:
    """Drain everything currently available through a memory sink and return
    the rows (test/bench helper; real deployments writeStream to a table)."""
    name = f"mem_{abs(hash(checkpoint)) % 10**9}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if _has_aggregate(stream_df) else "append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}").collect()


def _has_aggregate(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: consecutive events of one key belong to the
    same session while the inter-event gap stays under ``gap_s`` seconds.

    The classic two-window formulation — mark session starts with lag(),
    then a running sum of start-marks numbers the sessions — so both
    windows share ONE shuffle on the key and the whole thing stays in
    whole-stage codegen. Ties on the timestamp are broken by
    ``order_tiebreak`` so numbering is deterministic.

    Returns one row per session: key, session_idx (1-based per key),
    n_events, session_start/session_end (formatted strings per the gate
    conventions), duration_s.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    marked = events.withColumn(
        "_new",
        F.when(
            F.lag(ts_col).over(w).isNull()
            | (
                F.unix_timestamp(F.col(ts_col))
                - F.unix_timestamp(F.lag(ts_col).over(w))
                > gap_s
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_idx",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        marked.groupBy(key_col, "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            (
                F.unix_timestamp(F.max(ts_col))
                - F.unix_timestamp(F.min(ts_col))
            ).cast("long").alias("duration_s"),
        )
        .withColumn("session_idx", F.col("session_idx").cast("long"))
    )


def _session_schemas(events: DataFrame, key_col: str):
    """Output/state schemas built from the ACTUAL key column type, so any
    key (long user ids, string hosts) works and keeps its name."""
    key_field = events.schema[key_col]
    out = StructType(
        [
            StructField(key_col, key_field.dataType),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
            StructField("duration_s", LongType()),
        ]
    )
    state = StructType(
        [
            StructField("start_us", LongType()),
            StructField("last_us", LongType()),
            StructField("n", LongType()),
        ]
    )
    return out, state


def sessionize_stream(
    events: DataFrame,
    gap_s: int = 1800,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming gap sessionization — the stateful twin of :func:`sessionize`.

    ``applyInPandasWithState`` keeps one open session per key: events inside
    the gap extend it, a larger gap (or an event-time timeout once the
    watermark passes last_event + gap) closes it and emits the session row.
    State is three ints per key; the watermark bounds both state retention
    and late-data admission. Closed sessions are append-mode output, so the
    sink sees each session exactly once.

    Out-of-order handling: each batch sweep-merges its (sorted) events
    together with the open session, so an admissible late event either
    extends the open session backwards (within the gap) or closes as its
    own earlier session — it is never silently absorbed. The one
    divergence from the batch twin: a session closed at a microbatch
    boundary cannot be reopened by an even-later event in a later batch
    (it would emit as a separate session) — the standard streaming
    trade-off; shrink it by widening the watermark.
    """
    import pandas as pd  # local: keep module importable without pandas
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_s * 1_000_000
    out_schema, state_schema = _session_schemas(events, key_col)

    def fn(key, pdf_iter, state: GroupState):
        kv = key[0]

        def close(start_us, last_us, n):
            return pd.DataFrame(
                {
                    key_col: [kv],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "duration_s": [(last_us - start_us) // 1_000_000],
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield close(start_us, last_us, n)
            return

        # proto-sessions: each event is (t, t, 1); the open session joins
        # the sweep as (start, last, n); sort by start and merge on gap
        protos = []
        for pdf in pdf_iter:
            # explicit unit cast: Arrow hands the block over as
            # datetime64[ns]; int64 of that would be nanoseconds
            protos.extend(
                (int(v), int(v), 1)
                for v in pdf[ts_col]
                .astype("datetime64[us]")
                .astype("int64")
                .tolist()
            )
        if state.exists:
            protos.append(tuple(state.get))
        protos.sort()
        cur = None
        for p in protos:
            if cur is None:
                cur = p
            elif p[0] - cur[1] > gap_us:
                yield close(*cur)
                cur = p
            else:
                cur = (cur[0], max(cur[1], p[1]), cur[2] + p[2])
        if cur is not None:
            state.update(cur)
            # event-time timeout: fire once the watermark passes last + gap.
            # Spark requires the timeout to sit strictly beyond the current
            # watermark, so clamp when processing late backlog.
            wm_ms = state.getCurrentWatermarkMs()
            to_ms = max(cur[1] // 1000 + gap_s * 1000, wm_ms + 1)
            state.setTimeoutTimestamp(to_ms)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
