"""Recrawl scheduling from capture history.

The reference crawls each source on a fixed schedule and relies on the
crawl-once gate's timestamp invalidation (middlewares.py:134-155) to decide
whether a URL is worth re-fetching once it is already queued. At web scale
the scheduler itself needs a per-URL *change-rate* estimate so the frontier
re-queues fast-moving pages first — the classic estimator is Cho &
Garcia-Molina (TOIT 2003): observe a URL at n capture times, count how many
consecutive captures changed content, and rank by changes per unit time.

Everything here is exact integer arithmetic (counts, epoch seconds, integer
``DIV``) so the output is bit-stable across engines and safe to diff between
crawl snapshots.

Scale shape: one shuffle on url (the lag window + the aggregate share it);
map-side partial aggregation does not apply to windows, but the per-url
history is tiny (capture counts, not bodies) — project the hash BEFORE the
shuffle so page bodies never move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def capture_changes(
    history: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    hash_col: str = "content_md5",
) -> DataFrame:
    """Per-URL change statistics from a multi-capture history.

    Input: one row per (url, capture) with a content digest. Output: one
    row per url with ``n_captures``, ``n_changes`` (consecutive captures
    whose digest differs), ``span_s`` (seconds between first and last
    capture), ``change_rate_ppm`` (changes per observed interval, the
    X/(n-1) frequentist estimator, in parts-per-million), and
    ``changes_per_day_ppm`` (changes per day of observed span — the
    recrawl-priority key: re-fetch the fastest movers first).
    """
    w = Window.partitionBy(url_col).orderBy("_ts", "_h")
    marked = history.select(
        url_col,
        F.col(ts_col).alias("_ts"),
        F.col(hash_col).alias("_h"),
    ).withColumn(
        "_changed",
        (F.lag("_h").over(w).isNotNull() & (F.col("_h") != F.lag("_h").over(w)))
        .cast("long"),
    )
    agg = marked.groupBy(url_col).agg(
        F.count("*").alias("n_captures"),
        F.sum("_changed").alias("n_changes"),
        (
            F.unix_timestamp(F.max("_ts")) - F.unix_timestamp(F.min("_ts"))
        ).alias("span_s"),
    )
    return agg.select(
        url_col,
        "n_captures",
        F.col("n_changes").cast("long").alias("n_changes"),
        F.col("span_s").cast("long").alias("span_s"),
        F.expr(
            "n_changes * 1000000 DIV greatest(n_captures - 1, 1)"
        ).alias("change_rate_ppm"),
        F.expr(
            "n_changes * 86400000000 DIV greatest(span_s, 1)"
        ).alias("changes_per_day_ppm"),
    )


def recrawl_schedule(
    stats: DataFrame,
    url_col: str = "url",
    top_frac_fast: float = 0.25,
) -> DataFrame:
    """Turn change statistics into a frontier priority band.

    Fast movers (above the ``1 - top_frac_fast`` quantile of changes/day)
    get band 0 (re-crawl first); pages never observed changing get band 2
    (re-crawl last); everything else band 1.

    Scale shape: the stats table is one row per URL — billions at web
    scale — so the threshold is an exact distributed quantile
    (``approxQuantile`` with zero relative error = one aggregation pass),
    NOT a global row_number window (which would sort every row in one
    task). Ties at the threshold all land in band 0 (strictly-above
    comparison keeps the band a pure column predicate).
    """
    cut = stats.stat.approxQuantile(
        "changes_per_day_ppm", [max(0.0, min(1.0, 1.0 - top_frac_fast))], 0.0
    )[0]
    return stats.select(
        url_col,
        "changes_per_day_ppm",
        F.when(F.col("n_changes") == 0, F.lit(2))
        .when(F.col("changes_per_day_ppm") > F.lit(cut), F.lit(0))
        .otherwise(F.lit(1))
        .alias("recrawl_band"),
    )
