"""Streaming politeness: a stateful per-host crawl budget.

Batch politeness (operators/politeness.select_wave) re-ranks each wave; a
STREAMING frontier needs the budget to persist ACROSS micro-batches — the
reference's per-domain concurrency cap lives in its long-running downloader
(edp_spider.py:108-109, settings.py:50-51), so the streaming twin is a
custom stateful operator: ``applyInPandasWithState`` keyed on host, whose
state row carries the host's cumulative admitted count. Rows beyond the
budget are dropped (or, in a real deployment, routed to a retry topic).

State size: one long per host — bounded by the host universe, not the
stream; at web scale (10^8 hosts) the RocksDB state store holds ~1 GB,
partitioned by the same host key as the shuffle, so admission is a local
lookup."""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def streaming_host_budget(
    frontier_stream: DataFrame,
    max_per_host: int,
    host_col: str = "host",
) -> DataFrame:
    """Admit at most ``max_per_host`` rows per host over the stream's
    lifetime (the crawl-budget analogue of P1/P2 for a streaming frontier).

    The admitted count survives micro-batch boundaries via the state store,
    so a host that exhausts its budget in batch 1 admits nothing in batch 2
    — exactly what a per-batch window cap cannot express."""
    out_schema = frontier_stream.schema
    state_schema = StructType([StructField("admitted", LongType())])

    def admit(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (admitted,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            room = max_per_host - admitted
            if room <= 0:
                continue
            out = pdf.iloc[:room]
            admitted += len(out)
            yield out
        state.update((admitted,))

    return frontier_stream.groupBy(host_col).applyInPandasWithState(
        admit,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
