"""Custom stateful streaming via ``transformWithStateInPandas``.

Spark 4's successor to ``applyInPandasWithState``
(``streaming/stateful.py``): state is managed through a
:class:`StatefulProcessor` with NAMED, TYPED state primitives
(value/list/map state, timers, TTL) instead of one opaque tuple — the
API long-running production pipelines migrate to because state can
evolve (add a counter without rewriting the blob) and expire (TTL)
without hand-rolled bookkeeping.

The demo processor mirrors ``running_user_stats`` exactly — per-user
running (n_events, n_high, value-cents sum) — so the SAME batch
aggregate certifies both stateful APIs, and the cents sum is exact
BIGINT here (the older operator's float sum stays out of its hash by
design; this one's integer sum can go IN).

Scale notes: requires the RocksDB state store provider (the
transformWithState backend — incremental checkpointing, state larger
than memory), which is exactly what a 100 TB deployment runs anyway;
the caller sets the provider conf. State is hash-partitioned by the
grouping key; each micro-batch ships only touched groups through
Arrow.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import LongType, StructField, StructType

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

TWS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_high", LongType()),
        StructField("sum_cents", LongType()),
    ]
)

_TWS_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("n_high", LongType()),
        StructField("sum_cents", LongType()),
    ]
)


class RunningStatsProcessor(StatefulProcessor):
    """Per-user running counters in a named ValueState."""

    def __init__(self, high_threshold_cents: int = 5000):
        self._threshold = high_threshold_cents

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counters = handle.getValueState("counters", _TWS_STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._counters.exists():
            n_events, n_high, sum_cents = self._counters.get()
        else:
            n_events, n_high, sum_cents = 0, 0, 0
        for pdf in rows:
            n_events += len(pdf)
            n_high += int((pdf["cents"] > self._threshold).sum())
            sum_cents += int(pdf["cents"].sum())
        self._counters.update((n_events, n_high, sum_cents))
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": n_events,
                    "n_high": n_high,
                    "sum_cents": sum_cents,
                }
            ]
        )

    def close(self) -> None:
        pass


def running_user_stats_tws(
    events: DataFrame, high_threshold_cents: int = 5000
) -> DataFrame:
    """``transformWithStateInPandas`` twin of
    ``stateful.running_user_stats``: per-user running
    (n_events, n_high, sum_cents), one output row per touched user per
    micro-batch. ``events`` must carry (user_id, cents)."""
    return (
        events.select("user_id", "cents")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningStatsProcessor(high_threshold_cents),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
