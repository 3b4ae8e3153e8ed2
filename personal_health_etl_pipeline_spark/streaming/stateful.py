"""Custom stateful streaming operator via ``applyInPandasWithState``.

Windows/sessions/dedup cover the declarative stateful surface
(``streaming.windows``); this is the escape hatch for operators Spark
doesn't ship: arbitrary per-key state updated batch-by-batch in Python.
The demo operator keeps per-user running counters (events seen, "high"
events over a threshold, value sum) and emits the refreshed totals for
exactly the users present in each micro-batch — the streaming twin of
a grouped aggregate the batch engine would express as ``groupBy.agg``.

Scale notes: state lives in the executor state store partitioned by
the grouping key (same hash partitioning as any keyed aggregation);
each micro-batch ships only the touched groups through Arrow. State
size is O(distinct users), independent of stream length. Use the
declarative operators when they fit — this API costs Python transit
and should carry only logic Catalyst can't express.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_high", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("n_high", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def running_user_stats(events: DataFrame, high_threshold: float = 50.0) -> DataFrame:
    """Per-user running (n_events, n_high, sum_value), updated every
    micro-batch; one output row per touched user per batch."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n_events, n_high, sum_value = (
            state.get if state.exists else (0, 0, 0.0)
        )
        for pdf in pdfs:
            n_events += len(pdf)
            n_high += int((pdf["value"] > high_threshold).sum())
            sum_value += float(pdf["value"].sum())
        state.update((n_events, n_high, round(sum_value, 6)))
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": n_events,
                    "n_high": n_high,
                    "sum_value": round(sum_value, 6),
                }
            ]
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            RUNNING_STATS_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
