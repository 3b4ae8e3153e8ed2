"""Streaming surface: windowed aggregation over the ``events`` stream.

The reference has no streaming runtime — its incrementality is batch
micro-catchup with watermark = max landed date and late data silently
dropped (reference ``extract.py:163-181``, ``transform.py:187``; see
SURVEY.md §2.8). The engine maps that to Structured Streaming:
event-time watermarks formalize the "late = dropped" policy, and the
window operators below are the streaming twins of the reference's
one-row-per-day rollup.

Every transform here takes *any* events DataFrame — batch or streaming —
and returns a lazy DataFrame. Spark's ``window``/``session_window``
aggregate functions execute identically in both modes, so the catalog
oracle-checks these functions in batch while ``tests/test_streaming.py``
drives the same code through a file-source micro-batch stream with
watermarks. One definition, two execution modes: the Spark-idiomatic
replacement for hand-rolled incremental code.

Scale notes (100 TB): windowed aggregation shuffles on (key, window) —
state size is bounded by watermark horizon × key cardinality, not by
stream length; ``session_window`` merges per-key in the state store.
``dropDuplicatesWithinWatermark`` keeps only in-horizon keys in state,
the streaming-safe version of a global ``dropDuplicates`` (whose state
would grow without bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Wire schema of the events table (TESTDATA.md); streaming reads must
# declare it up front — schema inference is a batch-only luxury.
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

DEFAULT_GAP = "30 minutes"


def read_events_stream(
    spark: SparkSession,
    src_dir: str,
    fmt: str = "parquet",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over a directory of event files.

    ``maxFilesPerTrigger=1`` makes micro-batch boundaries deterministic
    in tests; production would leave it unset and let the source batch.
    """
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .format(fmt)
        .load(src_dir)
    )


def with_watermark(events: DataFrame, delay: str | None) -> DataFrame:
    """Attach an event-time watermark (no-op for batch frames).

    The watermark is the engine's formal version of the reference's
    "anything ≤ max loaded date is never re-read" rule: events older
    than ``max(ts) - delay`` are dropped from open aggregations.
    """
    if delay is not None and events.isStreaming:
        return events.withWatermark("ts", delay)
    return events


def tumbling_agg(
    events: DataFrame, window: str = "1 hour", watermark: str | None = "2 hours"
) -> DataFrame:
    """Per-(window, event_type) count/sum over non-overlapping windows."""
    return (
        with_watermark(events, watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Overlapping-window count/sum; each event lands in window/slide
    windows (Spark materializes the assignment, no self-join needed)."""
    return (
        with_watermark(events, watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


def session_agg(
    events: DataFrame,
    gap: str = DEFAULT_GAP,
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Per-user sessions: windows extend while events arrive within
    ``gap``; ``session_end`` is Spark's convention last_ts + gap. The
    native stateful twin of the batch gaps-and-islands sessionizer
    (``plans.reference_surface.w3_sessionize``)."""
    return (
        with_watermark(events, watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_events(
    events: DataFrame, key: str = "event_id", watermark: str | None = "2 hours"
) -> DataFrame:
    """Exactly-once by key. Streaming: state-bounded
    ``dropDuplicatesWithinWatermark`` (keys older than the horizon are
    evicted — duplicates arriving later than the watermark delay pass
    through, the documented at-least-once residual). Batch: plain
    ``dropDuplicates``."""
    wm = with_watermark(events, watermark)
    if events.isStreaming and watermark is not None:
        return wm.dropDuplicatesWithinWatermark([key])
    return wm.dropDuplicates([key])
