from personal_health_etl_pipeline_spark.streaming.windows import (
    EVENTS_SCHEMA,
    dedup_events,
    read_events_stream,
    session_agg,
    sliding_agg,
    tumbling_agg,
)
from personal_health_etl_pipeline_spark.streaming.sink import (
    conflict_checked_append,
    run_append_stream,
)
from personal_health_etl_pipeline_spark.streaming.probe import (
    minhash_probe_sink,
    run_probe_stream,
)

__all__ = [
    "minhash_probe_sink",
    "run_probe_stream",
    "EVENTS_SCHEMA",
    "read_events_stream",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "dedup_events",
    "conflict_checked_append",
    "run_append_stream",
]
