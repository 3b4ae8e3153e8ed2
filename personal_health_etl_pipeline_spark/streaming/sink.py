"""Conflict-checked append sink (streaming twin of reference J3).

The reference's warehouse append raises if a key lands twice
(reference ``load.py:277-302``): duplicate ``day`` across raw blobs is
a pipeline failure, not a merge. ``foreachBatch`` reproduces that
policy per micro-batch: validate the batch against itself *and*
against everything already written, then append — validate-then-act,
the same error-as-dataflow restructuring the batch pipeline uses
(``operators.conflict``).

Scale notes: the existing-key probe is a broadcast-able semi-join on
the key column only (column-pruned scan of the sink), not a full read;
the intra-batch check is one aggregation. Micro-batches are small
relative to the sink by construction, so the join side that grows is
the pruned key scan — at warehouse scale that becomes a Delta/iceberg
MERGE precondition instead, same plan shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.operators.conflict import (
    DuplicateKeyError,
    assert_unique_key,
)


def clash_probe(existing: DataFrame, batch_df: DataFrame, key: str) -> DataFrame:
    """Existing-sink rows whose ``key`` also appears in the micro-batch.

    Broadcasts the MICRO-BATCH keys (bounded by construction) and streams
    the sink-side key scan past them: the sink grows without bound as the
    stream appends, so it must never be the broadcast side. The probe
    stays a column-pruned scan of the sink.
    """
    batch_keys = batch_df.select(key).distinct()
    return existing.select(key).join(F.broadcast(batch_keys), key, "left_semi")


def conflict_checked_append(target_path: str, key: str = "event_id"):
    """Build a ``foreachBatch`` function appending parquet to
    ``target_path`` unless the batch violates key uniqueness."""

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            # reference semantics: empty envelopes still mark progress
            # (extract.py:187-193) — an empty batch is a successful no-op.
            return
        assert_unique_key(batch_df, key)
        spark = batch_df.sparkSession
        if os.path.isdir(target_path) and any(
            f.endswith(".parquet") for f in os.listdir(target_path)
        ):
            existing = spark.read.parquet(target_path)
            clash = clash_probe(existing, batch_df, key).limit(5).collect()
            if clash:
                cited = ", ".join(repr(r[key]) for r in clash)
                raise DuplicateKeyError(
                    f"batch {batch_id} re-writes existing {key!r} values: {cited}"
                )
        batch_df.write.mode("append").parquet(target_path)

    return _append


def run_append_stream(
    events: DataFrame,
    target_path: str,
    checkpoint_dir: str,
    key: str = "event_id",
):
    """Wire a streaming frame into the conflict-checked sink.

    Returns the started ``StreamingQuery``; callers own its lifecycle
    (tests use ``processAllAvailable`` + ``stop``).
    """
    return (
        events.writeStream.foreachBatch(conflict_checked_append(target_path, key))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
