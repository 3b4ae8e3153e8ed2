"""Streaming HLL register sink: incremental distinct-count maintenance.

``plans/sketches.hll_registers`` is the whole sketch state — O(m) rows
per group, mergeable by ``max(r)``. This sink keeps that state LIVE
across micro-batches with ``foreachBatch``: each batch is sketched,
max-merged into the stored register table, and committed by the same
versioned-parquet pointer swap as the SCD-2 upsert sink
(``streaming/upsert.py``). Any reader gets the current distinct-count
estimate at any time from ``plans/sketches.hll_estimate`` over O(m)
rows — never a re-scan of history.

Why this is THE streaming distinct-count shape at 100 TB:

* counting distincts exactly in a stream needs unbounded state; the
  register table is a few KB per group forever;
* max-merge is idempotent and commutative — replayed/duplicated
  batches (at-least-once delivery, backfills overlapping live data)
  change NOTHING, which no additive counter survives;
* the same table merges across streams/days/clusters (union then
  max) — the sketch is the integration point, not the pipeline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.plans.sketches import hll_registers

_POINTER = "_CURRENT"


def read_registers(spark, table_dir: str) -> DataFrame | None:
    """Current committed register table, or None before first commit."""
    ptr = os.path.join(table_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(table_dir, version))


def _commit(df: DataFrame, table_dir: str, version: str) -> None:
    out = os.path.join(table_dir, version)
    df.write.mode("overwrite").parquet(out)
    tmp = os.path.join(table_dir, _POINTER + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(version)
    os.replace(tmp, os.path.join(table_dir, _POINTER))  # atomic repoint


def hll_register_sink(
    table_dir: str,
    group_cols: tuple[str, ...] = ("event_type",),
    key_col: str = "user_id",
):
    """Build a ``foreachBatch`` function max-merging each micro-batch's
    registers into the stored table at ``table_dir``."""
    gc = list(group_cols)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        fresh = hll_registers(batch_df, tuple(gc), key_col)
        current = read_registers(spark, table_dir)
        merged = (
            fresh
            if current is None
            else current.unionByName(fresh)
            .groupBy(*gc, "idx")
            .agg(F.max("r").alias("r"))
        )
        _commit(merged, table_dir, f"v{batch_id:08d}")

    return _merge


def run_hll_stream(
    events: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    group_cols: tuple[str, ...] = ("event_type",),
    key_col: str = "user_id",
):
    """Wire an event stream into the register sink."""
    return (
        events.writeStream.foreachBatch(
            hll_register_sink(table_dir, group_cols, key_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
