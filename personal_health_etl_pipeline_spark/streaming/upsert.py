"""Streaming SCD-2 upsert sink: CDC micro-batches merged into a
dimension history with ``foreachBatch`` + ``operators.merge.scd2_merge``.

This is the streaming MERGE pattern: each micro-batch of update records
is applied to the current on-disk history exactly as a batch SCD-2
merge would (close changed rows, open new ones, pass history through),
and the new history version is committed atomically by parquet
directory swap (write new version dir, then repoint a pointer file).
Table formats (Delta/Iceberg) do the same thing with a transaction log;
this stays plain-parquet so the semantics remain oracle-checkable.

Ordering contract: within one batch each key appears at most once
(enforce upstream with ``dropDuplicates``/last-wins before the sink);
across batches, Structured Streaming's per-partition ordering plus the
merge's effective-date monotonicity give the same final history as one
big sorted batch replay — asserted stream-vs-batch in
``tests/test_streaming.py``.

Scale notes: the merge is join-shaped on the dimension key (see
``operators/merge.py``); micro-batches broadcast, the history is the
streamed side. Version dirs are O(history) each — at warehouse scale
swap the directory dance for a table-format MERGE, keeping this exact
logical plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from personal_health_etl_pipeline_spark.operators.merge import scd2_merge

_POINTER = "_CURRENT"


def read_current(spark, table_dir: str) -> DataFrame | None:
    """Read the current committed history version, or None if empty."""
    ptr = os.path.join(table_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(table_dir, version))


def list_versions(table_dir: str) -> list[str]:
    """All committed version names, oldest first. Every ``_commit``
    leaves its version directory in place (the pointer moves, nothing
    is deleted), so the table is TIME-TRAVELABLE for free — the same
    contract Delta/Iceberg sell, here as plain directories. A real
    deployment adds a retention sweep for versions older than its
    time-travel window."""
    return sorted(
        d
        for d in os.listdir(table_dir)
        if d.startswith("v") and os.path.isdir(os.path.join(table_dir, d))
    )


def read_version(spark, table_dir: str, version: str) -> DataFrame:
    """Time travel: read a specific committed version (see
    :func:`list_versions`), bypassing the current pointer."""
    return spark.read.parquet(os.path.join(table_dir, version))


def expire_versions(
    table_dir: str, keep_last: int = 1
) -> tuple[list[str], list[str]]:
    """Retention sweep (the VACUUM of this plain-parquet table format):
    delete every committed version directory except the newest
    ``keep_last`` — and NEVER the pointer target, even if the pointer
    lags behind ``keep_last`` (a reader following the pointer must
    always succeed). Returns ``(removed, kept)``, oldest first.

    Time travel to an expired version is gone by design — this is the
    same trade Delta's ``VACUUM`` / Iceberg's ``expire_snapshots``
    make; choose ``keep_last`` from the time-travel window.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    import shutil

    versions = list_versions(table_dir)
    ptr = os.path.join(table_dir, _POINTER)
    keep = set(versions[-keep_last:])
    if os.path.exists(ptr):
        with open(ptr, encoding="utf-8") as f:
            keep.add(f.read().strip())
    removed = [v for v in versions if v not in keep]
    for v in removed:
        shutil.rmtree(os.path.join(table_dir, v))
    return removed, [v for v in versions if v in keep]


def _commit(df: DataFrame, table_dir: str, version: str) -> None:
    out = os.path.join(table_dir, version)
    df.write.mode("overwrite").parquet(out)
    tmp = os.path.join(table_dir, _POINTER + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(version)
    os.replace(tmp, os.path.join(table_dir, _POINTER))  # atomic repoint


def scd2_upsert_sink(
    table_dir: str,
    key: str,
    attrs: list[str],
    eff_col: str = "eff_date",
):
    """Build a ``foreachBatch`` function merging each micro-batch into
    the SCD-2 history at ``table_dir`` (versioned parquet + pointer)."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        current = read_current(spark, table_dir)
        if current is None:
            # bootstrap: every first-seen key opens at its eff date
            from pyspark.sql import functions as F

            opened = batch_df.select(
                key,
                *attrs,
                F.col(eff_col).alias("valid_from"),
                F.lit(None).cast(batch_df.schema[eff_col].dataType).alias(
                    "valid_to"
                ),
                F.lit(True).alias("is_current"),
            )
            _commit(opened, table_dir, f"v{batch_id:08d}")
            return
        merged = scd2_merge(current, batch_df, key=key, attrs=attrs, eff_col=eff_col)
        _commit(merged, table_dir, f"v{batch_id:08d}")

    return _merge


def run_upsert_stream(
    updates: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key: str,
    attrs: list[str],
    eff_col: str = "eff_date",
):
    """Wire a CDC update stream into the SCD-2 upsert sink."""
    return (
        updates.writeStream.foreachBatch(
            scd2_upsert_sink(table_dir, key, attrs, eff_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
