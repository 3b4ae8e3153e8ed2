"""Bucketed tables: co-located joins with zero shuffle.

At 100 TB the warehouse's biggest recurring cost is re-shuffling fact
tables on the same join key every query. Bucketing pre-partitions data
by ``hash(key) % n_buckets`` at write time; any equi-join or
aggregation on the key then reads co-located buckets with **no
exchange** on either side (Spark requires equal bucket counts).

The reference's warehouse is an append-only BigQuery table — bucketing
is the Spark-native equivalent of its clustered-table option. Bucketed
output must go through the session catalog (``saveAsTable``); the
session factory points ``spark.sql.warehouse.dir`` outside the repo.
"""

from __future__ import annotations

import shutil
from collections.abc import Sequence
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | Sequence[str],
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and sorted) by ``key`` (one column name
    or a sequence for composite keys, e.g. an LSH band table bucketed
    by ``(band_id, band_hash)``).

    Sorting within buckets lets sort-merge joins skip their sort step
    too — the join degenerates to a zip of pre-sorted bucket files.

    With the in-memory catalog, table *metadata* dies with the session
    while the warehouse *location* persists — a stale location from a
    prior session would fail the write, so orphaned locations are
    cleared first.
    """
    keys = [key] if isinstance(key, str) else list(key)
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    (
        df.write.bucketBy(n_buckets, keys[0], *keys[1:])
        .sortBy(keys[0], *keys[1:])
        .mode(mode)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
