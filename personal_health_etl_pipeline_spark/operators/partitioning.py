"""Partitioning helpers for compute-bound operators.

Spark sizes scan partitions by *bytes* (``maxPartitionBytes``), which
is right for IO-bound plans but wrong for operators whose per-row work
dwarfs their input bytes — shingling + hashing a 1 KB document costs
thousands of times its scan cost. A small parquet file then becomes a
single task that serializes the whole sketch pipeline on one core.

``spread`` widens such inputs to the cluster's parallelism with one
round-robin shuffle of the (tiny) projected input. At real scale the
scan already yields >= cores splits and ``spread`` is a no-op — the
cost appears exactly when it pays for itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Repartition up to ``defaultParallelism * multiplier`` if the
    frame currently has fewer partitions; never shrinks."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiplier
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
