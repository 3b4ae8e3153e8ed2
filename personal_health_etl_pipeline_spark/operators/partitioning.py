"""Partitioning helpers for compute-bound operators.

Spark sizes scan partitions by *bytes* (``maxPartitionBytes``), which
is right for IO-bound plans but wrong for operators whose per-row work
dwarfs their input bytes — shingling + hashing a 1 KB document costs
thousands of times its scan cost. A small parquet file then becomes a
single task that serializes the whole sketch pipeline on one core.

``spread`` widens such inputs to the cluster's parallelism with one
round-robin shuffle of the (tiny) projected input — but only when the
input is big enough for task-scheduling overhead not to dominate:
the target width is scaled by the optimizer's size estimate
(``MIN_BYTES_PER_PARTITION``), so a few-hundred-row frame stays narrow
(32 tasks of 16 rows each cost more in scheduling than they win in
parallelism — measured 1.5-2x on sub-second queries) while a genuinely
compute-heavy corpus still fans out. At real scale the scan already
yields >= cores splits and ``spread`` is a no-op — the cost appears
exactly when it pays for itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# below ~256 KB per would-be partition, task overhead beats parallelism
# for moderate array-expression operators (integer dot products,
# tokenize-and-count) on this engine
MIN_BYTES_PER_PARTITION = 256 * 1024
# ...but shingle->multi-hash sketching (MinHash signatures, simhash
# bit-votes, n-gram inverted indexes) costs ~32 hash evaluations per
# shingle — orders of magnitude more compute per input byte — so those
# call sites fan out from a much smaller input
SKETCH_MIN_BYTES_PER_PARTITION = 16 * 1024
# plain tokenize+explode (+ one cheap expr per token) sits between the
# two: ~1.5 us/byte measured at bench scale — a compressed single-file
# corpus under the 256 KB floor serialized the whole stage on one task
# (r15: text_hashing_tf's tokenize stage, 0.6 s with 31 cores idle).
# Interleaved floor sweep on that stage: 256K 1.128 s / 64K 0.864 s /
# 16K 0.988 s median — 64K wins, 16K over-splits.
TOKENIZE_MIN_BYTES_PER_PARTITION = 64 * 1024


def spread(
    df: DataFrame,
    multiplier: int = 1,
    min_bytes: int = MIN_BYTES_PER_PARTITION,
) -> DataFrame:
    """Repartition up to ``defaultParallelism * multiplier`` if the
    frame currently has fewer partitions; never shrinks. The width is
    capped by the optimizer's size estimate at one partition per
    ``min_bytes`` of input, so tiny inputs skip the shuffle (and the
    driver-side ``df.rdd`` plan conversion) entirely; operators whose
    per-byte compute is extreme pass a smaller ``min_bytes``.
    """
    if df.isStreaming:
        # a streaming frame's width is the source's concern (and its
        # stats default to "unknown" = Long.Max); inside foreachBatch
        # the micro-batch arrives as a regular DataFrame and spreads
        # normally
        return df
    sc = df.sparkSession.sparkContext
    # Catalyst's size estimate: free (no execution), derived from file
    # sizes for scans. Conservative for filtered plans (over-estimates
    # -> spreads a bit too eagerly, the safe direction).
    est_bytes = int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    target = min(
        sc.defaultParallelism * multiplier,
        max(1, est_bytes // min_bytes),
    )
    if target <= 1:
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
