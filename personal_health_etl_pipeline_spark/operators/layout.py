"""Storage-layout maintenance: small-file compaction, range clustering.

At 100 TB the dominant silent cost is not a bad plan but a bad layout:
a daily incremental append (the reference's write mode,
`composer_dags/dags/utils/data_sources/oura/etl/load.py:184-187`)
produces thousands of small files per partition, and an unclustered
table gives parquet min/max statistics no pruning power. These two
operators are the standard maintenance passes:

* **compact** — rewrite a parquet directory into ~``target_bytes``
  files (count derived from actual on-disk size, not a guess). Fewer,
  right-sized files = fewer scan tasks, fewer namenode/liststore calls,
  better column-chunk compression.
* **cluster_by** — global range-partition + in-file sort on the chosen
  keys. Each output file then covers a narrow key range, so parquet
  footer min/max statistics actually prune: a point/range predicate on
  the cluster key skips whole files (the poor man's Z-order; for one
  key prefix it is strictly better).

Both are rewrite jobs meant for a maintenance schedule, not the query
path — idempotent, and safe to re-run.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def parquet_file_count(path: str) -> int:
    return sum(
        1
        for _root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite ``path`` into ceil(size / target_bytes) parquet files at
    ``out_path``; returns the output file count.

    The file count comes from the *measured* input size, so a directory
    of 10k drizzle files and one of 3 big files both land on the same
    target layout. Rewrite-to-new-path (then swap) rather than
    in-place: readers never see a half-compacted directory.

    On object storage the local ``os.walk`` sizing becomes a liststore
    call (or the table format's manifest); everything else is
    unchanged.
    """
    n_files = max(1, math.ceil(_dir_bytes(path) / target_bytes))
    df = spark.read.parquet(path)
    # coalesce, not repartition: pure file-merge needs no shuffle —
    # each output file is a concatenation of input splits
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    # coalesce can only REDUCE partition count: when the input has fewer
    # partitions than the computed target, fewer files come out — report
    # what actually landed, not the target.
    return parquet_file_count(out_path)


def cluster_by(
    spark: SparkSession,
    path: str,
    out_path: str,
    cols: list[str],
    n_files: int | None = None,
) -> None:
    """Rewrite ``path`` range-clustered on ``cols``: one total-order
    range partitioning (sampled boundaries, one shuffle) and a
    sort *within* each output file.

    After this, every file holds a disjoint ``cols`` range -> parquet
    min/max footer stats prune files for predicates on the cluster key,
    and within-file sorting maximizes row-group skipping and RLE/delta
    compression on the key columns.
    """
    df = spark.read.parquet(path)
    if n_files is None:
        n_files = max(1, math.ceil(_dir_bytes(path) / (128 * 1024 * 1024)))
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(out_path)
    )


def _zvalue_expr(scaled_cols: list[str], bits: int) -> str:
    """Bit-interleave expression over pre-scaled bigint columns:
    z = ... sx[b] sy[b] ... sx[0] sy[0] (column j gets position
    b * k + (k - 1 - j), so cols[0] owns the most significant bit of
    each round — the conventional Morton layout)."""
    k = len(scaled_cols)
    terms = [
        f"shiftleft(shiftright({s}, {b}) & 1, {b * k + (k - 1 - j)})"
        for b in range(bits)
        for j, s in enumerate(scaled_cols)
    ]
    return " + ".join(terms)


def zorder_by(
    spark: SparkSession,
    path: str,
    out_path: str,
    cols: list[str],
    n_files: int | None = None,
    bits: int = 16,
) -> None:
    """Rewrite ``path`` clustered on the Z-ORDER (Morton) curve over
    ``cols``: each numeric key is affinely scaled onto a ``bits``-bit
    grid from its observed min/max (one bounded stats aggregate), the
    per-key bits are interleaved into one z-value, and files are
    range-partitioned + sorted by it.

    Why not :func:`cluster_by`: a lexicographic sort gives its FIRST
    key all the pruning power — a predicate on the second key alone
    decodes every file. The space-filling curve spreads locality across
    all keys, so min/max footer stats prune files for a predicate on
    ANY single key (each key's high bit splits the curve's range in
    half, its next bit in quarters, ...) — the layout Delta/Iceberg
    ship as OPTIMIZE ZORDER BY, here over plain parquet.

    Keys must be integral (cast-safe to bigint); bucket or epoch-scale
    doubles/timestamps first. Constant keys degrade gracefully (span
    clamps to 1, the key contributes zero bits).
    """
    df = spark.read.parquet(path)
    if n_files is None:
        n_files = max(1, math.ceil(_dir_bytes(path) / (128 * 1024 * 1024)))
    z = zorder_z_expr(df, cols, bits)
    from pyspark.sql import functions as F

    (
        df.withColumn("_z", F.expr(z))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def zorder_z_expr(df, cols: list[str], bits: int = 16) -> str:
    """The Morton z-value of ``cols`` as a SQL expression string over
    ``df``'s columns: each key affinely scaled onto a ``bits``-bit grid
    from its observed min/max (ONE bounded stats aggregate, driver-
    ferried as literals), bits interleaved per :func:`_zvalue_expr`.

    Exposed separately so audit/certification paths can recompute the
    exact z a layout pass used (the stats are data-derived, so the
    same content yields the same expression)."""
    from pyspark.sql import functions as F

    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 keys; use cluster_by for 1")
    if bits * len(cols) > 63:
        # The top interleaved bit would land on (or past) the bigint
        # sign bit, flipping z negative for half the rows and INVERTING
        # their sort order — silent clustering corruption. Either lower
        # bits or pass fewer keys (63 // len(cols) is the max grid).
        raise ValueError(
            f"bits * len(cols) = {bits * len(cols)} exceeds 63 (bigint "
            f"sign bit); use bits <= {63 // len(cols)} for {len(cols)} keys"
        )
    stats = df.agg(
        *[F.min(c).cast("bigint").alias(f"mn{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("bigint").alias(f"mx{i}") for i, c in enumerate(cols)],
    ).first()
    top = (1 << bits) - 1
    scaled = []
    for i, c in enumerate(cols):
        mn, mx = stats[f"mn{i}"], stats[f"mx{i}"]
        span = max(1, mx - mn)
        if span > (2**63 - 1) // top:
            # (c - mn) * top would wrap bigint before the div — the
            # scaled key becomes garbage silently. Pre-shrink huge-span
            # keys (epoch-micros etc.) before z-ordering.
            raise ValueError(
                f"key {c!r} span {span} overflows the {bits}-bit scale "
                f"(max span {(2**63 - 1) // top}); bucket the key first"
            )
        scaled.append(f"(((CAST({c} AS BIGINT) - {mn}) * {top}) div {span})")
    return _zvalue_expr(scaled, bits)


def zorder_bucket_by(
    df,
    out_path: str,
    cols: list[str],
    n_buckets: int = 4,
    bits: int = 16,
) -> int:
    """Z-order into STATIC equal-width z-grid buckets: rows land in
    bucket ``z >> (bits * len(cols) - log2(n_buckets))`` (the top z
    bits), written as one compacted file per bucket directory
    (``_zbucket=<b>/``).

    vs :func:`zorder_by`: that one range-partitions on SAMPLED z
    boundaries — equal-size files, but boundaries depend on the sample,
    so the exact file assignment is not reproducible from the data
    alone. Equal-WIDTH buckets trade balanced file sizes for a fully
    deterministic, math-derivable layout (Iceberg's truncate-transform
    applied to the z value): every row's bucket is a pure function of
    the data, so an external auditor can recompute per-file counts and
    min/max pruning stats exactly — the property the catalog's
    ``layout_zorder_audit`` entry hash-certifies. Skewed key spaces
    prefer :func:`zorder_by`; certification and static-partition-layout
    pipelines prefer this.

    Returns ``shift`` — the right-shift mapping a z value to its
    bucket id (``z >> shift``), for auditors recomputing the layout.
    """
    from pyspark.sql import functions as F

    if n_buckets < 2 or n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two >= 2")
    shift = bits * len(cols) - n_buckets.bit_length() + 1
    z = zorder_z_expr(df, cols, bits)
    (
        df.withColumn("_zbucket", F.expr(f"shiftright({z}, {shift})"))
        # repartition by the bucket key: every bucket's rows land in ONE
        # task -> exactly one compacted file per bucket directory
        .repartition(n_buckets, "_zbucket")
        .sortWithinPartitions("_zbucket")
        .write.mode("overwrite")
        .partitionBy("_zbucket")
        .parquet(out_path)
    )
    return shift
