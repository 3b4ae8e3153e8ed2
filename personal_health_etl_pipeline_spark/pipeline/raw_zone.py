"""Raw zone: range-partitioned landing area with pruned scans.

The reference lands every API response as one JSON blob under a
range-encoded GCS path ``raw/oura/{type}/{start}_{end}/data.json`` and
prunes scans by *parsing dates out of paths* in driver Python
(reference ``constants.py:55``, ``load.py:243-270``,
``common_utils.py:34-83``). The Spark-native layout makes the range a
pair of Hive partition columns instead::

    {root}/data_type=daily_sleep/range_start=2024-01-01/range_end=2024-01-07/

so the same pruning is a Catalyst partition-filter — the path math the
reference hand-rolls is exactly what ``PartitionFilters`` does against
a partitioned file index, and it keeps working at 100 TB where listing
every blob in the driver would not.

Files are JSON to mirror the raw-zone format (S5); the scan declares
the record schema up front (no inference pass — one listing, no data
read before the query). Empty extractions still write a partition
directory (a ``_SUCCESS`` marker only) to mark the range as processed,
matching ``extract.py:187-193``.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_PART_RE = re.compile(
    r"data_type=(?P<dtype>[^/]+)/range_start=(?P<start>\d{4}-\d{2}-\d{2})/"
    r"range_end=(?P<end>\d{4}-\d{2}-\d{2})$"
)


class OverlappingRangeError(ValueError):
    """Two landed ranges for one data type overlap (common_utils.py:60-67)."""


def _partition_path(root: str, data_type: str, start: dt.date, end: dt.date) -> str:
    return (
        f"{root}/data_type={data_type}/range_start={start.isoformat()}"
        f"/range_end={end.isoformat()}"
    )


def write_raw(
    df: DataFrame, root: str, data_type: str, start: dt.date, end: dt.date
) -> str:
    """S5: land one extracted range. Empty frames still create the
    partition (processed-marker semantics)."""
    path = _partition_path(root, data_type, start, end)
    df.write.mode("overwrite").json(path)
    return path


def landed_ranges(root: str, data_type: str) -> list[tuple[dt.date, dt.date]]:
    """Discover landed (start, end) ranges for a data type, sorted;
    overlapping ranges are a hard error (reference invariant).

    Driver-side directory listing of *partition directories only* (no
    data files touched) — the streaming-scale equivalent is the
    metastore/manifest listing every table format already maintains.
    """
    pattern = f"{root}/data_type={data_type}/range_start=*/range_end=*"
    ranges: list[tuple[dt.date, dt.date]] = []
    for path in glob.glob(pattern):
        m = _PART_RE.search(path)
        if not m or m.group("dtype") != data_type:
            raise ValueError(f"malformed raw-zone partition path: {path}")
        ranges.append(
            (dt.date.fromisoformat(m.group("start")), dt.date.fromisoformat(m.group("end")))
        )
    ranges.sort()
    for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
        if s2 <= e1:
            raise OverlappingRangeError(
                f"{data_type}: range {s2}..{e2} overlaps {s1}..{e1}"
            )
    return ranges


def max_landed_date(root: str, data_type: str) -> dt.date | None:
    """A1 over the raw zone: latest landed range end (None if nothing)."""
    ranges = landed_ranges(root, data_type)
    return ranges[-1][1] if ranges else None


def scan_raw(
    spark: SparkSession,
    root: str,
    data_type: str,
    start: dt.date,
    end: dt.date,
    schema: StructType,
) -> DataFrame:
    """S6 + P2: read every landed range overlapping ``[start, end)``.

    The overlap predicate runs on partition columns (pruned before any
    file is opened); the half-open day filter then drops out-of-range
    rows *inside* kept ranges, mirroring ``load.py:286-288``.
    """
    type_root = f"{root}/data_type={data_type}"
    if not os.path.isdir(type_root):
        return spark.createDataFrame([], schema)
    df = (
        spark.read.schema(schema)
        .option("basePath", root)
        .json(f"{root}/data_type={data_type}/range_start=*/range_end=*")
    )
    # ISO date strings compare lexicographically == chronologically, so
    # the predicates work whether partition values were inferred as
    # dates or strings, and whether `day` is a wire string or a date
    overlap = (F.col("range_end").cast("string") >= F.lit(start.isoformat())) & (
        F.col("range_start").cast("string") < F.lit(end.isoformat())
    )
    in_range = (F.col("day").cast("string") >= F.lit(start.isoformat())) & (
        F.col("day").cast("string") < F.lit(end.isoformat())
    )
    return (
        df.where(overlap & in_range)
        .drop("data_type", "range_start", "range_end")
    )
