"""Incremental-processing primitives (reference A1/A2/P2/P6).

The reference's incrementality is batch micro-catchup: watermark = max
landed date (``extract.py:172-174``, ``transform.py:177-181``), new
dates = set difference against the warehouse (``transform.py:183-190``),
rows filtered to a half-open range during the raw read
(``load.py:286-288``). Each maps to one aggregate or one anti-join —
Catalyst pushes the resulting predicates into the scan, which at 100 TB
means partition pruning does the skipping, not Python.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def max_watermark(
    df: DataFrame, col: str = "day", default: dt.date | None = None
) -> dt.date | None:
    """A1: ``max(col)`` with an empty-input default (driver-side scalar).

    This is the one place a value legitimately reaches the driver — it
    parameterizes the *next* scan's pruning predicate.
    """
    row = df.agg(F.max(col).alias("wm")).first()
    wm = row["wm"]
    return default if wm is None else wm


def min_new_date(df: DataFrame, col: str = "day"):
    """A2: earliest pending date (driver-side scalar for range start)."""
    return df.agg(F.min(col).alias("mn")).first()["mn"]


def half_open_range(col: str, start, end) -> Column:
    """P2: ``start <= col < end`` predicate (pushdown-friendly)."""
    return (F.col(col) >= F.lit(start)) & (F.col(col) < F.lit(end))


def new_keys(raw: DataFrame, existing: DataFrame, key: str = "day") -> DataFrame:
    """P6: keys in ``raw`` not yet in ``existing`` — a left anti-join.

    At scale the ``existing`` side is usually a distinct-key projection
    of the warehouse; Catalyst/AQE will broadcast it when small.
    """
    return raw.select(key).distinct().join(
        existing.select(key).distinct(), on=key, how="left_anti"
    )


def filter_after_watermark(df: DataFrame, watermark, col: str = "day") -> DataFrame:
    """Keep rows strictly newer than the watermark (late data dropped —
    the reference's semantics, SURVEY.md §2.8)."""
    return df.where(F.col(col) > F.lit(watermark))
