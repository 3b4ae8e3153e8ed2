"""Temporal joins Spark lacks as built-ins: as-of join, banded range join.

The reference repo has no temporal joins (its only join key is ``day``,
`composer_dags/dags/utils/data_sources/oura/etl/transform.py:130-140`);
these are part of the engine's extended surface for event/time-series
analytics, built as *compositions of shuffle-friendly DataFrame ops* —
no Cartesian products, no broadcast requirement on either side, no UDFs.

Scale design:

* ``asof_join`` is ONE hash shuffle of ``left ∪ right`` on the join
  keys followed by a window scan — the same cost profile as a
  sort-merge join. Both sides may be arbitrarily large; skew is bounded
  by the per-key row count exactly like any keyed window.
* ``range_join`` buckets time so the non-equi band predicate becomes an
  equi-join on ``(keys..., bucket)`` with a cheap residual filter.
  Intervals explode into ``span / bucket_width + 1`` rows — callers
  pick ``bucket_width`` on the order of the typical band width so the
  blow-up is ~2x, not the O(|L| x |R|) a naive inequality join costs
  (Spark would otherwise plan BroadcastNestedLoopJoin).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_PAYLOAD = "__asof_right"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: attach to each left row the nearest right row.

    ``backward`` (default) matches the latest right row with
    ``right_ts <= left_ts``; ``forward`` matches the earliest right row
    with ``right_ts >= left_ts``. Unmatched left rows keep NULL right
    columns (left-join semantics). ``tolerance_seconds`` nulls the
    match when the timestamp gap exceeds it.

    Implementation: tag and union both sides, partition by the keys,
    sort by time with right rows ordered *before* left rows at equal
    timestamps (so equality matches), and carry the last non-null right
    payload forward with an unbounded-preceding window. If several
    right rows share (keys, ts) the one latest in sort order wins —
    pre-aggregate the right side when that matters.

    Right columns come back prefixed with ``right_prefix``; key columns
    are not duplicated.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = [c for c in right.columns if c not in keys]

    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).cast("timestamp").alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left.columns if c not in keys],
        F.lit(None)
        .cast(right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType)
        .alias(_PAYLOAD),
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).cast("timestamp").alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in left.columns if c not in keys],
        F.struct(*right_cols).alias(_PAYLOAD),
    )
    unioned = l_tagged.unionByName(r_tagged)

    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    ).where(F.col(_SIDE) == 1)

    if tolerance_seconds is not None:
        gap = F.abs(
            F.col(_TS).cast("double")
            - F.col(f"{_PAYLOAD}.{right_ts}").cast("double")
        )
        matched = matched.withColumn(
            _PAYLOAD,
            F.when(gap <= F.lit(float(tolerance_seconds)), F.col(_PAYLOAD)),
        )

    out_left = [c for c in left.columns if c not in keys]
    return matched.select(
        *keys,
        *[F.col(c) for c in out_left],
        *[
            F.col(f"{_PAYLOAD}.{c}").alias(f"{right_prefix}{c}")
            for c in right_cols
        ],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str] | str,
    point_ts: str,
    lower_ts: str,
    upper_ts: str,
    bucket_width_seconds: int = 3600,
    closed: str = "left",
) -> DataFrame:
    """Inner join points into keyed time intervals without a BNLJ.

    Matches each interval row with every point row of the same keys
    whose ``point_ts`` falls in ``[lower_ts, upper_ts)`` (``closed=
    "left"``, default), ``(lower, upper]`` (``"right"``), or
    ``[lower, upper]`` (``"both"``).

    Each interval is exploded to the epoch buckets it covers
    (``sequence(floor(lower/w), floor(upper/w))``); points map to one
    bucket; the join is then a plain equi-join on (keys..., bucket)
    that Catalyst shuffles hash-partitioned, and the exact band
    predicate runs as a residual filter. Output columns = interval
    columns + point columns (callers aggregate as needed).
    """
    if closed not in ("left", "right", "both"):
        raise ValueError(f"closed must be left|right|both, got {closed!r}")
    keys = [on] if isinstance(on, str) else list(on)
    w = int(bucket_width_seconds)
    bucket = "__range_bucket"

    p_sec = F.col(point_ts).cast("double")
    lo_sec = F.col(lower_ts).cast("double")
    hi_sec = F.col(upper_ts).cast("double")

    pts = points.withColumn(bucket, F.floor(p_sec / w))
    ivs = intervals.withColumn(
        bucket,
        F.explode(F.sequence(F.floor(lo_sec / w), F.floor(hi_sec / w))),
    )

    lo_pred = p_sec >= lo_sec if closed in ("left", "both") else p_sec > lo_sec
    hi_pred = p_sec <= hi_sec if closed in ("right", "both") else p_sec < hi_sec

    overlap = [c for c in pts.columns if c in ivs.columns and c not in keys + [bucket]]
    if overlap:
        raise ValueError(
            f"column collision between points and intervals: {overlap}; "
            "rename before joining"
        )
    return (
        ivs.join(pts, keys + [bucket])
        .where(lo_pred & hi_pred)
        .drop(bucket)
    )
