"""Time-series maintenance: calendar resampling with forward fill, and
rolling z-score anomaly flagging.

The reference's analytics are daily snapshots keyed by date with gaps
wherever the wearable was off (``transform.py`` emits one row per
present day and nothing else); downstream consumers (dashboards, model
features) need a dense calendar. These are the two canonical repairs:

* ``resample_daily_ffill`` — per-key dense daily calendar between each
  key's first and last observation, missing days carried forward
  (``last(..., ignorenulls=True)`` running window). The calendar is
  generated with ``sequence``+``explode`` (JVM-side, no driver range
  loop) and joined back on (key, day) — the join and the fill window
  share one hash-partitioning by key, so the whole repair is one
  shuffle of the aggregated days plus a map-side explode.
* ``rolling_zscore`` — rolling mean/std over the trailing ``window``
  rows and a z-score flag per row. All moments accumulate as exact
  integer cents (bigint Σx, Σx² — see ``plans/exact.py`` for the
  overflow envelope); doubles appear only in the final mean/std/z
  division, so Spark and a serial oracle produce bit-identical output.

Scale notes (100 TB): both operators partition by the series key and
never collect; the z-score is a single window pass. For one GLOBAL
series (no key), the window degenerates to one partition — that is
inherent to the semantics (2399 rows here), not a missed optimization:
shard by key for per-entity series.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_daily_ffill(
    df: DataFrame,
    key: str,
    ts_col: str,
    value: Column,
    out_value: str = "day_value",
) -> DataFrame:
    """Dense per-``key`` daily series with forward-filled gaps.

    ``value`` is the per-(key, day) aggregate expression (must be
    order-independent; use the exact-decimal recipes). Output columns:
    ``key``, ``day``, ``out_value`` (observed or carried), ``is_gap``.
    The first day of each key is always observed (the calendar starts
    at the key's own min), so the fill never emits NULL.
    """
    daily = (
        df.select(F.col(key), F.col(ts_col).cast("date").alias("day"), value.alias("_v"))
        .groupBy(key, "day")
        .agg(F.sum("_v").alias("_v"))
    )
    cal = (
        daily.groupBy(key)
        .agg(F.min("day").alias("_d0"), F.max("day").alias("_d1"))
        .select(
            key, F.explode(F.sequence("_d0", "_d1")).alias("day")
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cal.join(daily, on=[key, "day"], how="left")
        .select(
            key,
            "day",
            F.last("_v", ignorenulls=True).over(w).alias(out_value),
            F.col("_v").isNull().alias("is_gap"),
        )
    )


def rolling_zscore(
    df: DataFrame,
    order_col: str,
    cents_col: str,
    window: int = 7,
    key: str | None = None,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Trailing-``window`` rolling mean/std and z-score per row.

    ``cents_col`` must be an exact bigint (integer cents). Emits
    ``roll_mean`` / ``roll_std`` (dollars, double), ``z`` (NULL when
    the window variance is zero or the window has one row), and
    ``is_anomaly``. All window sums are bigint — bit-exact vs a serial
    oracle; doubles enter only in the final divisions.
    """
    part = Window.partitionBy(key) if key else Window.partitionBy()
    w = part.orderBy(order_col).rowsBetween(-(window - 1), 0)
    x = F.col(cents_col)
    s1 = F.sum(x).over(w)
    s2 = F.sum(x * x).over(w)
    n = F.count(x).over(w)
    mean_c = s1.cast("double") / n.cast("double")
    # n*Σx² − (Σx)² is an exact bigint (see module docstring envelope)
    var_c2 = (n * s2 - s1 * s1).cast("double") / (n * n).cast("double")
    std_c = F.sqrt(var_c2)
    z = F.when(std_c > 0, (x.cast("double") - mean_c) / std_c)
    out = [
        F.round(mean_c / 100.0, 6).alias("roll_mean"),
        F.round(std_c / 100.0, 6).alias("roll_std"),
        F.round(z, 6).alias("z"),
        F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
    ]
    return df.select(*df.columns, *out)
