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
    # Σx² and the variance numerator run in DECIMAL(38,0), not bigint:
    # the r11 cross-sf parity sweep caught the bigint envelope breaking
    # at sf0.1 (daily rev_c ~1.2e9 cents -> Σx² ~9.8e18 and (Σx)²
    # ~7e19, both past int64's 9.2e18 — invisible at the sf0.01 gate,
    # the w10 overflow lesson again). DECIMAL(38,0) holds ~1e38: safe
    # past sf100 (n·Σx² ~7e23 at 1.2e11 cents/day). The DuckDB oracle
    # mirrors with HUGEINT; both engines cast the SAME exact integer
    # to double once, so the results stay bit-identical.
    xd = x.cast("decimal(38,0)")
    s2 = F.sum(xd * xd).over(w)
    n = F.count(x).over(w)
    mean_c = s1.cast("double") / n.cast("double")
    var_c2 = (
        (n.cast("decimal(38,0)") * s2 - s1.cast("decimal(38,0)") * s1.cast("decimal(38,0)"))
        .cast("double")
        / (n * n).cast("double")
    )
    std_c = F.sqrt(var_c2)
    z = F.when(std_c > 0, (x.cast("double") - mean_c) / std_c)

    # 6-decimal rounding via floor(x*1e6 + 0.5)/1e6, NOT round(x, 6):
    # at sf1 roll_std reaches ~2e7 dollars, where 6 decimals is the
    # 16th significant digit and the engines' ROUND implementations
    # (Spark BigDecimal half-up on the decimal expansion vs DuckDB
    # multiply-rint) disagree on boundary doubles (r11 sf1 probe:
    # 19959081.769943 vs ...944). floor is method-free: multiply and
    # add are correctly-rounded IEEE ops on bit-identical inputs
    # (x*1e6 ~ 2e13 < 2^53), so both engines floor the SAME double.
    def _r6(c):
        return F.floor(c * F.lit(1_000_000.0) + F.lit(0.5)).cast(
            "double"
        ) / F.lit(1_000_000.0)

    out = [
        _r6(mean_c / 100.0).alias("roll_mean"),
        _r6(std_c / 100.0).alias("roll_std"),
        _r6(z).alias("z"),
        F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
    ]
    return df.select(*df.columns, *out)
