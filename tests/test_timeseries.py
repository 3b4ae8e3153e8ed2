"""Gap-fill resampling and rolling z-score (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.operators.timeseries import (
    resample_daily_ffill,
    rolling_zscore,
)

D = dt.date
T = dt.datetime


class TestResampleFfill:
    def _events(self, spark):
        rows = [
            (1, T(2024, 1, 1, 9), 100),
            (1, T(2024, 1, 1, 12), 50),   # same day, summed
            (1, T(2024, 1, 4, 9), 700),    # 2-day gap before this
            (2, T(2024, 1, 2, 9), 20),     # single-day key
        ]
        return spark.createDataFrame(rows, "user_id bigint, ts timestamp, v bigint")

    def test_dense_calendar_and_carry(self, spark):
        out = resample_daily_ffill(
            self._events(spark), key="user_id", ts_col="ts", value=F.col("v")
        )
        got = {(r.user_id, r.day): (r.day_value, r.is_gap) for r in out.collect()}
        assert got == {
            (1, D(2024, 1, 1)): (150, False),
            (1, D(2024, 1, 2)): (150, True),   # carried forward
            (1, D(2024, 1, 3)): (150, True),
            (1, D(2024, 1, 4)): (700, False),
            (2, D(2024, 1, 2)): (20, False),
        }

    def test_no_nulls_ever(self, spark):
        out = resample_daily_ffill(
            self._events(spark), key="user_id", ts_col="ts", value=F.col("v")
        )
        assert out.filter(F.col("day_value").isNull()).count() == 0


class TestRollingZscore:
    def _series(self, spark, vals):
        rows = [(D(2024, 1, 1) + dt.timedelta(days=i), v) for i, v in enumerate(vals)]
        return spark.createDataFrame(rows, "day date, c bigint")

    def test_constant_series_never_anomalous(self, spark):
        out = rolling_zscore(
            self._series(spark, [100] * 10), order_col="day", cents_col="c"
        ).collect()
        assert all(r.z is None for r in out)          # zero variance -> NULL
        assert all(r.is_anomaly is False for r in out)

    def test_spike_is_flagged(self, spark):
        vals = [100, 101, 99, 100, 101, 99, 100, 100000]
        out = rolling_zscore(
            self._series(spark, vals), order_col="day", cents_col="c"
        ).orderBy("day").collect()
        assert out[-1].is_anomaly is True
        assert all(r.is_anomaly is False for r in out[:-1])

    def test_moments_match_serial_math(self, spark):
        vals = [120, 80, 100, 90, 110, 130, 70, 95, 105]
        out = rolling_zscore(
            self._series(spark, vals), order_col="day", cents_col="c", window=3
        ).orderBy("day").collect()
        for i, r in enumerate(out):
            win = vals[max(0, i - 2): i + 1]
            n = len(win)
            mean = sum(win) / n
            var = (n * sum(v * v for v in win) - sum(win) ** 2) / (n * n)
            assert r.roll_mean == round(mean / 100.0, 6)
            assert r.roll_std == round(math.sqrt(var) / 100.0, 6)
            if math.sqrt(var) > 0:
                assert r.z == round((vals[i] - mean) / math.sqrt(var), 6)

    def test_keyed_series_are_isolated(self, spark):
        rows = [
            ("a", D(2024, 1, 1), 100), ("a", D(2024, 1, 2), 200),
            ("b", D(2024, 1, 1), 1), ("b", D(2024, 1, 2), 2),
        ]
        df = spark.createDataFrame(rows, "k string, day date, c bigint")
        out = rolling_zscore(df, order_col="day", cents_col="c", key="k").collect()
        by = {(r.k, r.day): r.roll_mean for r in out}
        assert by[("a", D(2024, 1, 2))] == round(150 / 100.0, 6)
        assert by[("b", D(2024, 1, 2))] == round(1.5 / 100.0, 6)


def test_ts5_ewma_hand_computed(spark, sf_dir):
    """EWMA with decay 1/2: [100, 200, 400] cents -> last row
    (100/4 + 200/2 + 400) / (1 + 1/2 + 1/4)."""
    from personal_health_etl_pipeline_spark.plans.temporal_surface import (
        ewma_events,
    )
    import datetime as dt
    import tempfile

    root = tempfile.mkdtemp(prefix="ts5_")
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), 7, "view", v, "{}")
        for i, v in ((0, 1.00), (1, 2.00), (2, 4.00))
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{root}/events.parquet")
    # full operator form — event_ids 1 and 2 fall outside the certified
    # entry's 1-in-7 slice
    got = {r.event_id: r for r in ewma_events(spark, root).collect()}
    assert got[0].n_obs == 1 and got[0].ewma_cents == 100.0
    assert got[1].ewma_cents == (100 / 2 + 200) / 1.5
    assert got[2].ewma_cents == (100 / 4 + 200 / 2 + 400) / 1.75
