"""Golden tests for the temporal join operators (operators.temporal).

Tiny literal frames with hand-computed expected outputs: as-of
direction/tie/tolerance behavior and range-join boundary inclusion —
the semantics DuckDB parity alone can't pin down (the catalog queries
exercise only backward/left-closed).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.operators.temporal import asof_join, range_join


def _t(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, 0)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, _t(10), "a"), (1, _t(30), "b"), (2, _t(20), "c"), (3, _t(5), "d")],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _t(10), 100.0), (1, _t(25), 200.0), (2, _t(21), 300.0)],
        "k int, rts timestamp, rv double",
    )
    return left, right


def _rows(df):
    return {
        tuple(r[c] for c in ("k", "lv"))[0:2]: (r["r_rts"], r["r_rv"])
        for r in df.collect()
    }


class TestAsofJoin:
    def test_backward_matches_latest_at_or_before(self, frames):
        left, right = frames
        out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
        got = _rows(out)
        assert got[(1, "a")] == (_t(10), 100.0)  # equality matches
        assert got[(1, "b")] == (_t(25), 200.0)  # latest of two earlier
        assert got[(2, "c")] == (None, None)  # right is later -> no match
        assert got[(3, "d")] == (None, None)  # key absent on right

    def test_forward_matches_earliest_at_or_after(self, frames):
        left, right = frames
        out = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", direction="forward"
        )
        got = _rows(out)
        assert got[(1, "a")] == (_t(10), 100.0)
        assert got[(1, "b")] == (None, None)
        assert got[(2, "c")] == (_t(21), 300.0)

    def test_tolerance_nulls_stale_matches(self, frames):
        left, right = frames
        out = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            tolerance_seconds=120,
        )
        got = _rows(out)
        assert got[(1, "a")] == (_t(10), 100.0)  # gap 0 <= 120s
        assert got[(1, "b")] == (None, None)  # gap 300s > 120s
        # left row count is preserved either way
        assert out.count() == left.count()

    def test_preserves_all_left_rows_and_columns(self, frames):
        left, right = frames
        out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
        assert out.count() == left.count()
        assert set(out.columns) == {"k", "ts", "lv", "r_rts", "r_rv"}

    def test_bad_direction_raises(self, frames):
        left, right = frames
        with pytest.raises(ValueError, match="direction"):
            asof_join(left, right, on="k", direction="nearest")


class TestRangeJoin:
    @pytest.fixture(scope="class")
    def pts_ivs(self, spark):
        pts = spark.createDataFrame(
            [(1, _t(0), "p0"), (1, _t(10), "p10"), (1, _t(20), "p20"),
             (2, _t(10), "q10")],
            "k int, pts timestamp, pid string",
        )
        ivs = spark.createDataFrame(
            [(1, _t(0), _t(20), "iv1"), (2, _t(50), _t(59), "iv2")],
            "k int, lo timestamp, hi timestamp, ivid string",
        )
        return pts, ivs

    def test_left_closed_excludes_upper(self, pts_ivs):
        pts, ivs = pts_ivs
        out = range_join(
            pts, ivs, on="k", point_ts="pts", lower_ts="lo", upper_ts="hi",
            bucket_width_seconds=300, closed="left",
        )
        assert sorted(r["pid"] for r in out.collect()) == ["p0", "p10"]

    def test_both_closed_includes_upper(self, pts_ivs):
        pts, ivs = pts_ivs
        out = range_join(
            pts, ivs, on="k", point_ts="pts", lower_ts="lo", upper_ts="hi",
            bucket_width_seconds=300, closed="both",
        )
        assert sorted(r["pid"] for r in out.collect()) == ["p0", "p10", "p20"]

    def test_right_closed_excludes_lower(self, pts_ivs):
        pts, ivs = pts_ivs
        out = range_join(
            pts, ivs, on="k", point_ts="pts", lower_ts="lo", upper_ts="hi",
            bucket_width_seconds=300, closed="right",
        )
        assert sorted(r["pid"] for r in out.collect()) == ["p10", "p20"]

    def test_bucket_width_is_semantics_free(self, pts_ivs):
        pts, ivs = pts_ivs
        outs = [
            sorted(
                r["pid"]
                for r in range_join(
                    pts, ivs, on="k", point_ts="pts", lower_ts="lo",
                    upper_ts="hi", bucket_width_seconds=w,
                ).collect()
            )
            for w in (60, 600, 7200)
        ]
        assert outs[0] == outs[1] == outs[2]

    def test_column_collision_raises(self, spark, pts_ivs):
        pts, ivs = pts_ivs
        with pytest.raises(ValueError, match="collision"):
            range_join(
                pts.withColumn("ivid", F.lit("x")), ivs, on="k",
                point_ts="pts", lower_ts="lo", upper_ts="hi",
            )
