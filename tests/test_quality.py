"""Expectation reports and blocked fuzzy matching (operators/quality.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.operators.quality import (
    blocked_fuzzy_join,
    expectations_report,
)


class TestExpectations:
    def _df(self, spark):
        rows = [(1, 10.0, "A"), (2, -5.0, "B"), (3, None, "A"), (4, 7.0, "Z")]
        return spark.createDataFrame(rows, "id bigint, v double, cat string")

    def test_counts_and_rates(self, spark):
        out = {
            r.rule: (r.n_rows, r.n_violations, r.violation_rate, r.passed)
            for r in expectations_report(
                self._df(spark),
                {
                    "v_positive": F.col("v") > 0,       # -5 and NULL violate
                    "cat_in_domain": F.col("cat").isin("A", "B"),
                    "id_not_null": F.col("id").isNotNull(),
                },
            ).collect()
        }
        assert out["v_positive"] == (4, 2, 0.5, False)
        assert out["cat_in_domain"] == (4, 1, 0.25, False)
        assert out["id_not_null"] == (4, 0, 0.0, True)

    def test_null_expectation_counts_as_violation(self, spark):
        [r] = expectations_report(
            self._df(spark).where("id = 3"), {"v_positive": F.col("v") > 0}
        ).collect()
        assert (r.n_violations, r.passed) == (1, False)

    def test_single_pass_plan(self, spark):
        """All rules must fold into ONE aggregation of one scan — no
        join, no second aggregate over the base data."""
        df = self._df(spark)
        out = expectations_report(
            df, {f"r{i}": F.col("v") > i for i in range(20)}
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        # one partial + one final HashAggregate pair
        assert plan.count("HashAggregate") <= 2

    def test_empty_rules_rejected(self, spark):
        with pytest.raises(ValueError):
            expectations_report(self._df(spark), {})


class TestBlockedFuzzyJoin:
    def _sides(self, spark):
        left = spark.createDataFrame(
            [(1, "red widget", "red"), (2, "blue bolt", "blue")],
            "k bigint, name string, blk string",
        )
        right = spark.createDataFrame(
            [(10, "red wdget", "red"), (20, "blue jet", "blue"),
             (30, "red widget", "green")],   # right string, WRONG block
            "k bigint, name string, blk string",
        )
        return left, right

    def test_typo_recovered_within_block(self, spark):
        left, right = self._sides(spark)
        got = {
            (r["l.k"], r["r.k"], r.lev_distance)
            for r in blocked_fuzzy_join(
                left.alias("l"), right.alias("r"), "blk", "name", "name"
            ).select(F.col("l.k").alias("l.k"), F.col("r.k").alias("r.k"),
                     "lev_distance").collect()
        }
        assert (1, 10, 1) in got          # one deleted char
        assert all(p[1] != 20 for p in got)  # 'blue jet' is 3 edits away
        # blocking is authoritative: the identical string in another
        # block is never even compared
        assert all(p[1] != 30 for p in got)


class TestDq4HllProfile:
    def test_estimates_track_exact_ndv(self, spark):
        """The HLL profile must land within the sketch's error band of
        dq2-style exact counts for every profiled column (events at
        sf0.01 — enough cardinality for the sketch regime)."""
        from pyspark.sql import functions as F

        from personal_health_etl_pipeline_spark.plans.quality_surface import (
            DQ4_COLS,
            dq4_column_profile_hll,
        )
        from personal_health_etl_pipeline_spark.sources.tables import load_table

        sf = "/root/testdata/sf0.01"
        got = {r.col_name: r for r in dq4_column_profile_hll(spark, sf).collect()}
        events = load_table(spark, sf, "events")
        exact = events.agg(
            *[F.countDistinct(c).alias(c) for c in DQ4_COLS],
            F.count(F.lit(1)).alias("_n"),
        ).first()
        assert set(got) == set(DQ4_COLS)
        for c in DQ4_COLS:
            assert got[c].n_rows == exact["_n"]
            assert abs(got[c].est_ndv - exact[c]) / exact[c] < 0.15, (
                c, got[c].est_ndv, exact[c],
            )
