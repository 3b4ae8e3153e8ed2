"""SCD-2 merge and snapshot-diff semantics (operators/merge.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from personal_health_etl_pipeline_spark.operators.merge import (
    scd2_merge,
    snapshot_diff,
)

D = dt.date


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "cust_id bigint, bal double, valid_from date, valid_to date, is_current boolean"
    )


def _upd(spark, rows):
    return spark.createDataFrame(rows, "cust_id bigint, bal double, eff_date date")


class TestScd2Merge:
    def test_all_merge_classes(self, spark):
        dim = _dim(
            spark,
            [
                # closed history row: must pass through untouched
                (1, 10.0, D(2020, 1, 1), D(2021, 1, 1), False),
                (1, 11.0, D(2021, 1, 1), None, True),   # will change
                (2, 20.0, D(2020, 1, 1), None, True),   # update equal -> no-op
                (3, 30.0, D(2020, 1, 1), None, True),   # no update -> untouched
            ],
        )
        upd = _upd(
            spark,
            [
                (1, 12.0, D(2022, 6, 1)),
                (2, 20.0, D(2022, 6, 1)),  # identical payload
                (4, 40.0, D(2022, 6, 1)),  # brand-new key
            ],
        )
        out = scd2_merge(dim, upd, key="cust_id", attrs=["bal"])
        rows = {(r.cust_id, r.bal, r.valid_from, r.valid_to, r.is_current)
                for r in out.collect()}
        assert rows == {
            (1, 10.0, D(2020, 1, 1), D(2021, 1, 1), False),   # history
            (1, 11.0, D(2021, 1, 1), D(2022, 6, 1), False),   # closed
            (1, 12.0, D(2022, 6, 1), None, True),             # reopened
            (2, 20.0, D(2020, 1, 1), None, True),             # no-op
            (3, 30.0, D(2020, 1, 1), None, True),             # untouched
            (4, 40.0, D(2022, 6, 1), None, True),             # insert
        }

    def test_idempotent_redelivery(self, spark):
        """Applying the same batch twice changes nothing the second time."""
        dim = _dim(spark, [(1, 1.0, D(2020, 1, 1), None, True)])
        upd = _upd(spark, [(1, 2.0, D(2021, 1, 1))])
        once = scd2_merge(dim, upd, key="cust_id", attrs=["bal"])
        twice = scd2_merge(once, upd, key="cust_id", attrs=["bal"])
        assert sorted(once.collect()) == sorted(twice.collect())

    def test_null_safe_attr_compare(self, spark):
        """NULL -> value and value -> NULL both count as changes; NULL ->
        NULL does not (eqNullSafe contract)."""
        dim = _dim(
            spark,
            [
                (1, None, D(2020, 1, 1), None, True),
                (2, 5.0, D(2020, 1, 1), None, True),
                (3, None, D(2020, 1, 1), None, True),
            ],
        )
        upd = _upd(
            spark,
            [(1, 7.0, D(2021, 1, 1)), (2, None, D(2021, 1, 1)), (3, None, D(2021, 1, 1))],
        )
        out = scd2_merge(dim, upd, key="cust_id", attrs=["bal"]).collect()
        opened = {r.cust_id for r in out if r.is_current and r.valid_from == D(2021, 1, 1)}
        assert opened == {1, 2}  # key 3 is NULL->NULL: no new row


class TestSnapshotDiff:
    def _snap(self, spark, rows):
        return spark.createDataFrame(rows, "k bigint, v string, n double")

    def test_classes_and_suppression(self, spark):
        old = self._snap(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None)])
        new = self._snap(spark, [(2, "b", 2.5), (3, "c", None), (4, "d", 4.0)])
        out = snapshot_diff(old, new, key="k", compare=["v", "n"])
        got = {(r.k, r.change_type) for r in out.collect()}
        # 3 is identical (NULL-safe) -> suppressed
        assert got == {(1, "removed"), (2, "changed"), (4, "added")}

    def test_payload_columns(self, spark):
        old = self._snap(spark, [(1, "a", 1.0)])
        new = self._snap(spark, [(1, "a", 9.0)])
        [r] = snapshot_diff(old, new, key="k", compare=["v", "n"]).collect()
        assert (r.old_n, r.new_n, r.old_v, r.new_v) == (1.0, 9.0, "a", "a")

    def test_empty_delta(self, spark):
        old = self._snap(spark, [(1, "a", 1.0)])
        assert snapshot_diff(old, old, key="k", compare=["v", "n"]).count() == 0


class TestScd2MergeCdc:
    """scd2_merge_cdc: delete tombstones + rebirth across batches."""

    def _dim(self, spark):
        import datetime as dt

        return spark.createDataFrame(
            [
                (1, 10.0, dt.date(2024, 1, 1), None, True),
                (2, 20.0, dt.date(2024, 1, 1), None, True),
            ],
            "cust_id bigint, bal double, valid_from date, valid_to date,"
            " is_current boolean",
        )

    def _upd(self, spark, rows):
        return spark.createDataFrame(
            rows, "cust_id bigint, bal double, eff_date date, op string"
        )

    def test_delete_closes_without_successor(self, spark):
        import datetime as dt

        from personal_health_etl_pipeline_spark.operators.merge import (
            scd2_merge_cdc,
        )

        upd = self._upd(
            spark, [(1, None, dt.date(2024, 2, 1), "delete")]
        )
        out = {
            (r.cust_id, r.is_current): r
            for r in scd2_merge_cdc(
                self._dim(spark), upd, key="cust_id", attrs=["bal"]
            ).collect()
        }
        closed = out[(1, False)]
        assert closed.valid_to == dt.date(2024, 2, 1)
        assert (1, True) not in out  # no successor row
        assert out[(2, True)].valid_to is None  # untouched

    def test_tombstone_then_rebirth(self, spark):
        import datetime as dt

        from personal_health_etl_pipeline_spark.operators.merge import (
            scd2_merge_cdc,
        )

        b1 = self._upd(spark, [(1, None, dt.date(2024, 2, 1), "delete")])
        b2 = self._upd(spark, [(1, 99.0, dt.date(2024, 3, 1), "upsert")])
        hist = scd2_merge_cdc(self._dim(spark), b1, "cust_id", ["bal"])
        hist = scd2_merge_cdc(hist, b2, "cust_id", ["bal"])
        rows = sorted(
            (r.valid_from, r.valid_to, r.is_current, r.bal)
            for r in hist.where("cust_id = 1").collect()
        )
        assert rows == [
            (dt.date(2024, 1, 1), dt.date(2024, 2, 1), False, 10.0),
            (dt.date(2024, 3, 1), None, True, 99.0),
        ]

    def test_delete_absent_key_is_noop(self, spark):
        import datetime as dt

        from personal_health_etl_pipeline_spark.operators.merge import (
            scd2_merge_cdc,
        )

        upd = self._upd(spark, [(9, None, dt.date(2024, 2, 1), "delete")])
        out = scd2_merge_cdc(self._dim(spark), upd, "cust_id", ["bal"])
        assert out.count() == 2
        assert out.where("is_current").count() == 2
