"""Streaming SCD-2 upsert sink (streaming/upsert.py): stream-vs-batch
equivalence and version-pointer atomicity."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from personal_health_etl_pipeline_spark.operators.merge import scd2_merge
from personal_health_etl_pipeline_spark.streaming.upsert import (
    read_current,
    run_upsert_stream,
)

D = dt.date


def _write_updates(src_dir, rows, name, seq=0):
    table = pa.table(
        {
            "cust_id": pa.array([r[0] for r in rows], pa.int64()),
            "bal": pa.array([r[1] for r in rows], pa.float64()),
            "eff_date": pa.array([r[2] for r in rows], pa.date32()),
        }
    )
    path = os.path.join(src_dir, f"{name}.parquet")
    pq.write_table(table, path)
    # Spark's file source orders files by MODIFICATION TIME (lexicographic
    # names do NOT tiebreak); back-to-back writes can land in the same
    # fs-timestamp granule, letting a later batch run first. Pin strictly
    # increasing mtimes so delivery order is the intended CDC order.
    t = 1_700_000_000 + seq * 10
    os.utime(path, (t, t))


def _read_stream(spark, src_dir):
    return (
        spark.readStream.schema("cust_id bigint, bal double, eff_date date")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


BATCH1 = [(1, 10.0, D(2024, 1, 1)), (2, 20.0, D(2024, 1, 1))]
BATCH2 = [(1, 11.0, D(2024, 2, 1)), (3, 30.0, D(2024, 2, 1))]
BATCH3 = [(2, 20.0, D(2024, 3, 1)), (1, 12.0, D(2024, 3, 1))]  # 2 is a no-op


def test_stream_matches_batch_fold(spark, tmp_path):
    src = tmp_path / "cdc"
    src.mkdir()
    table_dir = str(tmp_path / "dim")
    os.makedirs(table_dir)
    _write_updates(str(src), BATCH1, "b0", seq=0)
    _write_updates(str(src), BATCH2, "b1", seq=1)
    _write_updates(str(src), BATCH3, "b2", seq=2)

    q = run_upsert_stream(
        _read_stream(spark, str(src)),
        table_dir,
        str(tmp_path / "ck"),
        key="cust_id",
        attrs=["bal"],
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.cust_id, r.bal, r.valid_from, r.valid_to, r.is_current)
        for r in read_current(spark, table_dir).collect()
    }

    # batch replay: bootstrap on batch 1, then fold the merges
    def as_df(rows):
        return spark.createDataFrame(rows, "cust_id bigint, bal double, eff_date date")

    from pyspark.sql import functions as F

    boot = as_df(BATCH1).select(
        "cust_id",
        "bal",
        F.col("eff_date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    replay = scd2_merge(
        scd2_merge(boot, as_df(BATCH2), key="cust_id", attrs=["bal"]),
        as_df(BATCH3),
        key="cust_id",
        attrs=["bal"],
    )
    want = {
        (r.cust_id, r.bal, r.valid_from, r.valid_to, r.is_current)
        for r in replay.collect()
    }
    assert got == want
    # and the semantics are what SCD-2 promises
    assert (1, 12.0, D(2024, 3, 1), None, True) in got       # latest open
    assert (1, 11.0, D(2024, 2, 1), D(2024, 3, 1), False) in got  # closed
    assert (2, 20.0, D(2024, 1, 1), None, True) in got       # no-op survived
    assert (3, 30.0, D(2024, 2, 1), None, True) in got


def test_pointer_repoints_per_batch(spark, tmp_path):
    src = tmp_path / "cdc"
    src.mkdir()
    table_dir = str(tmp_path / "dim")
    os.makedirs(table_dir)
    _write_updates(str(src), BATCH1, "b0", seq=0)
    _write_updates(str(src), BATCH2, "b1", seq=1)
    q = run_upsert_stream(
        _read_stream(spark, str(src)),
        table_dir,
        str(tmp_path / "ck"),
        key="cust_id",
        attrs=["bal"],
    )
    q.processAllAvailable()
    q.stop()
    versions = sorted(v for v in os.listdir(table_dir) if v.startswith("v"))
    assert len(versions) == 2  # one committed version per micro-batch
    with open(os.path.join(table_dir, "_CURRENT"), encoding="utf-8") as f:
        assert f.read().strip() == versions[-1]


def test_time_travel_reads_each_retained_version(spark, tmp_path):
    """list_versions/read_version: every commit stays readable past the
    pointer — version 0 must still show the pre-merge state after later
    batches have moved the current pointer."""
    from personal_health_etl_pipeline_spark.streaming.upsert import (
        list_versions,
        read_version,
    )

    src = tmp_path / "cdc"
    src.mkdir()
    table_dir = str(tmp_path / "dim")
    os.makedirs(table_dir)
    _write_updates(str(src), BATCH1, "b0", seq=0)
    _write_updates(str(src), BATCH2, "b1", seq=1)
    q = run_upsert_stream(
        _read_stream(spark, str(src)),
        table_dir,
        str(tmp_path / "ck"),
        key="cust_id",
        attrs=["bal"],
    )
    q.processAllAvailable()
    q.stop()
    versions = list_versions(table_dir)
    assert len(versions) == 2
    v0 = read_version(spark, table_dir, versions[0])
    # version 0 = batch-1 bootstrap: every row open, untouched by batch 2
    assert v0.where(~v0.is_current).count() == 0
    assert v0.count() == len(BATCH1)
    # ...while the current version reflects the later merge
    vn = read_version(spark, table_dir, versions[-1])
    assert vn.count() > v0.count() or vn.where(~vn.is_current).count() > 0


class TestExpireVersions:
    """expire_versions: retention arithmetic + pointer protection."""

    def _table(self, spark, tmp_path, n_versions=3, pointer_at=None):
        import os

        from personal_health_etl_pipeline_spark.streaming.upsert import (
            _commit,
        )

        table = str(tmp_path / "t")
        os.makedirs(table)
        for i in range(n_versions):
            df = spark.createDataFrame([(i,)], "v bigint")
            _commit(df, table, f"v{i:06d}")
        if pointer_at is not None:
            with open(os.path.join(table, "_CURRENT"), "w") as f:
                f.write(f"v{pointer_at:06d}")
        return table

    def test_keeps_newest_and_current_read_survives(self, spark, tmp_path):
        from personal_health_etl_pipeline_spark.streaming.upsert import (
            expire_versions,
            list_versions,
            read_current,
        )

        table = self._table(spark, tmp_path, n_versions=4)
        removed, kept = expire_versions(table, keep_last=2)
        assert removed == ["v000000", "v000001"]
        assert kept == ["v000002", "v000003"]
        assert list_versions(table) == kept
        assert read_current(spark, table).collect()[0].v == 3

    def test_never_removes_pointer_target_even_if_old(self, spark, tmp_path):
        from personal_health_etl_pipeline_spark.streaming.upsert import (
            expire_versions,
            read_current,
        )

        # pointer deliberately lags at the OLDEST version
        table = self._table(spark, tmp_path, n_versions=3, pointer_at=0)
        removed, kept = expire_versions(table, keep_last=1)
        assert "v000000" in kept  # pointer target protected
        assert removed == ["v000001"]
        assert read_current(spark, table).collect()[0].v == 0

    def test_keep_last_must_be_positive(self, spark, tmp_path):
        import pytest

        from personal_health_etl_pipeline_spark.streaming.upsert import (
            expire_versions,
        )

        table = self._table(spark, tmp_path, n_versions=1)
        with pytest.raises(ValueError, match="keep_last"):
            expire_versions(table, keep_last=0)
