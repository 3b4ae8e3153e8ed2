"""Source-registry tests: category dispatch, error policy, chunking
(reference S1-S4 semantics), and the one-call pipeline orchestration.
"""

from __future__ import annotations

import datetime as dt

import pytest

from personal_health_etl_pipeline_spark.pipeline import PipelineConfig
from personal_health_etl_pipeline_spark.pipeline.etl import run_pipeline
from personal_health_etl_pipeline_spark.pipeline.fixtures import fetch_range_df
from personal_health_etl_pipeline_spark.sources.registry import (
    CATEGORY_DAILY,
    DEFAULT_REGISTRY,
    SourceSpec,
    UnknownDataTypeError,
    extract_data_type,
)

D1 = dt.date(2024, 2, 1)
D10 = dt.date(2024, 2, 10)


class TestDispatch:
    def test_registry_covers_the_reference_15_types(self):
        assert len(DEFAULT_REGISTRY) == 15
        assert DEFAULT_REGISTRY["heartrate"].chunk_days == 7

    def test_unknown_type_is_hard_error(self, spark):
        with pytest.raises(UnknownDataTypeError):
            extract_data_type(spark, "not_a_type", D1, D10)

    def test_unconfigured_endpoint_yields_empty_envelope(self, spark):
        reg = {"ghost": SourceSpec(CATEGORY_DAILY, reader=None)}
        df = extract_data_type(spark, "ghost", D1, D10, registry=reg)
        assert df.count() == 0
        assert "day" in df.columns  # typed empty frame, not a bare []

    def test_reader_failure_degrades_to_empty(self, spark):
        def broken(spark_, t, s, e):
            raise RuntimeError("API down")

        reg = {"flaky": SourceSpec(CATEGORY_DAILY, reader=broken)}
        assert extract_data_type(spark, "flaky", D1, D10, registry=reg).count() == 0

    def test_chunked_equals_single_fetch(self, spark):
        whole = extract_data_type(spark, "daily_sleep", D1, D10)
        chunked = extract_data_type(spark, "heartrate", D1, D10)
        assert chunked.count() == whole.count() == 10
        # chunk windows tile the range exactly — no dup/missing days
        days = sorted(r["day"] for r in chunked.collect())
        assert days == sorted(r["day"] for r in whole.collect())

    def test_inverted_range_is_empty(self, spark):
        assert extract_data_type(spark, "daily_sleep", D10, D1).count() == 0


class TestOrchestration:
    def test_run_pipeline_is_extract_then_transform(self, spark, tmp_path):
        cfg = PipelineConfig(
            raw_root=str(tmp_path / "raw"),
            warehouse_path=str(tmp_path / "wh"),
            historical_days=4,
        )
        out = run_pipeline(spark, cfg, dt.date(2024, 3, 1), source=fetch_range_df)
        assert out["extracted"] == {t: 5 for t in cfg.data_types}
        assert out["new_rows"] == 5
        assert spark.read.parquet(cfg.warehouse_path).count() == 5


class TestPythonDataSource:
    """sources/datasource.py: the Python DataSource API front-end."""

    def _load(self, spark, start, end, chunk_days="7"):
        from personal_health_etl_pipeline_spark.sources.datasource import (
            register,
        )

        register(spark)
        return (
            spark.read.format("oura_fixture")
            .option("data_type", "heartrate")
            .option("start", start)
            .option("end", end)
            .option("chunk_days", chunk_days)
            .load()
        )

    def test_one_partition_per_chunk(self, spark):
        df = self._load(spark, "2024-01-01", "2024-01-30")
        assert df.rdd.getNumPartitions() == 5  # ceil(30 / 7)

    def test_values_equal_driver_side_fixture(self, spark):
        import datetime as dt

        from personal_health_etl_pipeline_spark.pipeline.fixtures import (
            fetch_range_df,
        )

        ds = self._load(spark, "2024-01-01", "2024-01-10", chunk_days="3")
        drv = fetch_range_df(
            spark, "heartrate", dt.date(2024, 1, 1), dt.date(2024, 1, 10)
        )
        a = sorted(map(tuple, ds.collect()))
        b = sorted(map(tuple, drv.collect()))
        assert a == b  # executor-side synthesis == driver-side fixture

    def test_inverted_range_is_empty(self, spark):
        df = self._load(spark, "2024-01-10", "2024-01-01")
        assert df.count() == 0

    def test_bad_chunk_days_raises(self, spark):
        import pytest

        with pytest.raises(Exception, match="chunk_days"):
            self._load(spark, "2024-01-01", "2024-01-05", chunk_days="0").count()


class TestStreamingDataSource:
    """The simple stream reader: batch-count and replay determinism."""

    def test_stream_batches_and_replay(self, spark, tmp_path):
        from personal_health_etl_pipeline_spark.sources.datasource import (
            OuraFixtureStreamReader,
            register,
        )

        register(spark)
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        stream = (
            spark.readStream.format("oura_fixture")
            .option("data_type", "heartrate")
            .option("start", "2024-01-01")
            .option("end", "2024-01-30")
            .option("days_per_batch", "7")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        back = spark.read.parquet(out)
        assert back.count() == 30  # every day exactly once
        assert back.select("day").distinct().count() == 30
        # replay contract: readBetweenOffsets regenerates a committed
        # window byte-identically
        r = OuraFixtureStreamReader(
            {"data_type": "heartrate", "start": "2024-01-01",
             "end": "2024-01-30", "days_per_batch": "7"}
        )
        rows1, nxt = r.read({"next_day": "2024-01-08"})
        rows2 = r.readBetweenOffsets({"next_day": "2024-01-08"}, nxt)
        assert list(rows1) == list(rows2)
        assert nxt == {"next_day": "2024-01-15"}
        # drained source reports no progress
        empty, same = r.read({"next_day": "2024-01-31"})
        assert list(empty) == [] and same == {"next_day": "2024-01-31"}
