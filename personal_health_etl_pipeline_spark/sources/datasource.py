"""Python DataSource API (Spark 4) front-end for the range source.

The registry's readers are driver-side thin (``fetch_range_df`` builds
rows on the driver and ``createDataFrame``s them — fine for config
probes, wrong for volume). This module exposes the SAME source through
``spark.read.format("oura_fixture")`` via the Python DataSource API:
the driver only PLANS (one :class:`OuraChunkPartition` per chunk
window — the reference's 7-day chunking, ``extract.py:133-149``,
became the partitioning scheme), and each partition's records are
synthesized ON THE EXECUTORS inside ``read``. That is the
architecture a real REST backfill needs at scale: N workers each
fetching their own window concurrently, no driver materialization, no
union-of-frames plan — one scan node with N input partitions.

Certified by ``src_datasource_scan`` (plans/reference_surface.py):
same window and values as ``j13_heartrate_chunked``, so the oracle's
sha256 regeneration also proves the partition windows tile the range
exactly under the DataSource planning path.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from personal_health_etl_pipeline_spark.pipeline.fixtures import (
    RECORD_SCHEMA,
)

FORMAT_NAME = "oura_fixture"


class OuraChunkPartition(InputPartition):
    """One chunk window = one Spark input partition (= one worker's
    fetch). Carries only (type, iso dates) — tiny, picklable."""

    def __init__(self, data_type: str, start_iso: str, end_iso: str):
        self.data_type = data_type
        self.start_iso = start_iso
        self.end_iso = end_iso


class OuraFixtureReader(DataSourceReader):
    def __init__(self, options: dict):
        self.data_type = options.get("data_type", "heartrate")
        self.start = dt.date.fromisoformat(options["start"])
        self.end = dt.date.fromisoformat(options["end"])
        self.chunk_days = int(options.get("chunk_days", "7"))
        if self.chunk_days < 1:
            raise ValueError("chunk_days must be >= 1")

    def partitions(self):
        if self.end < self.start:
            # inverted range -> empty envelope (extract.py:40-44); one
            # no-op partition, because Spark treats an EMPTY partition
            # list as "unpartitioned" and calls read(None)
            return [
                OuraChunkPartition(
                    self.data_type,
                    self.start.isoformat(),
                    self.end.isoformat(),
                )
            ]
        out = []
        lo = self.start
        while lo <= self.end:
            hi = min(lo + dt.timedelta(days=self.chunk_days - 1), self.end)
            out.append(
                OuraChunkPartition(
                    self.data_type, lo.isoformat(), hi.isoformat()
                )
            )
            lo = hi + dt.timedelta(days=1)
        return out

    def read(self, partition: OuraChunkPartition):
        # EXECUTOR-side: synthesize (or, in production, HTTP-fetch)
        # this partition's window only
        from personal_health_etl_pipeline_spark.pipeline.fixtures import (
            fetch_range,
        )

        records = fetch_range(
            partition.data_type,
            dt.date.fromisoformat(partition.start_iso),
            dt.date.fromisoformat(partition.end_iso),
        )
        for r in records:
            c = r["contributors"]
            yield (
                r["id"],
                r["day"],
                r["score"],
                r["temperature_deviation"],
                r["timestamp"],
                (c["deep_sleep"], c["efficiency"], c["latency"]),
                r["met_items"],
            )


class OuraFixtureDataSource(DataSource):
    """``spark.read.format("oura_fixture")`` — options: ``data_type``,
    ``start``/``end`` (ISO dates, inclusive), ``chunk_days``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return RECORD_SCHEMA

    def reader(self, schema: StructType) -> OuraFixtureReader:
        return OuraFixtureReader(self.options)


def register(spark) -> None:
    """Idempotent format registration for the current session."""
    spark.dataSource.register(OuraFixtureDataSource)
