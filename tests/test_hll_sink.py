"""Streaming HLL register sink (streaming/hll_sink.py): stream-vs-batch
register equality, estimate equality, and replay idempotence."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.plans.sketches import (
    hll_estimate,
    hll_registers,
)
from personal_health_etl_pipeline_spark.streaming.hll_sink import (
    hll_register_sink,
    read_registers,
    run_hll_stream,
)


def _write_batch(src_dir, rows, name, seq):
    table = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    path = os.path.join(src_dir, f"{name}.parquet")
    pq.write_table(table, path)
    t = 1_700_000_000 + seq * 10  # deliver in write order (mtime source order)
    os.utime(path, (t, t))


BATCHES = [
    [("view", i) for i in range(40)] + [("click", i) for i in range(5)],
    [("view", i) for i in range(20, 60)] + [("click", 99)],
    [("view", i) for i in range(50, 80)] + [("click", i) for i in range(5)],
]


def test_stream_registers_equal_batch_registers(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    table_dir = str(tmp_path / "regs")
    os.makedirs(table_dir)
    for i, rows in enumerate(BATCHES):
        _write_batch(str(src), rows, f"b{i}", seq=i)
    stream = (
        spark.readStream.schema("event_type string, user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = run_hll_stream(stream, table_dir, str(tmp_path / "ck"))
    q.processAllAvailable()
    q.stop()

    got = {
        (r.event_type, r.idx, r.r)
        for r in read_registers(spark, table_dir).collect()
    }
    all_rows = [r for b in BATCHES for r in b]
    batch = spark.createDataFrame(all_rows, "event_type string, user_id bigint")
    want = {(r.event_type, r.idx, r.r) for r in hll_registers(batch).collect()}
    assert got == want  # incremental max-merge == one-shot sketch

    # ...and so the estimates agree, and track the true distinct counts
    est = {
        r.event_type: r.est_ndv
        for r in hll_estimate(read_registers(spark, table_dir)).collect()
    }
    exact = {
        r.event_type: r.ndv
        for r in batch.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("ndv"))
        .collect()
    }
    for et, ndv in exact.items():
        assert abs(est[et] - ndv) / ndv < 0.2


def test_replayed_batch_changes_nothing(spark, tmp_path):
    # at-least-once delivery: applying the same batch twice must leave
    # the registers bit-identical (max-merge idempotence)
    table_dir = str(tmp_path / "regs")
    os.makedirs(table_dir)
    sink = hll_register_sink(table_dir)
    batch = spark.createDataFrame(BATCHES[0], "event_type string, user_id bigint")
    sink(batch, 0)
    once = {(r.event_type, r.idx, r.r) for r in read_registers(spark, table_dir).collect()}
    sink(batch, 1)  # replay
    twice = {(r.event_type, r.idx, r.r) for r in read_registers(spark, table_dir).collect()}
    assert once == twice
    versions = sorted(v for v in os.listdir(table_dir) if v.startswith("v"))
    assert len(versions) == 2  # committed per batch, pointer at latest
