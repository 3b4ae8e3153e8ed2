"""JSONL quarantine source (sources/jsonl.py): good/bad split,
losslessness, and FAILFAST abort."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from personal_health_etl_pipeline_spark.sources.jsonl import (
    read_jsonl_quarantine,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
    ]
)

LINES = [
    '{"id": 1, "name": "ok"}',
    "{definitely not json",
    '{"id": 2, "name": "fine"}',
    '{"id": "not-a-number", "name": "type-drift"}',
    '{"id": 3, "name": "good"}',
]


@pytest.fixture()
def landing(tmp_path):
    p = tmp_path / "landing.jsonl"
    p.write_text("\n".join(LINES) + "\n", encoding="utf-8")
    return str(p)


def test_split_is_lossless_and_typed(spark, landing):
    good, quarantine = read_jsonl_quarantine(spark, landing, SCHEMA)
    g = {(r.id, r.name) for r in good.collect()}
    q = [r.raw_line for r in quarantine.collect()]
    assert g == {(1, "ok"), (2, "fine"), (3, "good")}
    assert len(q) == 2  # syntax error + type drift, raw lines preserved
    assert any("definitely not json" in line for line in q)
    assert any("not-a-number" in line for line in q)
    assert good.columns == ["id", "name"]  # carrier column dropped
    assert good.count() + quarantine.count() == len(LINES)


def test_failfast_aborts_on_first_bad_line(spark, landing):
    good, _ = read_jsonl_quarantine(spark, landing, SCHEMA, mode="FAILFAST")
    with pytest.raises(Exception, match="FAILFAST|Malformed|malformed"):
        good.collect()


def test_clean_file_quarantines_nothing(spark, tmp_path):
    p = tmp_path / "clean.jsonl"
    p.write_text('{"id": 9, "name": "x"}\n', encoding="utf-8")
    good, quarantine = read_jsonl_quarantine(spark, str(p), SCHEMA)
    assert quarantine.count() == 0
    assert good.count() == 1


def test_read_registers_nothing_in_cache_manager(spark, landing):
    """Regression for the round-4 cache leak: the reader's one-shot
    materialization must NOT register in the session CacheManager
    (a cache() there lives until an unpersist the caller can never
    issue — it is localCheckpoint now). Repeated landing reads in a
    long-lived session must leave the cache empty."""
    jvm_cm = spark._jsparkSession.sharedState().cacheManager()
    assert jvm_cm.isEmpty(), "cache not empty before the read"
    for _ in range(3):
        good, quarantine = read_jsonl_quarantine(spark, landing, SCHEMA)
        good.count()
        quarantine.count()
    assert jvm_cm.isEmpty(), "quarantine read leaked a CacheManager entry"


def test_stream_writer_commit_is_batch_idempotent(tmp_path):
    """JsonlLinesStreamWriter.commit publishes each batchId exactly
    once: a checkpoint-replayed batch (same id, fresh part files) is a
    visibility no-op — its orphan parts never enter the manifest."""
    import json

    from pyspark.sql.types import LongType, StructField, StructType

    from personal_health_etl_pipeline_spark.sources.datasource import (
        JsonlCommitMessage,
        JsonlLinesStreamWriter,
    )

    out = str(tmp_path / "sink")
    import os

    os.makedirs(out)
    schema = StructType([StructField("event_id", LongType())])
    w = JsonlLinesStreamWriter({"path": out}, schema)

    w.commit([JsonlCommitMessage("part-b0.jsonl", 3)], 0)
    w.commit([JsonlCommitMessage("part-b1.jsonl", 2)], 1)
    # replay of batch 1 after a crash between sink and offset commit:
    # the retried tasks wrote a NEW part file, but visibility must not
    # change
    w.commit([JsonlCommitMessage("part-b1-retry.jsonl", 2)], 1)

    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        m = json.load(fh)
    assert m["total_rows"] == 5
    assert m["batches"] == [0, 1]
    assert {f["name"] for f in m["files"]} == {
        "part-b0.jsonl", "part-b1.jsonl"
    }
