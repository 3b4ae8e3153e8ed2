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


def test_batch_append_preserves_stream_batch_ledger(tmp_path):
    """ADVICE-r9: a batch append onto a path previously written by the
    streaming sink must PRESERVE the manifest's ``batches``
    exactly-once ledger — erasing it would let a checkpoint-replayed
    streaming batch double-publish."""
    import json
    import os

    from pyspark.sql.types import LongType, StructField, StructType

    from personal_health_etl_pipeline_spark.sources.datasource import (
        JsonlCommitMessage,
        JsonlLinesStreamWriter,
        JsonlLinesWriter,
    )

    out = str(tmp_path / "sink")
    os.makedirs(out)
    schema = StructType([StructField("event_id", LongType())])

    sw = JsonlLinesStreamWriter({"path": out}, schema)
    sw.commit([JsonlCommitMessage("part-b0.jsonl", 3)], 0)

    bw = JsonlLinesWriter({"path": out}, schema)
    bw.commit([JsonlCommitMessage("part-batch.jsonl", 4)])

    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        m = json.load(fh)
    assert m["batches"] == [0], "batch append erased the stream ledger"
    assert m["total_rows"] == 7
    assert {f["name"] for f in m["files"]} == {
        "part-b0.jsonl", "part-batch.jsonl"
    }

    # and the replayed streaming batch is STILL a visibility no-op
    sw.commit([JsonlCommitMessage("part-b0-retry.jsonl", 3)], 0)
    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        m = json.load(fh)
    assert m["total_rows"] == 7


def test_manifest_publication_is_atomic_and_corruption_is_loud(tmp_path):
    """ADVICE-r9: the manifest is published via temp-file +
    ``os.replace`` (no window where readers see a partial write, and a
    crashed commit leaves the OLD manifest intact), and a manifest
    damaged out-of-band fails loudly with recovery guidance instead of
    silently unpublishing every prior batch."""
    import json
    import os

    import pytest
    from pyspark.sql.types import LongType, StructField, StructType

    from personal_health_etl_pipeline_spark.sources.datasource import (
        JsonlCommitMessage,
        JsonlLinesWriter,
    )

    out = str(tmp_path / "sink")
    os.makedirs(out)
    schema = StructType([StructField("event_id", LongType())])
    w = JsonlLinesWriter({"path": out}, schema)
    w.commit([JsonlCommitMessage("part-a.jsonl", 1)])

    # no temp litter: publication renamed the temp file away
    assert [f for f in os.listdir(out) if ".tmp-" in f] == []
    mpath = os.path.join(out, "_MANIFEST.json")
    with open(mpath) as fh:
        assert json.load(fh)["total_rows"] == 1

    # out-of-band damage (impossible via the atomic publish path):
    # the next commit must raise with recovery guidance, NOT reset the
    # dataset to empty or crash on a bare json error
    with open(mpath, "w") as fh:
        fh.write('{"files": [truncated')
    with pytest.raises(RuntimeError, match="corrupt sink manifest"):
        w.commit([JsonlCommitMessage("part-b.jsonl", 1)])
    # the damaged manifest was not clobbered by the failed commit
    with open(mpath) as fh:
        assert fh.read().startswith('{"files": [truncated')
