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
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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
        return _record_rows(
            partition.data_type,
            dt.date.fromisoformat(partition.start_iso),
            dt.date.fromisoformat(partition.end_iso),
        )


def _record_rows(data_type: str, lo: dt.date, hi: dt.date):
    from personal_health_etl_pipeline_spark.pipeline.fixtures import (
        fetch_range,
    )

    for r in fetch_range(data_type, lo, hi):
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


class OuraFixtureStreamReader(SimpleDataSourceStreamReader):
    """``spark.readStream.format("oura_fixture")`` — each micro-batch
    advances the date cursor by ``days_per_batch`` (the reference's
    incremental daily backfill, as a STREAM: offset = next unread
    day). Bounded by ``end``: once the cursor passes it the reader
    reports no new data, so ``processAllAvailable`` / available-now
    triggers drain and stop. Offsets are the replay contract —
    ``readBetweenOffsets`` regenerates any committed window
    deterministically (the fixture is a pure function of (type, day)),
    which is exactly the property a real REST reader needs for
    exactly-once recovery."""

    def __init__(self, options: dict):
        self.data_type = options.get("data_type", "heartrate")
        self.start = dt.date.fromisoformat(options["start"])
        self.end = dt.date.fromisoformat(options["end"])
        self.days_per_batch = int(options.get("days_per_batch", "7"))
        if self.days_per_batch < 1:
            raise ValueError("days_per_batch must be >= 1")

    def initialOffset(self) -> dict:
        return {"next_day": self.start.isoformat()}

    def read(self, start: dict):
        # rows go back as a LIST ITERATOR: the runner requires an
        # iterator, and its prefetch cache copy.copy()s it — a
        # list_iterator survives both (a generator is not copyable, a
        # bare list is not an iterator); a batch is bounded
        # (days_per_batch of records)
        lo = dt.date.fromisoformat(start["next_day"])
        if lo > self.end:
            return iter([]), start  # drained: no progress, no rows
        hi = min(lo + dt.timedelta(days=self.days_per_batch - 1), self.end)
        nxt = {"next_day": (hi + dt.timedelta(days=1)).isoformat()}
        return iter(list(_record_rows(self.data_type, lo, hi))), nxt

    def readBetweenOffsets(self, start: dict, end: dict):
        lo = dt.date.fromisoformat(start["next_day"])
        hi = dt.date.fromisoformat(end["next_day"]) - dt.timedelta(days=1)
        return iter(list(_record_rows(self.data_type, lo, hi)))


class OuraFixtureDataSource(DataSource):
    """``spark.read.format("oura_fixture")`` (batch) and
    ``spark.readStream.format("oura_fixture")`` (incremental stream) —
    options: ``data_type``, ``start``/``end`` (ISO dates, inclusive),
    ``chunk_days`` (batch) / ``days_per_batch`` (stream)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return RECORD_SCHEMA

    def reader(self, schema: StructType) -> OuraFixtureReader:
        return OuraFixtureReader(self.options)

    def simpleStreamReader(
        self, schema: StructType
    ) -> OuraFixtureStreamReader:
        return OuraFixtureStreamReader(self.options)


def register(spark) -> None:
    """Idempotent format registration for the current session."""
    spark.dataSource.register(OuraFixtureDataSource)


# --- Python DataSource WRITER (the missing third of the API) -----------

WRITE_FORMAT_NAME = "jsonl_lines"


def _load_manifest(mpath: str) -> dict:
    """Read ``_MANIFEST.json`` or return the empty manifest.

    A manifest that exists but does not parse is a hard error, not an
    empty dataset: silently starting over would unpublish every
    previously committed batch. Because :func:`_publish_manifest` is
    atomic (temp file + ``os.replace``), a corrupt manifest can only
    mean out-of-band damage — surface it with recovery guidance
    instead of letting a replayed commit crash on ``json.load`` with
    no context."""
    import json as _json
    import os as _os

    if not _os.path.exists(mpath):
        return {"files": [], "total_rows": 0}
    with open(mpath) as fh:
        raw = fh.read()
    try:
        return _json.loads(raw)
    except ValueError as exc:  # pragma: no cover - out-of-band damage
        raise RuntimeError(
            f"corrupt sink manifest {mpath!r}: {exc}. The manifest is "
            "published atomically, so this indicates external damage. "
            "To recover, rebuild it from the part files that should be "
            "visible: list part-*.jsonl, count rows per file, and write "
            '{"files": [{"name": ..., "rows": ...}, ...], "total_rows": '
            "N} (plus the prior \"batches\" list for streaming sinks); "
            "or delete the manifest AND all part files to reset the "
            "dataset to empty."
        ) from exc


def _publish_manifest(mpath: str, manifest: dict) -> None:
    """Atomically publish the manifest: write to a temp file in the
    same directory, then ``os.replace`` over ``_MANIFEST.json``.

    ``commit`` runs exactly in the sink-commit/offset-commit window the
    batch-id replay dedup exists for — an in-place ``open(mpath, "w")``
    that crashes mid-write would leave a truncated manifest,
    unpublishing ALL previously committed batches and making the
    replayed commit fail on parse instead of no-opping. Rename within
    one directory is atomic on POSIX, so readers and replays see either
    the old manifest or the new one, never a partial write."""
    import json as _json
    import os as _os
    import uuid as _uuid

    tmp = f"{mpath}.tmp-{_uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        _json.dump(manifest, fh, sort_keys=True)
        fh.flush()
        _os.fsync(fh.fileno())
    _os.replace(tmp, mpath)


class JsonlCommitMessage(WriterCommitMessage):
    """Per-task commit message: which file this task wrote and how many
    rows it holds. Must be picklable — plain attributes only."""

    def __init__(self, filename: str, rows: int):
        self.filename = filename
        self.rows = rows


class JsonlLinesWriter(DataSourceWriter):
    """Executor-side writer: each partition lands one JSONL part file
    under a task-unique TEMPORARY name (two-phase commit: tasks write,
    only the driver-side ``commit`` publishes the manifest, so a failed
    or speculative task leaves an orphan the manifest never references
    — the same visibility protocol every cloud-storage committer uses).
    Rows serialize as sorted-key JSON; non-JSON scalars (timestamps)
    go through ``default=str``."""

    def __init__(self, options: dict, schema: StructType):
        self.path = options["path"]
        self.cols = [f.name for f in schema.fields]

    def write(self, iterator):
        import json as _json
        import os as _os
        import uuid as _uuid

        _os.makedirs(self.path, exist_ok=True)
        fname = f"part-{_uuid.uuid4().hex}.jsonl"
        n = 0
        with open(_os.path.join(self.path, fname), "w") as fh:
            for row in iterator:
                rec = dict(zip(self.cols, row))
                fh.write(_json.dumps(rec, sort_keys=True, default=str))
                fh.write("\n")
                n += 1
        return JsonlCommitMessage(fname, n)

    def commit(self, messages):
        import os as _os

        done = [m for m in messages if m is not None]
        files = [{"name": m.filename, "rows": m.rows} for m in done]
        # Append semantics all the way down: a second append-mode save
        # to the same path MERGES with the already-published manifest
        # instead of overwriting it — otherwise the earlier commit's
        # rows silently vanish for manifest-honoring readers, which
        # would contradict the sink's advertised append-only contract.
        # The merge preserves keys it does not own (in particular the
        # stream writer's ``batches`` exactly-once ledger): a batch
        # append onto a stream-written path must not erase the
        # committed-batch-id record, or a checkpoint-replayed streaming
        # batch would double-publish.
        mpath = _os.path.join(self.path, "_MANIFEST.json")
        manifest = _load_manifest(mpath)
        files.extend(manifest.get("files", []))
        manifest["files"] = sorted(files, key=lambda f: f["name"])
        manifest["total_rows"] = sum(f["rows"] for f in files)
        _publish_manifest(mpath, manifest)

    def abort(self, messages):  # pragma: no cover - failure path
        # leave part files unpublished: no manifest means readers that
        # honor the protocol see an uncommitted (empty) dataset
        pass


class JsonlLinesStreamWriter(JsonlLinesWriter, DataSourceStreamWriter):
    """Streaming twin of :class:`JsonlLinesWriter` — the STREAM-WRITER
    quarter of the Python DataSource API (``df.writeStream.format(
    "jsonl_lines")``). Task-side ``write`` is inherited unchanged
    (temp-named part files, nothing visible until the driver
    publishes); the per-micro-batch ``commit`` merges this batch's
    files into the manifest EXACTLY ONCE: committed batch ids are
    recorded in the manifest's ``batches`` list, and a re-delivered
    batchId (checkpoint replay after a crash between sink commit and
    offset commit — Structured Streaming's at-least-once window) is
    a NO-OP, leaving its re-written part files as unreferenced
    orphans the manifest protocol already ignores. That turns the
    at-least-once replay into exactly-once VISIBILITY, the same
    discipline as the SCD-2 upsert sink (streaming/upsert.py)."""

    def commit(self, messages, batchId):
        import os as _os

        mpath = _os.path.join(self.path, "_MANIFEST.json")
        prior = _load_manifest(mpath)
        if batchId in prior.get("batches", []):
            return  # replayed batch: already visible, keep exactly-once
        done = [m for m in messages if m is not None]
        files = prior.get("files", []) + [
            {"name": m.filename, "rows": m.rows} for m in done
        ]
        manifest = dict(prior)
        manifest["files"] = sorted(files, key=lambda f: f["name"])
        manifest["total_rows"] = sum(f["rows"] for f in files)
        manifest["batches"] = sorted(prior.get("batches", []) + [batchId])
        _publish_manifest(mpath, manifest)

    def abort(self, messages, batchId):  # pragma: no cover - failure path
        # unpublished part files stay orphans; the manifest never
        # references them, so the failed batch is invisible
        pass


class JsonlLinesDataSource(DataSource):
    """``df.write.format("jsonl_lines").option("path", ...).save()`` —
    the WRITER third of the Python DataSource API (reader and stream
    reader live on :class:`OuraFixtureDataSource`). The reference lands
    raw API responses as a single JSON document per range
    (``json.dumps`` → ``data.json``, etl/load.py); this sink keeps that
    raw-zone landing role but uses JSON-LINES part files so executors
    can write in parallel, published via a manifest-based two-phase
    commit."""

    @classmethod
    def name(cls) -> str:
        return WRITE_FORMAT_NAME

    def writer(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "jsonl_lines supports append only; use a fresh path"
            )
        return JsonlLinesWriter(self.options, schema)

    def streamWriter(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "jsonl_lines supports append only; use a fresh path"
            )
        return JsonlLinesStreamWriter(self.options, schema)


def register_writer(spark) -> None:
    """Idempotent registration of the JSONL writer format."""
    spark.dataSource.register(JsonlLinesDataSource)
