"""Streaming-execution tests: the same window/dedup/sink functions the
catalog oracle-checks in batch, driven through Structured Streaming
file-source micro-batches with watermarks.

Covers the reference's incremental semantics mapped to streams
(SURVEY.md §2.8): late data dropped past the watermark, key-dedup,
and the J3 conflict-or-raise append sink via foreachBatch.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.operators.conflict import DuplicateKeyError
from personal_health_etl_pipeline_spark.streaming import (
    EVENTS_SCHEMA,
    dedup_events,
    read_events_stream,
    run_append_stream,
    tumbling_agg,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk_events(rows):
    """rows: (event_id, minutes_after_T0, user_id, event_type, value)."""
    return [
        (eid, T0 + dt.timedelta(minutes=m), uid, etype, val, "{}")
        for (eid, m, uid, etype, val) in rows
    ]


def _write_batch(spark, src_dir, rows, name):
    # one flat parquet file per micro-batch: the streaming file source
    # lists only top-level (or partition-style) paths, so nested
    # directory-per-write layouts would be invisible to it
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*_mk_events(rows)))
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp("us")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    path = f"{src_dir}/{name}.parquet"
    pq.write_table(table, path)
    # micro-batch order = file source's (mtime, path) order; sub-second
    # writes can tie on mtime and flip batch order, so pin strictly
    # increasing mtimes derived from the batch name
    seq = int("".join(ch for ch in name if ch.isdigit()) or "0")
    os.utime(path, (1_700_000_000 + seq, 1_700_000_000 + seq))


def _one_batch_dirs(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return str(src), str(tmp_path / "ckpt")


def _run_to_memory(spark, stream_df, name, ckpt):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


class TestTumblingStream:
    def test_closed_windows_match_batch(self, spark, tmp_path):
        """Windows finalized by the advancing watermark must equal the
        batch execution of the identical function over the same rows."""
        src, ckpt = _one_batch_dirs(tmp_path)
        # batch 1: hour 0; batch 2: hour 2 (advances watermark past hour 0+1h)
        _write_batch(spark, src, [(1, 5, 1, "a", 1.0), (2, 20, 1, "a", 2.0)], "b1")
        _write_batch(spark, src, [(3, 125, 2, "b", 3.0)], "b2")
        # a third batch realizes the watermark advance from b2 (state is
        # evicted/emitted using the watermark computed at the previous
        # batch's end), closing the hour-0 window deterministically
        _write_batch(spark, src, [(4, 240, 2, "b", 4.0)], "b3")
        stream = read_events_stream(spark, src)
        out = _run_to_memory(
            spark,
            tumbling_agg(stream, window="1 hour", watermark="10 minutes"),
            "tumbling_out",
            ckpt,
        )
        got = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in out.collect()
        }
        # hour-0 and hour-2 windows closed by the advancing watermark
        assert got[(T0, "a")] == (2, 3.0)
        assert got[(T0 + dt.timedelta(hours=2), "b")] == (1, 3.0)
        # b3's own hour-4 window is still open: not in append output
        assert (T0 + dt.timedelta(hours=4), "b") not in got

    def test_late_event_dropped(self, spark, tmp_path):
        """An event arriving behind the watermark never lands in any
        window — the streaming form of the reference's 'anything ≤ the
        loaded watermark is never re-read' policy (transform.py:187)."""
        src, ckpt = _one_batch_dirs(tmp_path)
        _write_batch(spark, src, [(1, 0, 1, "a", 1.0), (2, 180, 1, "a", 1.0)], "b1")
        # Spark filters late rows with the *previous* batch's watermark
        # (the late-events watermark lags eviction by one batch), so an
        # intermediate batch locks in wm=02:50 before the late row lands
        _write_batch(spark, src, [(4, 181, 1, "a", 1.0)], "b2")
        # 3 hours late vs locked-in watermark: must be discarded
        _write_batch(spark, src, [(3, 1, 1, "a", 100.0)], "b3")
        # advance watermark again so every non-late window closes
        _write_batch(spark, src, [(5, 360, 1, "a", 1.0)], "b4")
        stream = read_events_stream(spark, src)
        out = _run_to_memory(
            spark,
            tumbling_agg(stream, window="1 hour", watermark="10 minutes"),
            "late_out",
            ckpt,
        )
        hour0 = [r for r in out.collect() if r.window_start == T0]
        # late event_id=3 (value=100.0) is absent from the hour-0 window,
        # and no duplicate hour-0 row was re-emitted for it
        assert [(r.n_events, r.sum_value) for r in hour0] == [(1, 1.0)]


class TestStreamingDedup:
    def test_duplicate_key_within_watermark_dropped(self, spark, tmp_path):
        src, ckpt = _one_batch_dirs(tmp_path)
        _write_batch(spark, src, [(1, 0, 1, "a", 1.0), (2, 1, 1, "a", 2.0)], "b1")
        _write_batch(spark, src, [(1, 2, 1, "a", 1.0), (3, 3, 1, "a", 3.0)], "b2")
        stream = read_events_stream(spark, src)
        out = _run_to_memory(
            spark,
            dedup_events(stream, key="event_id", watermark="1 hour"),
            "dedup_out",
            ckpt,
        )
        ids = sorted(r.event_id for r in out.collect())
        assert ids == [1, 2, 3]


class TestConflictSink:
    def test_append_then_conflict_raises(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        target = str(tmp_path / "warehouse")
        _write_batch(spark, str(src), [(1, 0, 1, "a", 1.0), (2, 1, 1, "a", 2.0)], "b1")
        stream = read_events_stream(spark, str(src))
        q = run_append_stream(stream, target, str(tmp_path / "ck1"), key="event_id")
        q.processAllAvailable()
        q.stop()
        assert sorted(
            r.event_id for r in spark.read.parquet(target).collect()
        ) == [1, 2]

        # second stream re-delivers event_id=2 -> sink must refuse
        _write_batch(spark, str(src), [(2, 5, 1, "a", 2.0), (3, 6, 1, "a", 3.0)], "b2")
        stream2 = read_events_stream(spark, str(src))
        q2 = run_append_stream(stream2, target, str(tmp_path / "ck2"), key="event_id")
        with pytest.raises(Exception) as exc_info:
            q2.processAllAvailable()
        q2.stop()
        assert "DuplicateKeyError" in str(exc_info.value) or isinstance(
            exc_info.value, DuplicateKeyError
        )

    def test_intra_batch_duplicate_raises(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        target = str(tmp_path / "warehouse")
        _write_batch(
            spark, str(src), [(1, 0, 1, "a", 1.0), (1, 1, 1, "a", 1.0)], "b1"
        )
        stream = read_events_stream(spark, str(src))
        q = run_append_stream(stream, target, str(tmp_path / "ck"), key="event_id")
        with pytest.raises(Exception) as exc_info:
            q.processAllAvailable()
        q.stop()
        assert "duplicate" in str(exc_info.value).lower()


class TestBatchStreamEquivalence:
    def test_same_function_both_modes(self, spark, tmp_path):
        """tumbling_agg over a fully-closed stream == its batch run."""
        src, ckpt = _one_batch_dirs(tmp_path)
        rows = [(i, i * 7 % 90, i % 3, "ab"[i % 2], float(i)) for i in range(30)]
        _write_batch(spark, src, rows, "b1")
        # two sentinel batches: the first advances the watermark past
        # every real window, the second realizes the emission
        _write_batch(spark, src, [(998, 10_000, 9, "z", 0.0)], "b2")
        _write_batch(spark, src, [(999, 10_001, 9, "z", 0.0)], "b3")
        stream = read_events_stream(spark, src)
        streamed = _run_to_memory(
            spark,
            tumbling_agg(stream, window="30 minutes", watermark="1 minute"),
            "equiv_out",
            ckpt,
        )
        batch_df = spark.createDataFrame(_mk_events(rows), EVENTS_SCHEMA)
        expected = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in tumbling_agg(batch_df, window="30 minutes", watermark=None).collect()
        }
        got = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in streamed.collect()
            if r.event_type != "z"
        }
        assert got == expected


class TestCustomStatefulOperator:
    def test_running_stats_accumulate_across_batches(self, spark, tmp_path):
        """applyInPandasWithState: per-user counters survive micro-batch
        boundaries in the state store and refresh on every touch."""
        from personal_health_etl_pipeline_spark.streaming.stateful import (
            running_user_stats,
        )

        src, ckpt = _one_batch_dirs(tmp_path)
        _write_batch(
            spark, src,
            [(1, 0, 1, "a", 10.0), (2, 1, 1, "a", 60.0), (3, 2, 2, "a", 70.0)],
            "b1",
        )
        _write_batch(spark, src, [(4, 3, 1, "a", 80.0)], "b2")
        stream = read_events_stream(spark, src)
        q = (
            running_user_stats(stream, high_threshold=50.0)
            .writeStream.format("memory")
            .queryName("stateful_out")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        rows = spark.sql("SELECT * FROM stateful_out").collect()
        # last emission per user carries the accumulated totals
        last = {}
        for r in rows:
            last[r.user_id] = (r.n_events, r.n_high, r.sum_value)
        assert last[1] == (3, 2, 150.0)  # both batches merged in state
        assert last[2] == (1, 1, 70.0)
        # user 1 was emitted twice (touched in both batches)
        assert sum(1 for r in rows if r.user_id == 1) == 2


class TestStreamStreamIntervalJoin:
    def test_stream_join_matches_batch(self, spark, tmp_path):
        """The watermarked stream-stream interval join over micro-batches
        must produce exactly the rows the identical function yields in
        batch over the same data."""
        from personal_health_etl_pipeline_spark.streaming.joins import interval_join

        rows = [
            # user 1: clicks at t+1,t+4; purchase at t+5 (both in 3-min window? lookback 180s)
            (1, 1, 1, "click", 1.0),
            (2, 4, 1, "click", 2.0),
            (3, 5, 1, "purchase", 10.0),
            # user 2: click too old (t+0) for purchase at t+10
            (4, 0, 2, "click", 3.0),
            (5, 10, 2, "purchase", 20.0),
            # user 3: click after purchase -> no match
            (6, 8, 3, "purchase", 30.0),
            (7, 9, 3, "click", 4.0),
        ]
        src, ckpt = _one_batch_dirs(tmp_path)
        _write_batch(spark, src, rows[:4], "b0")
        _write_batch(spark, src, rows[4:], "b1")

        def build(df):
            purchases = df.where(F.col("event_type") == "purchase").select(
                "user_id", F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("p_ts"),
            )
            clicks = df.where(F.col("event_type") == "click").select(
                "user_id", F.col("event_id").alias("click_id"),
                F.col("ts").alias("c_ts"),
            )
            return interval_join(
                purchases, clicks, on="user_id", left_ts="p_ts",
                right_ts="c_ts", lookback_seconds=180, watermark="1 minute",
            ).select("purchase_id", "click_id")

        stream = read_events_stream(spark, src)
        got = sorted(
            map(tuple, _run_to_memory(spark, build(stream), "ssj", ckpt).collect())
        )
        batch_df = spark.createDataFrame(_mk_events(rows), EVENTS_SCHEMA)
        want = sorted(map(tuple, build(batch_df).collect()))
        assert got == want
        assert want == [(3, 2)]  # only user 1's t+4 click is in window


class TestEnrichStatic:
    def test_stream_static_enrichment_matches_batch(self, spark, tmp_path):
        """Purchases enriched per micro-batch against a static profile
        must equal the same function's batch output — including stream
        rows with no profile match (left join) and a profile update
        being picked up only when re-resolved per batch."""
        from personal_health_etl_pipeline_spark.streaming.joins import enrich_static

        profile = spark.createDataFrame(
            [(1, 5, 10.0), (2, 2, 4.0)], "user_id long, n_clicks long, click_value double"
        )
        rows = [
            (1, 1, 1, "purchase", 10.0),
            (2, 2, 2, "purchase", 20.0),
            (3, 3, 9, "purchase", 30.0),  # no profile -> NULLs survive
            (4, 4, 1, "purchase", 40.0),
        ]
        src, ckpt = _one_batch_dirs(tmp_path)
        _write_batch(spark, src, rows[:2], "b0")
        _write_batch(spark, src, rows[2:], "b1")

        def build(df):
            purchases = df.where(F.col("event_type") == "purchase").select(
                "event_id", "user_id", "value"
            )
            return enrich_static(purchases, profile, on="user_id").select(
                "event_id", "user_id", "value", "n_clicks", "click_value"
            )

        stream = read_events_stream(spark, src)
        got = sorted(
            map(tuple, _run_to_memory(spark, build(stream), "ses", ckpt).collect())
        )
        batch_df = spark.createDataFrame(_mk_events(rows), EVENTS_SCHEMA)
        want = sorted(map(tuple, build(batch_df).collect()))
        assert got == want
        assert (3, 9, 30.0, None, None) in got  # unmatched row kept, NULL profile

    def test_column_collision_raises(self, spark):
        from personal_health_etl_pipeline_spark.streaming.joins import enrich_static

        a = spark.createDataFrame([(1, 2)], "user_id long, value long")
        b = spark.createDataFrame([(1, 3)], "user_id long, value long")
        with pytest.raises(ValueError, match="collision"):
            enrich_static(a, b, on="user_id")


class TestStreamStreamOuterIntervalJoin:
    def test_null_rows_emitted_after_watermark(self, spark, tmp_path):
        """LEFT-OUTER interval join: matched pairs stream out like the
        inner join; unmatched purchases surface with NULL click columns
        once the watermark proves no match can still arrive. The final
        flush purchase stays in state (its horizon never passes), so the
        streamed set is the batch answer minus still-open left rows."""
        from personal_health_etl_pipeline_spark.streaming.joins import interval_join

        rows = [
            (1, 1, 1, "click", 1.0),
            (2, 4, 1, "click", 2.0),
            (3, 5, 1, "purchase", 10.0),
            (4, 0, 2, "click", 3.0),
            (5, 10, 2, "purchase", 20.0),   # click too old -> NULL row
            (6, 8, 3, "purchase", 30.0),    # click after -> NULL row
            (7, 9, 3, "click", 4.0),
        ]
        # flushes must advance BOTH sides' watermark nodes (the global
        # watermark is the min over them), so each carries a click AND a
        # purchase
        flush1 = [(98, 600, 9, "click", 1.0), (99, 600, 9, "purchase", 1.0)]
        flush2 = [(100, 1200, 9, "click", 1.0), (101, 1200, 9, "purchase", 1.0)]
        src, ckpt = _one_batch_dirs(tmp_path)
        _write_batch(spark, src, rows[:4], "b0")
        _write_batch(spark, src, rows[4:], "b1")
        _write_batch(spark, src, flush1, "b2")
        _write_batch(spark, src, flush2, "b3")

        def build(df):
            purchases = df.where(F.col("event_type") == "purchase").select(
                "user_id", F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("p_ts"),
            )
            clicks = df.where(F.col("event_type") == "click").select(
                "user_id", F.col("event_id").alias("click_id"),
                F.col("ts").alias("c_ts"),
            )
            return interval_join(
                purchases, clicks, on="user_id", left_ts="p_ts",
                right_ts="c_ts", lookback_seconds=180, watermark="1 minute",
                how="left_outer",
            ).select("purchase_id", "click_id")

        stream = read_events_stream(spark, src)
        got = set(
            map(tuple, _run_to_memory(spark, build(stream), "ssjo", ckpt).collect())
        )
        batch_df = spark.createDataFrame(
            _mk_events(rows + flush1 + flush2), EVENTS_SCHEMA
        )
        want = set(map(tuple, build(batch_df).collect()))
        # everything streamed is batch-correct...
        assert got <= want
        # ...and every decidable row was emitted: matches + NULLs whose
        # no-match horizon the watermark passed
        assert {(3, 2), (5, None), (6, None), (99, 98)} <= got


class TestStreamingIndexProbe:
    def test_microbatch_probes_match_one_shot_batch_lookup(
        self, spark, tmp_path
    ):
        """The production incremental-dedup loop end-to-end: build the
        persisted band index ONCE (parquet, bucketed by (band_id,
        band_hash)), then stream new documents in two micro-batches;
        the union of per-batch verified pairs must equal the one-shot
        batch lookup over all new docs — same index, zero corpus
        re-sketching."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from personal_health_etl_pipeline_spark.operators.dedup import (
            minhash_index,
            minhash_lookup,
        )
        from personal_health_etl_pipeline_spark.sources.bucketed import (
            read_table,
            write_bucketed,
        )
        from personal_health_etl_pipeline_spark.sources.tables import load_table
        from personal_health_etl_pipeline_spark.streaming.probe import (
            run_probe_stream,
        )

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        new = docs.where(F.col("doc_id") % 10 == 0)
        corpus = docs.where(F.col("doc_id") % 10 != 0)
        write_bucketed(
            minhash_index(corpus, "doc_id", "text"),
            "mh_stream_index",
            ["band_id", "band_hash"],
            n_buckets=8,
        )
        stored = read_table(spark, "mh_stream_index")

        src = tmp_path / "src"
        src.mkdir()
        halves = [
            new.where(F.col("doc_id") % 20 == 0),
            new.where(F.col("doc_id") % 20 != 0),
        ]
        for i, half in enumerate(halves):
            rows = half.select("doc_id", "text").collect()
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array(
                            [r.doc_id for r in rows], pa.int64()
                        ),
                        "text": pa.array([r.text for r in rows], pa.string()),
                    }
                ),
                str(src / f"batch{i}.parquet"),
            )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)  # force 2 micro-batches
            .parquet(str(src))
        )
        sink = str(tmp_path / "pairs")
        q = run_probe_stream(
            stream, corpus, stored, sink, str(tmp_path / "ckpt")
        )
        q.processAllAvailable()
        q.stop()

        streamed = {
            (r.index_id, r.new_id, r.jaccard_sim)
            for r in spark.read.parquet(sink).collect()
        }
        one_shot = {
            (r.index_id, r.new_id, r.jaccard_sim)
            for r in minhash_lookup(
                new, corpus, "doc_id", "text", index=stored
            ).collect()
        }
        assert streamed == one_shot and streamed


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


# xfail(run=False), NOT skipif: the suite should report this GAP
# deliberately (an expected failure with its cause) rather than as a
# silent environment skip — VERDICT r8 item 7. Where protobuf exists
# the marker no-ops and the twin must pass.
@pytest.mark.xfail(
    condition=not _has_protobuf(),
    reason="transformWithState's Python worker protocol needs "
    "google.protobuf, which this container does not ship "
    "(cannot pip install; see COVERAGE.md transformWithState row)",
    run=False,
)
def test_transform_with_state_env_gated(spark, sf_dir):
    """Where protobuf exists, the transformWithStateInPandas twin must
    reproduce the batch aggregate exactly (the audit-entry contract —
    see plans/audit_surface.py:st_transform_with_state)."""
    from personal_health_etl_pipeline_spark.plans.audit_surface import (
        st_transform_with_state,
    )

    got = {r.user_id: r for r in st_transform_with_state(spark, sf_dir).collect()}
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    from personal_health_etl_pipeline_spark.plans.audit_surface import (
        ST_TWS_ORACLE,
    )

    for user_id, n_events, n_high, sum_cents in con.execute(
        ST_TWS_ORACLE
    ).fetchall():
        r = got[user_id]
        assert (r.n_events, r.n_high, r.sum_cents) == (
            n_events, n_high, sum_cents,
        )
