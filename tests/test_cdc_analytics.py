"""PIT feature join and sketch-cut bucketization semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.plans.analytics_surface import (
    BUCKET_N,
    a14_decile_buckets,
)
from personal_health_etl_pipeline_spark.plans.cdc_surface import (
    j11_pit_feature_join,
    m1_scd2_merge,
)


class TestPitFeatureJoin:
    def test_exactly_one_feature_row_per_order(self, spark, sf_dir):
        """Disjoint SCD intervals => the PIT join never duplicates or
        drops an order (the leakage-free feature-store contract)."""
        out = j11_pit_feature_join(spark, sf_dir).cache()
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        assert out.count() == orders.count()
        assert out.groupBy("order_id").count().filter("count > 1").count() == 0
        out.unpersist()

    def test_no_future_values(self, spark, sf_dir):
        """Every joined balance must come from an interval that had
        STARTED by the order date (valid_from <= order_date)."""
        hist = m1_scd2_merge(spark, sf_dir).select(
            "cust_id", "acctbal", "valid_from"
        )
        out = j11_pit_feature_join(spark, sf_dir)
        joined = out.join(
            hist,
            (out.cust_id == hist.cust_id)
            & (out.bal_at_order == hist.acctbal),
            "inner",
        ).filter(F.col("valid_from") > F.col("order_date"))
        # a (cust, bal) row may legitimately match several history rows;
        # what may NOT exist is an order whose ONLY providing interval
        # starts in the future — check the join-back finds a past one
        past = out.join(
            hist,
            (out.cust_id == hist.cust_id)
            & (out.bal_at_order == hist.acctbal)
            & (hist.valid_from <= out.order_date),
            "left_semi",
        )
        assert past.count() == out.count()


class TestDecileBuckets:
    def test_bucket_count_and_coverage(self, spark, sf_dir):
        out = a14_decile_buckets(spark, sf_dir).collect()
        assert 1 <= len(out) <= BUCKET_N
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        assert sum(r.n_orders for r in out) == orders.count()

    def test_buckets_are_ordered_ranges(self, spark, sf_dir):
        rows = sorted(a14_decile_buckets(spark, sf_dir).collect(),
                      key=lambda r: r.bucket)
        for lo, hi in zip(rows, rows[1:]):
            assert lo.max_price <= hi.min_price

    def test_roughly_equal_frequency(self, spark, sf_dir):
        rows = a14_decile_buckets(spark, sf_dir).collect()
        counts = [r.n_orders for r in rows]
        n = sum(counts)
        for c in counts:
            # sketch cuts from 1024 samples: each decile within ~2x of ideal
            assert c > n / (BUCKET_N * 3)
            assert c < n * 3 / BUCKET_N


def test_j18_universe_sample_rate_is_p_not_p_squared(spark, sf_dir):
    from personal_health_etl_pipeline_spark.plans.audit_surface import (
        UNIV_PCT,
        j18_universe_sample_join,
    )

    [r] = j18_universe_sample_join(spark, sf_dir).collect()
    # keyspace-consistent sampling: the join keeps ~p of results, not p^2
    assert abs(r.join_rate_micro / 1e6 - UNIV_PCT / 100) < 0.04
    # FK integrity makes every surviving lineitem find its order
    assert r.n_join_sampled == r.n_lineitem_kept


def test_a22_weighted_median_tie_groups_are_order_stable(spark, tmp_path):
    """The weighted-median filter runs on per-row cumulative weights
    whose values WITHIN a tied price group depend on arbitrary row
    order — but the aggregate only asks whether any row of a group
    passes, which is a function of the group's END cumulative weight.
    Pin that with heavy ties: prices [10 x w1, 10 x w1, 20 x w3]
    (total 5, half 2.5) -> lower weighted median is 20; and with
    [10 x w3, 20 x w2] -> 10 (the 10-group's end cumw 3 >= 2.5)."""
    import personal_health_etl_pipeline_spark.plans.analytics_surface as an
    from personal_health_etl_pipeline_spark.sources import tables

    def run(rows):
        df = spark.createDataFrame(
            [("A", p, w) for p, w in rows],
            "l_returnflag string, l_extendedprice double, l_quantity double",
        )
        d = str(tmp_path / f"li_{len(rows)}_{hash(tuple(rows)) % 997}")
        df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
        out = an.a22_weighted_median(spark, d).collect()
        return out[0].wmedian_cents

    assert run([(0.10, 1.0), (0.10, 1.0), (0.20, 3.0)]) == 20
    assert run([(0.10, 3.0), (0.20, 2.0)]) == 10


def test_w9_halfopen_boundary_sessions_do_not_overlap(spark, tmp_path):
    """Two sessions where one STARTS exactly when the other ends
    (ts2 = ts1 + 30min) must never count as concurrent — the sweep
    line orders -1 before +1 at equal timestamps (half-open
    [start, end)). A genuinely overlapping pair must count 2, and a
    midnight-crossing session must appear in both days' accounting."""
    import datetime as dt

    import personal_health_etl_pipeline_spark.plans.analytics_surface as an

    rows = [
        # day 1: back-to-back pair (no overlap) at 01:00/01:30
        (1, dt.datetime(2024, 3, 1, 1, 0, 0)),
        (2, dt.datetime(2024, 3, 1, 1, 30, 0)),
        # day 1: true overlap at 05:00/05:10
        (3, dt.datetime(2024, 3, 1, 5, 0, 0)),
        (4, dt.datetime(2024, 3, 1, 5, 10, 0)),
        # crosses midnight into day 2
        (5, dt.datetime(2024, 3, 1, 23, 50, 0)),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    d = str(tmp_path / "w9fix")
    df.write.parquet(f"{d}/events.parquet")
    got = {
        str(r.day): (r.max_concurrent, r.n_starts)
        for r in an.w9_interval_concurrency(spark, d).collect()
    }
    assert got == {
        "2024-03-01": (2, 5),  # only the 05:00/05:10 pair overlaps
        "2024-03-02": (1, 0),  # the midnight spill re-opens, no start
    }


def test_w13_session_reentry_and_strict_order(spark, tmp_path):
    """w13 semantics pinned by hand: (a) the same user converts
    independently per session (re-entry restarts the funnel), (b) a
    click BEFORE the session's first view does not convert, (c) a
    funnel does not span a >30-min gap."""
    import datetime as dt

    from personal_health_etl_pipeline_spark.plans.analytics_surface import (
        w13_sessionized_funnel,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        # user 1, session 1: full view->click->purchase conversion
        (1, s(0), 1, "view", 1.0, "{}"),
        (2, s(10), 1, "click", 1.0, "{}"),
        (3, s(20), 1, "purchase", 1.0, "{}"),
        # user 1, session 2 (2h later): view only -> stage 1 again
        (4, s(7200), 1, "view", 1.0, "{}"),
        # user 2: click BEFORE first view in the session -> stage 1
        (5, s(0), 2, "click", 1.0, "{}"),
        (6, s(10), 2, "view", 1.0, "{}"),
        # user 3: view, then >30-min gap, then click/purchase -> the
        # click lands in a session with no view: only stage-1 session
        (7, s(0), 3, "view", 1.0, "{}"),
        (8, s(3600), 3, "click", 1.0, "{}"),
        (9, s(3610), 3, "purchase", 1.0, "{}"),
    ]
    root = str(tmp_path / "w13")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{root}/events.parquet")
    got = {r.stage_reached: r for r in w13_sessionized_funnel(spark, root).collect()}
    # stage 1: u1-sess2, u2-sess1, u3-sess1 (u3-sess2 has no view ->
    # dropped entirely by the t1 IS NOT NULL filter)
    assert got[1].n_sessions == 3 and got[1].n_users == 3
    assert got[1].sum_lat2_us is None and got[1].sum_lat3_us is None
    # stage 3: u1-sess1 only; exact latencies 10s / 20s
    assert got[3].n_sessions == 1 and got[3].n_users == 1
    assert got[3].sum_lat2_us == 10_000_000
    assert got[3].sum_lat3_us == 20_000_000
    assert 2 not in got


class TestWindowedDistinctFull:
    """Full-output coverage for the w8 production twin (ADVICE-r9:
    the certified catalog entry slices 1-in-7; these tests pin every
    row of the unsliced output)."""

    def test_windowed_distinct_full_hand_computed(self, spark):
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            windowed_distinct_full,
        )

        rows = [
            # user u1: types a,a,b,a,c over a 3-event trailing window
            (1, "u1", "2024-01-01 00:00:01", "a"),
            (2, "u1", "2024-01-01 00:00:02", "a"),
            (3, "u1", "2024-01-01 00:00:03", "b"),
            (4, "u1", "2024-01-01 00:00:04", "a"),
            (5, "u1", "2024-01-01 00:00:05", "c"),
            # user u2: single event; tie on ts broken by event_id
            (6, "u2", "2024-01-01 00:00:01", "x"),
            (8, "u2", "2024-01-01 00:00:02", "y"),
            (7, "u2", "2024-01-01 00:00:02", "x"),
        ]
        events = spark.createDataFrame(
            rows, "event_id long, user_id string, ts string, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {
            r.event_id: r.n_types_3
            for r in windowed_distinct_full(events, n=3).collect()
        }
        # u1 windows: [a]=1, [a,a]=1, [a,a,b]=2, [a,b,a]=2, [b,a,c]=3
        # u2 windows (ts,event_id order => 6,7,8): [x]=1, [x,x]=1, [x,x,y]=2
        assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 1, 7: 1, 8: 2}

    def test_slice_is_exactly_the_full_output_filtered(self, spark, sf_dir):
        """The certified entry must be the production twin's rows with
        event_id % 7 == 0 — no drift between delivery and production."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            w8_windowed_distinct,
            windowed_distinct_full,
        )
        from personal_health_etl_pipeline_spark.plans.reference_surface import (
            load_table,
        )

        full = windowed_distinct_full(load_table(spark, sf_dir, "events"))
        expected = full.where(F.col("event_id") % 7 == 0)
        got = w8_windowed_distinct(spark, sf_dir)
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0


def test_w10_ppm_survives_large_partitions(spark, tmp_path):
    """Regression for the r10 sf1-drill find: rank()/row_number() are
    32-bit INT, so w10's ppm scale-up must promote to BIGINT BEFORE
    multiplying — `1000000 * rn` overflows under ANSI mode once a
    partition exceeds ~2147 rows. One event_type with 2500 surviving
    rows (> 2^31 / 1e6) reproduces the blow-up on the unfixed code."""
    import datetime as dt

    from personal_health_etl_pipeline_spark.plans.analytics_surface import (
        w10_ranking_function_sweep,
    )

    n = 2500
    rows = [
        # event_id multiples of 13 so every row survives w10's slice
        (i * 13, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i),
         1, "view", float(i % 997), "{}")
        for i in range(n)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = w10_ranking_function_sweep(spark, str(tmp_path))
    got = {r.event_id: r.cume_ppm for r in out.collect()}
    assert len(got) == n
    # full transparent simulation: rank order is (cents, event_id);
    # every rn from 1..2500 is exercised, so rows 2148..2500 — whose
    # unpromoted multiply exceeds 2^31 — are all value-checked
    order = sorted(
        ((float(i % 997) * 100, i * 13) for i in range(n))
    )
    want = {
        eid: 1_000_000 * rn // n
        for rn, (_, eid) in enumerate(order, start=1)
    }
    assert got == want
    assert max(got.values()) == 1_000_000  # rn == n survived the math
