"""Oracle-checked batch executions of the streaming window operators.

Spark's ``window``/``session_window`` aggregations are mode-agnostic:
the exact functions the streaming surface runs with watermarks
(``streaming.windows``) also execute as batch plans. Running them here
in batch against the DuckDB oracle certifies the *window semantics*
(epoch-aligned tumbling/sliding assignment, gap-merged sessions,
keyed dedup); ``tests/test_streaming.py`` separately certifies the
*streaming execution* of the same code (micro-batches, watermark
late-data drop, conflict-checked sink).

Oracle-side window math: Spark aligns time windows to the Unix epoch,
so window_start = floor(epoch_us / window_us) * window_us — rendered in
DuckDB with ``epoch_us``/``make_timestamp`` (µs-exact; events carry
microsecond timestamps). Sliding windows: each event belongs to exactly
window/slide consecutive slide-aligned windows. Session windows merge
while the next event starts strictly before last_ts + gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.plans.exact import (
    cents,
    d2,
    exact_sum_cents,
    oracle_sum,
    od2,
)
from personal_health_etl_pipeline_spark.sources.tables import load_table
from personal_health_etl_pipeline_spark.streaming.windows import (
    dedup_events,
    session_agg,
    sliding_agg,
    tumbling_agg,
)

_HOUR_US = 3_600_000_000
_SLIDE_US = 900_000_000  # 15 minutes
_GAP_S = 1800  # 30 minutes


def st_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").withColumn("value", d2("value"))
    out = tumbling_agg(events, window="1 hour", watermark=None)
    return out.withColumn("sum_value", F.round(F.col("sum_value").cast("double"), 2))


ST_TUMBLING_ORACLE = f"""
SELECT make_timestamp((epoch_us(ts) // {_HOUR_US}) * {_HOUR_US}) AS window_start,
       make_timestamp((epoch_us(ts) // {_HOUR_US}) * {_HOUR_US} + {_HOUR_US}) AS window_end,
       event_type,
       COUNT(*) AS n_events,
       {oracle_sum(od2('value'))} AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


def st_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").withColumn("value", d2("value"))
    out = sliding_agg(events, window="1 hour", slide="15 minutes", watermark=None)
    return out.withColumn("sum_value", F.round(F.col("sum_value").cast("double"), 2))


ST_SLIDING_ORACLE = f"""
WITH assigned AS (
  SELECT (epoch_us(ts) // {_SLIDE_US}) * {_SLIDE_US} - k * {_SLIDE_US} AS start_us,
         value
  FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k)
)
SELECT make_timestamp(start_us) AS window_start,
       make_timestamp(start_us + {_HOUR_US}) AS window_end,
       COUNT(*) AS n_events,
       {oracle_sum(od2('value'))} AS sum_value
FROM assigned
GROUP BY 1, 2
"""


def st_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").withColumn("value", d2("value"))
    out = session_agg(events, gap="30 minutes", watermark=None)
    return out.withColumn("sum_value", F.round(F.col("sum_value").cast("double"), 2))


ST_SESSION_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= {_GAP_S} * 1000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT user_id, ts, value,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL {_GAP_S} SECOND AS session_end,
       COUNT(*) AS n_events,
       {oracle_sum(od2('value'))} AS sum_value
FROM sessioned GROUP BY user_id, session_seq
"""


def st_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-dedup certified by doubling the input: dedup(events ∪ events)
    must reproduce per-type stats of the original (event_id is unique)."""
    events = load_table(spark, sf_dir, "events")
    doubled = events.unionAll(events)
    deduped = dedup_events(doubled, key="event_id", watermark=None)
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum_cents(cents("value"), 2).alias("sum_value"),
    )


ST_DEDUP_ORACLE = f"""
SELECT event_type, COUNT(*) AS n_events,
       {oracle_sum(od2('value'))} AS sum_value
FROM events GROUP BY event_type
"""


def st_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases joined to same-user clicks from the preceding 10
    minutes — the watermarked stream-stream interval join, executed in
    batch for the oracle. Inner-join rows only (streaming inner join
    semantics); one row per (purchase, click) pair."""
    from personal_health_etl_pipeline_spark.streaming.joins import interval_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    return (
        interval_join(
            purchases, clicks, on="user_id", left_ts="p_ts", right_ts="c_ts",
            lookback_seconds=600,
        )
        .select("purchase_id", "user_id", "click_id")
        .orderBy("purchase_id", "click_id")
    )


ST_INTERVAL_JOIN_ORACLE = """
SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 600 SECOND AND c.ts <= p.ts
ORDER BY purchase_id, click_id
"""


def st_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream interval join: every purchase appears,
    with NULL click columns when no same-user click preceded it within
    the lookback. In streaming mode Spark emits the NULL row only after
    the watermark proves no match can still arrive — the batch
    execution here (and the oracle) checks the final answer those
    delayed emissions converge to."""
    from personal_health_etl_pipeline_spark.streaming.joins import interval_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    return (
        interval_join(
            purchases, clicks, on="user_id", left_ts="p_ts", right_ts="c_ts",
            lookback_seconds=600, how="left_outer",
        )
        .select("purchase_id", "user_id", "click_id")
        .orderBy("purchase_id", "click_id")
    )


ST_INTERVAL_JOIN_OUTER_ORACLE = """
SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 600 SECOND AND c.ts <= p.ts
ORDER BY purchase_id, click_id
"""


def st_enrich_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases enriched with a static per-user click profile — the
    stream-static broadcast join (streaming/joins.py:enrich_static),
    executed in batch for the oracle. The profile is a bounded
    dimension (one row per user); the purchase stream never shuffles.
    """
    from personal_health_etl_pipeline_spark.streaming.joins import enrich_static

    ev = load_table(spark, sf_dir, "events")
    profile = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            exact_sum_cents(cents("value"), 2).alias("click_value"),
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", cents("value").alias("purchase_cents")
    )
    return (
        enrich_static(purchases, profile, on="user_id")
        .select(
            "event_id",
            "user_id",
            F.round(F.col("purchase_cents").cast("double") / 100, 2).alias(
                "purchase_value"
            ),
            F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
            "click_value",
        )
        .orderBy("event_id")
    )


ST_ENRICH_STATIC_ORACLE = """
WITH profile AS (
  SELECT user_id, COUNT(*) AS n_clicks,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id
)
SELECT p.event_id, p.user_id,
       ROUND(CAST(CAST(p.value AS DECIMAL(18,2)) AS DOUBLE), 2) AS purchase_value,
       COALESCE(pr.n_clicks, 0) AS n_clicks,
       pr.click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN profile pr ON p.user_id = pr.user_id
ORDER BY p.event_id
"""


_DAY_US = 86_400_000_000


def st_hll_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tumbling-day HLL distinct-user estimate — the streaming
    sketch twin. In streaming mode the (window, register) max-table IS
    the operator state: registers merge by max across micro-batches
    (idempotent under replay/duplication, unlike a count), the
    watermark evicts closed windows, and the estimate is emitted on
    window close. Executed here in batch with the identical
    ``hll_distinct`` body grouped by the window bounds, so the DuckDB
    oracle certifies the register math itself (Spark's own
    ``approx_count_distinct`` is engine-seeded and uncertifiable).
    """
    from personal_health_etl_pipeline_spark.plans.sketches import hll_distinct

    events = load_table(spark, sf_dir, "events")
    windowed = events.select(
        F.window("ts", "1 day").alias("w"), "user_id"
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "user_id",
    )
    return hll_distinct(windowed, group_cols=("window_start", "window_end"))


ST_HLL_WINDOW_ORACLE = f"""
WITH hashed AS (
  SELECT make_timestamp((epoch_us(ts) // {_DAY_US}) * {_DAY_US}) AS window_start,
         make_timestamp((epoch_us(ts) // {_DAY_US}) * {_DAY_US} + {_DAY_US})
             AS window_end,
         user_id,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM events
),
regs AS (
  SELECT window_start, window_end, h % 256 AS idx,
         MAX(CASE WHEN h // 256 = 0 THEN 53
                  ELSE 53 - length(bin(h // 256)) END) AS r
  FROM hashed GROUP BY window_start, window_end, idx
),
per AS (
  SELECT window_start, window_end, COUNT(*) AS n_present,
         SUM(CAST(1 AS BIGINT) << (53 - r)) AS z_hit
  FROM regs GROUP BY window_start, window_end
),
est AS (
  SELECT window_start, window_end,
         CAST(z_hit + (256 - n_present) * CAST({1 << 53} AS BIGINT) AS DOUBLE) AS z,
         256 - n_present AS zeros
  FROM per
),
ndv AS (
  SELECT window_start, window_end,
         CASE WHEN ((0.7213 / (1.0 + 1.079 / 256)) * 65536.0 * {1 << 53}.0) / z
                   <= 640.0 AND zeros > 0
              THEN 256.0 * ln(256.0 / CAST(zeros AS DOUBLE))
              ELSE ((0.7213 / (1.0 + 1.079 / 256)) * 65536.0 * {1 << 53}.0) / z
         END AS e
  FROM est
)
SELECT n.window_start, n.window_end,
       CAST(round(n.e, 0) AS BIGINT) AS est_ndv, x.exact_ndv
FROM ndv n JOIN (
  SELECT make_timestamp((epoch_us(ts) // {_DAY_US}) * {_DAY_US}) AS window_start,
         COUNT(DISTINCT user_id) AS exact_ndv
  FROM events GROUP BY 1
) x USING (window_start)
ORDER BY n.window_start
"""


TRENDING_K = 3


def st_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tumbling-day top-k "trending" users by exact summed value —
    the streaming leaderboard shape (in streaming mode: windowed
    aggregation state + per-window rank emitted on watermark close;
    executed here in batch so the oracle certifies the window+rank
    semantics). The rank window partitions by the time window, so at
    scale each window's leaderboard is one partition's work — no
    global sort.
    """
    events = load_table(spark, sf_dir, "events")
    per = (
        events.select(
            F.window("ts", "1 day").alias("w"), "user_id", cents("value").alias("vc")
        )
        .groupBy(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "user_id",
        )
        .agg(F.sum("vc").alias("sum_vc"), F.count(F.lit(1)).alias("n_events"))
    )
    win = Window.partitionBy("window_start").orderBy(
        F.col("sum_vc").desc(), "user_id"
    )
    from personal_health_etl_pipeline_spark.plans.exact import cents_to_double

    return (
        per.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= TRENDING_K)
        .select(
            "window_start",
            "window_end",
            "rank",
            "user_id",
            F.round(cents_to_double(F.col("sum_vc"), 2), 2).alias("sum_value"),
            "n_events",
        )
        .orderBy("window_start", "rank")
    )


ST_TOPK_TRENDING_ORACLE = f"""
WITH per AS (
  SELECT make_timestamp((epoch_us(ts) // {_DAY_US}) * {_DAY_US}) AS window_start,
         make_timestamp((epoch_us(ts) // {_DAY_US}) * {_DAY_US} + {_DAY_US})
             AS window_end,
         user_id,
         {oracle_sum(od2('value'))} AS sum_value,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY window_start
                               ORDER BY sum_value DESC, user_id) AS rank
  FROM per
)
SELECT window_start, window_end, rank, user_id, sum_value, n_events
FROM ranked WHERE rank <= {TRENDING_K}
ORDER BY window_start, rank
"""


# --- late-data / watermark audit ----------------------------------------

WATERMARK_DELAY_US = 3_600_000_000  # 1 hour, in epoch microseconds


def st_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTIFY the watermark contract instead of just obeying it: per
    event type, how many events would a 1-hour watermark drop, and how
    far past it does the stream's tail reach? An event is late when
    its timestamp is more than the delay behind the maximum timestamp
    already seen on its stream — here per event type, with arrival
    order = event_id (the fixture's ingestion counter; a real deploy
    reads a Kafka offset). The number every pipeline needs BEFORE
    picking a delay: this audit over yesterday's batch is how you tune
    tomorrow's watermark.

    One window pass (running max per type, arrival-ordered) + one
    aggregate; integer microsecond arithmetic end-to-end, so the
    lateness quantiles can't drift."""
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy("event_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    lat = (
        events.select(
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
        )
        .withColumn("seen_max", F.max("ts_us").over(w))
        .withColumn(
            "late_us",
            F.greatest(
                F.coalesce(F.col("seen_max") - F.col("ts_us"), F.lit(0)),
                F.lit(0),
            ),
        )
    )
    return (
        lat.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("late_us") > WATERMARK_DELAY_US, 1).otherwise(0)
            ).cast("bigint").alias("n_dropped_1h"),
            F.max("late_us").alias("max_late_us"),
        )
        .orderBy("event_type")
    )


ST_LATE_DATA_ORACLE = f"""
WITH lat AS (
  SELECT event_type, event_id,
         GREATEST(COALESCE(
             MAX(epoch_us(ts)) OVER (PARTITION BY event_type
                                     ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING)
             - epoch_us(ts), 0), 0) AS late_us
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN late_us > {WATERMARK_DELAY_US} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped_1h,
       CAST(MAX(late_us) AS BIGINT) AS max_late_us
FROM lat GROUP BY event_type ORDER BY event_type
"""
