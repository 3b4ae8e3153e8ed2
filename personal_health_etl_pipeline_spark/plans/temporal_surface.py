"""Catalog queries for the temporal join operators (operators.temporal).

Both run over the ``events`` fixture table (10k rows / 150 users at
sf0.01; (user_id, ts) is unique so as-of matches are deterministic).
DuckDB verifies them natively: ASOF JOIN for j4, a plain inequality
join for j5 — the Spark side instead uses the shuffle-safe
compositions, which is the whole point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.operators.temporal import asof_join, range_join
from personal_health_etl_pipeline_spark.sources.tables import load_table


def j4_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the user's most recent click at-or-before it
    (backward as-of join); purchases with no prior click keep NULLs."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="click_ts",
        direction="backward", right_prefix="",
    )
    return joined.select(
        "event_id",
        "user_id",
        "click_event_id",
        F.round("click_value", 2).alias("click_value"),
    ).orderBy("event_id")


J4_ORACLE = """
SELECT p.event_id, p.user_id, c.event_id AS click_event_id,
       ROUND(c.value, 2) AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""


def j5_views_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Views in the hour before each purchase: banded range join
    (bucket width = band width, so each view lands in at most 2 bucket
    rows) aggregated per purchase, left-joined back so zero-view
    purchases survive with count 0."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("lo"),
        F.col("ts").alias("hi"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts"), F.col("event_id").alias("view_id")
    )
    matched = range_join(
        views, purchases, on="user_id",
        point_ts="view_ts", lower_ts="lo", upper_ts="hi",
        bucket_width_seconds=3600, closed="left",
    )
    counts = matched.groupBy("purchase_id").agg(
        F.count("view_id").alias("n_views"),
        F.max("view_id").alias("last_view_id"),
    )
    return (
        purchases.join(counts, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            F.coalesce("n_views", F.lit(0)).alias("n_views"),
            "last_view_id",
        )
        .orderBy("purchase_id")
    )


J5_ORACLE = """
SELECT p.event_id AS purchase_id, p.user_id,
       COUNT(v.event_id) AS n_views,
       MAX(v.event_id) AS last_view_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON v.user_id = p.user_id
 AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
GROUP BY p.event_id, p.user_id
ORDER BY purchase_id
"""
