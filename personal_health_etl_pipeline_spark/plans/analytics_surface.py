"""Analytic-surface queries: windows, multi-dim aggregates, set ops,
boundary casts (SURVEY.md §2.4-2.6 extensions).

The reference's own aggregate surface stops at max/min/count (its wide
table *is* the aggregate); the engine exposes the full analytic layer a
health- or training-data warehouse needs — ranking/offset windows,
rollup/cube/grouping sets, intersect/except — all as single-shuffle
Catalyst plans with DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.plans.exact import d2, exact_sum, oracle_sum, od2
from personal_health_etl_pipeline_spark.sources.tables import load_table


# --- W4: ranking + offset window functions ----------------------------

def w4_rank_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event timeline: row_number, lag/lead of value, running
    exact sum — one window partitioning, zero extra shuffles."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(
            F.sum(d2("value")).over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double"),
            2,
        ).alias("running_value"),
    )


W4_ORACLE = """
SELECT user_id, event_id,
       row_number() OVER w AS rn,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- A5/A6/A7: rollup, cube, grouping sets ----------------------------

def a5_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            exact_sum(d2("l_quantity")).alias("sum_qty"),
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
        )
    )


A5_ORACLE = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       {oracle_sum(od2('l_quantity'))} AS sum_qty,
       GROUPING(l_returnflag) AS g_flag,
       GROUPING(l_linestatus) AS g_status
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def a6_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(d2("o_totalprice")).alias("sum_price"),
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_prio"),
        )
    )


A6_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       {oracle_sum(od2('o_totalprice'))} AS sum_price,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_prio
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def a7_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the engine's SQL entry point."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type, user_id % 10 AS user_bucket,
               COUNT(*) AS n_events,
               GROUPING(event_type) AS g_type
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        """
    )


A7_ORACLE = """
SELECT event_type, user_id % 10 AS user_bucket,
       COUNT(*) AS n_events,
       GROUPING(event_type) AS g_type
FROM events
GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
"""


# --- SO1: intersect / except set operations ---------------------------

def so1_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-days both present in and absent from the lineitem ship
    calendar: INTERSECT and EXCEPT branches unioned with a tag."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day")
    )
    shipped = load_table(spark, sf_dir, "lineitem").select(
        F.to_date("l_shipdate").alias("day")
    )
    both = orders.intersect(shipped).withColumn("tag", F.lit("both"))
    # exceptAll is MULTISET difference: a day with more order-rows than
    # ship-rows would survive it and land in both branches — distinct
    # the inputs first to get true set difference (SQL EXCEPT)
    only_orders = orders.distinct().exceptAll(shipped.distinct()).withColumn(
        "tag", F.lit("order_only")
    )
    return both.unionByName(only_orders)


SO1_ORACLE = """
SELECT day, 'both' AS tag FROM (
  SELECT CAST(o_orderdate AS DATE) AS day FROM orders
  INTERSECT
  SELECT CAST(l_shipdate AS DATE) AS day FROM lineitem
)
UNION ALL
SELECT day, 'order_only' AS tag FROM (
  SELECT DISTINCT day FROM (
    SELECT CAST(o_orderdate AS DATE) AS day FROM orders
    EXCEPT
    SELECT CAST(l_shipdate AS DATE) AS day FROM lineitem
  )
)
"""


# --- F2: strict string->date cast with coerce-to-null -----------------

def f2_date_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip order dates through the wire format with ~10%
    deliberately malformed values; invalid -> NULL, never failure
    (reference ``transform.py:17-22`` raises — the engine's documented
    deviation is coerce, matching its timestamp policy F3)."""
    orders = load_table(spark, sf_dir, "orders")
    wire = F.when(F.col("o_orderkey") % 10 == 7, F.lit("not-a-date")).otherwise(
        F.date_format("o_orderdate", "yyyy-MM-dd")
    )
    parsed = F.try_to_timestamp(wire, F.lit("yyyy-MM-dd")).cast("date")
    return orders.select(parsed.alias("day")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("day").alias("n_parsed"),
        F.min("day").alias("min_day"),
        F.max("day").alias("max_day"),
    )


F2_ORACLE = """
SELECT COUNT(*) AS n_rows,
       COUNT(day) AS n_parsed,
       MIN(day) AS min_day,
       MAX(day) AS max_day
FROM (
  SELECT CAST(try_strptime(
           CASE WHEN o_orderkey % 10 = 7 THEN 'not-a-date'
                ELSE strftime(o_orderdate, '%Y-%m-%d') END,
           '%Y-%m-%d') AS DATE) AS day
  FROM orders
)
"""


# --- F4: array -> JSON string at the warehouse boundary ---------------

def f4_array_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference serializes every list to a JSON string before the
    warehouse write (``transform.py:142-150``); certify byte-for-byte
    equality of the rendering on a numeric array column."""
    emb = load_table(spark, sf_dir, "embeddings")
    sliced = F.slice(
        F.transform("embedding", lambda x: F.round(x.cast("double") * 1000).cast("bigint")),
        1,
        4,
    )
    return emb.select(
        "vec_id",
        F.to_json(sliced).alias("head_json"),
        F.length(F.to_json(sliced)).alias("json_len"),
    )


F4_ORACLE = """
SELECT vec_id,
       to_json(list_transform(embedding[1:4],
               x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))) AS head_json,
       length(to_json(list_transform(embedding[1:4],
               x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)))) AS json_len
FROM embeddings
"""
