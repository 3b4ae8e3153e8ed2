"""CDC surface: SCD-2 merge and snapshot-diff catalog entries.

Deterministic fixtures built from the star schema (no randomness, no
clock): the customer table is the day-0 dimension snapshot, each
customer's latest order plays the CDC update record, and two modulus
slices of orders play two table versions. Oracles unroll the same joins
in ANSI SQL so the driver's value-hash gate covers the full merged
history / delta, not just row counts.

All money math follows ``plans/exact.py``: cast the 2-dp doubles to
DECIMAL(18,2), do exact decimal arithmetic, cast the result back to
double — bit-identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.operators.merge import (
    scd2_merge,
    scd2_merge_cdc,
    snapshot_diff,
)
from personal_health_etl_pipeline_spark.plans.exact import d2
from personal_health_etl_pipeline_spark.sources.tables import load_table


# --- M1: SCD-2 merge --------------------------------------------------

def m1_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-0 customer dimension + one CDC batch (each customer's latest
    order re-states their balance) -> full SCD-2 history.

    Exercises every merge class: changed keys close + reopen, keys whose
    restated balance happens to equal the snapshot stay untouched, and
    customers with no orders pass through. One hash-partitioning of the
    dimension by ``cust_id`` serves the change-detect join, the close
    join and the anti-join (AQE broadcasts the update batch when small).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim = cust.select(
        F.col("c_custkey").alias("cust_id"),
        d2("c_acctbal").cast("double").alias("acctbal"),
        F.to_date(F.lit("1992-01-01")).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    upd = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("cust_id"),
            d2("o_totalprice").cast("double").alias("acctbal"),
            F.col("o_orderdate").cast("date").alias("eff_date"),
        )
    )
    return scd2_merge(dim, upd, key="cust_id", attrs=["acctbal"])


M1_ORACLE = """
WITH dim AS (
  SELECT c_custkey AS cust_id,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
         DATE '1992-01-01' AS valid_from,
         CAST(NULL AS DATE) AS valid_to,
         TRUE AS is_current
  FROM customer
), upd AS (
  SELECT o_custkey AS cust_id,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
         CAST(o_orderdate AS DATE) AS eff_date
  FROM (
    SELECT *, row_number() OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
), changed AS (
  SELECT u.* FROM upd u
  LEFT JOIN dim d ON u.cust_id = d.cust_id AND d.is_current
  WHERE d.cust_id IS NULL OR u.acctbal IS DISTINCT FROM d.acctbal
)
SELECT d.cust_id, d.acctbal, d.valid_from,
       c.eff_date AS valid_to, FALSE AS is_current
FROM dim d JOIN changed c ON d.cust_id = c.cust_id
WHERE d.is_current
UNION ALL
SELECT d.* FROM dim d
WHERE d.is_current
  AND NOT EXISTS (SELECT 1 FROM changed c WHERE c.cust_id = d.cust_id)
UNION ALL
SELECT c.cust_id, c.acctbal, c.eff_date AS valid_from,
       CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
FROM changed c
"""


# --- M2: snapshot diff ------------------------------------------------

def m2_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic versions of the orders table -> CDC delta.

    old = orders minus every 97th key; new = orders minus every 101st
    key, with every 89th key's price restated +10% (exact decimal) —
    so the delta contains all three change classes. One full-outer
    shuffle join on the key; bucket both versions by the key to make
    it shuffle-free at scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        d2("o_totalprice").alias("price_dec"),
    )
    old = base.filter(F.col("order_id") % 97 != 0).select(
        "order_id", "status", F.col("price_dec").cast("double").alias("price")
    )
    new = base.filter(F.col("order_id") % 101 != 0).select(
        "order_id",
        "status",
        F.when(
            F.col("order_id") % 89 == 0,
            F.round(F.col("price_dec") * F.lit(1.1).cast("decimal(2,1)"), 2),
        )
        .otherwise(F.col("price_dec"))
        .cast("double")
        .alias("price"),
    )
    return snapshot_diff(old, new, key="order_id", compare=["status", "price"])


M2_ORACLE = """
WITH old AS (
  SELECT o_orderkey AS order_id, o_orderstatus AS status,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 97 <> 0
), new AS (
  SELECT o_orderkey AS order_id, o_orderstatus AS status,
         CAST(CASE WHEN o_orderkey % 89 = 0
              THEN ROUND(CAST(o_totalprice AS DECIMAL(18,2))
                         * CAST(1.1 AS DECIMAL(2,1)), 2)
              ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 101 <> 0
)
SELECT COALESCE(o.order_id, n.order_id) AS order_id,
       CASE WHEN o.order_id IS NULL THEN 'added'
            WHEN n.order_id IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type,
       o.status AS old_status, o.price AS old_price,
       n.status AS new_status, n.price AS new_price
FROM old o FULL OUTER JOIN new n ON o.order_id = n.order_id
WHERE o.order_id IS NULL OR n.order_id IS NULL
   OR o.status IS DISTINCT FROM n.status
   OR o.price IS DISTINCT FROM n.price
"""


# --- J11: point-in-time feature join ----------------------------------

def j11_pit_feature_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store PIT join: every order reads the customer balance
    that was VALID AT its order date from the SCD-2 history that
    ``m1_scd2_merge`` produces — the no-future-leakage join that
    training-data generation needs (a feature row may never come from
    after the label event).

    Because SCD-2 validity intervals are disjoint per key, the interval
    predicate rides a plain equi-join on ``cust_id`` (at most one match
    per order) — one shuffle, no range-join machinery needed. Half-open
    semantics: an order ON the effective date sees the NEW value.
    """
    hist = m1_scd2_merge(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("cust_id"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )
    cond = (F.col("valid_from") <= F.col("order_date")) & (
        F.col("valid_to").isNull() | (F.col("order_date") < F.col("valid_to"))
    )
    return (
        orders.join(hist, on="cust_id", how="inner")
        .filter(cond)
        .select(
            "order_id",
            "cust_id",
            "order_date",
            F.col("acctbal").alias("bal_at_order"),
        )
    )


J11_ORACLE = f"""
SELECT o.o_orderkey AS order_id,
       o.o_custkey AS cust_id,
       CAST(o.o_orderdate AS DATE) AS order_date,
       h.acctbal AS bal_at_order
FROM orders o
JOIN ({M1_ORACLE}) h
  ON o.o_custkey = h.cust_id
 AND h.valid_from <= CAST(o.o_orderdate AS DATE)
 AND (h.valid_to IS NULL OR CAST(o.o_orderdate AS DATE) < h.valid_to)
"""


# --- M3: CDC merge with DELETES ----------------------------------------

def m3_scd2_delete_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full CDC op-code path (``operators/merge.py:scd2_merge_cdc``):
    each customer's latest order either RESTATES their balance
    (``op='upsert'``) or CLOSES their account (``op='delete'``, every
    5th order key) — deletes end the open row at the effective date
    without a successor, so the dimension keeps the row's full
    lifespan instead of physically forgetting it. Same single
    key-partitioned join plan as ``m1`` plus one equi-join on the
    bounded delete key set."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim = cust.select(
        F.col("c_custkey").alias("cust_id"),
        d2("c_acctbal").cast("double").alias("acctbal"),
        F.to_date(F.lit("1992-01-01")).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    upd = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("cust_id"),
            d2("o_totalprice").cast("double").alias("acctbal"),
            F.col("o_orderdate").cast("date").alias("eff_date"),
            F.when(F.col("o_orderkey") % 5 == 0, F.lit("delete"))
            .otherwise(F.lit("upsert"))
            .alias("op"),
        )
    )
    return scd2_merge_cdc(dim, upd, key="cust_id", attrs=["acctbal"])


M3_ORACLE = """
WITH dim AS (
  SELECT c_custkey AS cust_id,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
         DATE '1992-01-01' AS valid_from,
         CAST(NULL AS DATE) AS valid_to,
         TRUE AS is_current
  FROM customer
), upd AS (
  SELECT o_custkey AS cust_id,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
         CAST(o_orderdate AS DATE) AS eff_date,
         CASE WHEN o_orderkey % 5 = 0 THEN 'delete' ELSE 'upsert' END AS op
  FROM (
    SELECT *, row_number() OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
), ups AS (SELECT cust_id, acctbal, eff_date FROM upd WHERE op = 'upsert'),
dels AS (SELECT cust_id, eff_date FROM upd WHERE op = 'delete'),
changed AS (
  SELECT u.* FROM ups u
  LEFT JOIN dim d ON u.cust_id = d.cust_id AND d.is_current
  WHERE d.cust_id IS NULL OR u.acctbal IS DISTINCT FROM d.acctbal
)
-- closed by change
SELECT d.cust_id, d.acctbal, d.valid_from,
       c.eff_date AS valid_to, FALSE AS is_current
FROM dim d JOIN changed c ON d.cust_id = c.cust_id
WHERE d.is_current
UNION ALL
-- closed by delete (open rows only; change-closed keys can't also be
-- deleted in the same batch: one op per key)
SELECT d.cust_id, d.acctbal, d.valid_from,
       x.eff_date AS valid_to, FALSE AS is_current
FROM dim d JOIN dels x ON d.cust_id = x.cust_id
WHERE d.is_current
UNION ALL
-- untouched opens
SELECT d.* FROM dim d
WHERE d.is_current
  AND NOT EXISTS (SELECT 1 FROM changed c WHERE c.cust_id = d.cust_id)
  AND NOT EXISTS (SELECT 1 FROM dels x WHERE x.cust_id = d.cust_id)
UNION ALL
-- reopened by upsert
SELECT c.cust_id, c.acctbal, c.eff_date AS valid_from,
       CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
FROM changed c
"""


# --- M4: incremental aggregate maintenance ----------------------------

def m4_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-aggregate maintenance: the daily revenue rollup is
    kept as mergeable PARTIAL state (count, exact cents sum, min/max)
    and a late-arriving delta batch folds in WITHOUT rescanning the
    base — union the two partial-state frames, re-aggregate on the
    key. At 100 TB this is the difference between an incremental ETL
    tick (delta-sized scan + key-partitioned merge) and a full
    recompute; every state component is an algebraic (commutative,
    associative) aggregate, so merge order can't change a bit. The
    base/delta split is a deterministic modulus slice of orders; the
    certified output equals the from-scratch aggregate over the whole
    table — which is exactly what the oracle computes, so the hash
    gate proves merge(base, delta) == recompute(all).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        "o_orderkey",
    )
    base = orders.where(F.col("o_orderkey") % 10 != 0)
    delta = orders.where(F.col("o_orderkey") % 10 == 0)

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("day").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )

    merged = (
        partial(base)
        .unionByName(partial(delta))
        .groupBy("day")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
    )
    return merged.orderBy("day")


M4_ORACLE = """
SELECT CAST(o_orderdate AS DATE) AS day,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       MIN(CAST(round(o_totalprice * 100) AS BIGINT)) AS min_cents,
       MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_cents
FROM orders
GROUP BY 1 ORDER BY day
"""
