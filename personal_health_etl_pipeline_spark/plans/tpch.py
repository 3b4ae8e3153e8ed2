"""Flagship star-schema queries (TPC-H-shaped, adapted to TESTDATA.md).

These are the engine's headline relational plans: scan → filter → join
→ aggregate → sort, written so Catalyst gets full freedom —

* filters are plain column predicates (pushed to the parquet scan),
* bounded dims (region/nation) carry an explicit ``broadcast`` hint,
  larger dims are left to AQE's runtime broadcast decision,
* aggregates use the oracle-exact decimal recipe from ``plans.exact``.

Each function takes ``(spark, sf_dir)`` and returns a lazy DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.plans.exact import (
    cents,
    cents_sum_double,
    d2,
    exact_avg_cents,
    exact_sum_cents,
)
from personal_health_etl_pipeline_spark.sources.tables import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: the engine's flagship aggregation.

    Grouped sums/averages over lineitem with a shipdate cutoff. The
    groupBy has tiny cardinality (RF x LS = ~4 groups) so partial
    (map-side) aggregation collapses almost all rows before the single
    small shuffle — this shape scales linearly to 100 TB.

    Accumulation uses the integer-cents fast path (plans.exact): one
    long multiply-add per row in whole-stage codegen instead of
    Decimal128 arithmetic, decimal rebuilt once per group — ~3x faster
    per row, bit-identical result.
    """
    li = load_table(spark, sf_dir, "lineitem")
    q_c, e_c, d_c, t_c = (
        cents("l_quantity"),
        cents("l_extendedprice"),
        cents("l_discount"),
        cents("l_tax"),
    )
    disc_c = e_c * (100 - d_c)  # scale 1e4
    charge_c = e_c * (100 - d_c) * (100 + t_c)  # scale 1e6
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum_cents(q_c, 2).alias("sum_qty"),
            exact_sum_cents(e_c, 2).alias("sum_base_price"),
            exact_sum_cents(disc_c, 4).alias("sum_disc_price"),
            exact_sum_cents(charge_c, 6).alias("sum_charge"),
            exact_avg_cents(q_c, 2).alias("avg_qty"),
            exact_avg_cents(e_c, 2).alias("avg_price"),
            exact_avg_cents(d_c, 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS sum_disc_price,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE), 2) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity), 6) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice), 6) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def rev_cents() -> F.Column:
    """disc_price = l_extendedprice * (1 - l_discount) as an exact
    integer at scale 1e4 (see plans.exact fast path); pair with
    ``exact_sum_cents(..., 4)``."""
    return cents("l_extendedprice") * (100 - cents("l_discount"))


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped-orders revenue: segment filter -> 2 joins -> top-10.

    customer is filtered *before* the join (pushdown) and is orders of
    magnitude smaller than lineitem; AQE broadcasts it at bench scale.
    """
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15")
    )
    revenue = rev_cents()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum_cents(revenue, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


Q3_ORACLE = """
SELECT
  l_orderkey,
  o_orderdate,
  o_orderpriority,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume per nation: 6-way star join.

    region/nation are bounded dims -> explicit broadcast; the
    customer-nation = supplier-nation constraint is the classic TPC-H
    Q5 trick expressed as a plain equi-join predicate.
    """
    region = F.broadcast(
        load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = rev_cents()
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .where(cust.c_nationkey == supp.s_nationkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(exact_sum_cents(revenue, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


Q5_ORACLE = """
SELECT
  n_name,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue-change: pure scan-filter-aggregate.

    The whole query is one parquet scan with every predicate pushed
    down and a single scalar aggregate — the canonical pushdown probe.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            exact_sum_cents(
                cents("l_extendedprice") * cents("l_discount"), 4
            ).alias("revenue")
        )
    )


Q6_ORACLE = """
SELECT
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top customers by returned-item revenue (Q10 shape, top-20)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    revenue = rev_cents()
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact_sum_cents(revenue, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


Q10_ORACLE = """
SELECT
  c_custkey,
  c_name,
  c_acctbal,
  n_name,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q4_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority check (TPC-H Q4 shape, adapted): count orders per
    priority having at least one line shipped after the order date —
    an EXISTS rendered as a left-semi join on the order key. The semi
    join shuffles only (orderkey, dates); no lineitem payload moves.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    window = orders.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    late = window.join(
        li.select("l_orderkey", "l_shipdate"),
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): left outer
    join keeps order-less customers (count 0), then a second tiny
    aggregation histograms the counts. Two shuffles, both on keys with
    no skew (custkey, then the small count domain)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders.select("o_custkey", "o_orderkey"),
            customer.c_custkey == orders.o_custkey,
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q14_conditional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo-style conditional revenue share (TPC-H Q14 shape, adapted
    to the synthetic part schema: 'large' = p_size > 25). Part is a
    dimension — AQE broadcasts it; the conditional sum is one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc_c = rev_cents()
    joined = li.where(
        (F.col("l_shipdate") >= F.lit("1997-03-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    ).join(part.select("p_partkey", "p_size"), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        F.round(
            (
                cents_sum_double(
                    F.when(F.col("p_size") > 25, disc_c).otherwise(
                        F.lit(0).cast("bigint")
                    ),
                    4,
                )
                * 100.0
                / cents_sum_double(disc_c, 4)
            ),
            6,
        ).alias("large_revenue_pct"),
        exact_sum_cents(disc_c, 4).alias("total_revenue"),
    )


Q14_ORACLE = """
SELECT
  ROUND(CAST(SUM(CASE WHEN p_size > 25
        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        ELSE 0 END) AS DOUBLE) * 100.0
      / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
    6) AS large_revenue_pct,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders (TPC-H Q18 shape): HAVING-subquery as an
    aggregate + semi-join. The qty rollup shuffles on l_orderkey once;
    the order/customer joins ride the same key partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(exact_sum_cents(cents("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.to_date("o_orderdate").alias("o_day"),
            F.round(d2("o_totalprice").cast("double"), 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )


Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_day,
       ROUND(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS o_totalprice,
       total_qty
FROM (
  SELECT l_orderkey,
         ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING total_qty > 150
) JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
"""


def q2_min_price_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest-line-per-part (TPC-H Q2's correlated-min shape): the
    argmin is a single min_by/struct-min aggregation on the part key —
    no self-join against the subquery, one shuffle total."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cheapest = li.groupBy("l_partkey").agg(
        F.min(
            F.struct(
                F.round(d2("l_extendedprice").cast("double"), 2).alias("price"),
                F.col("l_suppkey").alias("supp"),
            )
        ).alias("m")
    )
    return (
        cheapest.join(part.select("p_partkey", "p_brand"),
                      F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("p_partkey"), F.col("p_brand"),
            F.col("m.price").alias("min_price"),
            F.col("m.supp").alias("supp_key"),
        )
    )


Q2_ORACLE = """
SELECT p_partkey, p_brand,
       ROUND(CAST(CAST(min_line.price AS DECIMAL(18,2)) AS DOUBLE), 2) AS min_price,
       min_line.supp AS supp_key
FROM (
  SELECT l_partkey,
         min(struct_pack(price := ROUND(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE), 2),
                         supp := l_suppkey)) AS min_line
  FROM lineitem GROUP BY l_partkey
) JOIN part ON l_partkey = p_partkey
"""
