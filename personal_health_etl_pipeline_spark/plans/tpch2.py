"""Remaining TPC-H-shaped relational flagships (Q7-Q22 adaptations).

Completes the 22-query TPC-H surface started in ``plans.tpch``. The
synthetic star schema (TESTDATA.md) lacks ``partsupp`` and the comment /
shipmode / commitdate columns, so each query keeps the *shape* (join
graph, subquery pattern, aggregation structure) of its TPC-H namesake
while substituting available columns; the point is operator coverage —
scalar subqueries, disjunctive pushdown, count-distinct, semi/anti
chains — not benchmark-spec fidelity.

Scale notes (100 TB): every query here shuffles only on high-cardinality
uniform keys (orderkey / partkey / suppkey / custkey) or tiny
enumerations (nation, year, priority); bounded dims carry ``broadcast``
hints; scalar subqueries are single-row crossed in (broadcast NLJ —
no shuffle at all); all predicates are plain column comparisons so the
parquet scan gets them pushed down.

Reference scope: the reference repo's only relational operations are the
outer-join combine and two warehouse SQL probes
(`composer_dags/dags/utils/data_sources/oura/etl/load.py:209-224,325-348`);
this module is the engine's extended analytic surface beyond that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.plans.exact import (
    cents,
    cents_sum_double,
    d2,
    exact_sum,
    exact_sum_cents,
)
from personal_health_etl_pipeline_spark.sources.tables import load_table


def _rev() -> F.Column:
    """disc_price decimal recipe (kept for scalar-subquery comparisons)."""
    return d2("l_extendedprice") * (1 - d2("l_discount"))


def _rev_c() -> F.Column:
    """disc_price as exact integer at scale 1e4 (plans.exact fast path)."""
    return cents("l_extendedprice") * (100 - cents("l_discount"))


def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral shipping volume between two nations by year.

    supplier/customer nation pairs via two broadcast dim joins; the
    disjunctive nation-pair predicate is applied post-join on broadcast
    columns (cheap), while the shipdate range is pushed to the scan.
    """
    n1 = F.broadcast(load_table(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = F.broadcast(load_table(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(exact_sum_cents(_rev_c(), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_ORACLE = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       EXTRACT(YEAR FROM l_shipdate) AS l_year,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY sn.n_name, cn.n_name, EXTRACT(YEAR FROM l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of PROMO-part revenue into ASIA,
    per order year. The share is a conditional-sum / total-sum ratio in
    a single aggregation — no second pass over the join."""
    region = F.broadcast(
        load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    )
    nation_c = F.broadcast(load_table(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    nation_s = F.broadcast(load_table(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = _rev_c()
    return (
        li.join(part.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation_c, F.col("c_nationkey") == F.col("c_nk"))
        .join(region, F.col("c_rk") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation_s, F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                cents_sum_double(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                        F.lit(0).cast("bigint")
                    ),
                    4,
                )
                / cents_sum_double(vol, 4),
                6,
            ).alias("mkt_share"),
            exact_sum_cents(vol, 4).alias("total_volume"),
        )
        .orderBy("o_year")
    )


Q8_ORACLE = """
SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
       ROUND(CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6) AS mkt_share,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS total_volume
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY EXTRACT(YEAR FROM o_orderdate)
ORDER BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation and year. partsupp's
    supplycost is absent, so cost is modeled as 60% of the part's
    retail price per unit — the join graph (lineitem x part x supplier
    x nation x orders) and per-nation-year rollup are Q9's."""
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%widget%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # integer-cents at a common 1e5 scale: e*(1-d) = e_c(100-d_c)/1e4
    # -> x10; p*0.6*q = p_c*q_c*6e4/1e9 = p_c*q_c*6/1e5 — both terms
    # exact integers over 1e5
    amount = (
        cents("l_extendedprice") * (100 - cents("l_discount")) * 10
        - cents("p_retailprice") * cents("l_quantity") * 6
    )
    return (
        li.join(part.select("p_partkey", "p_retailprice"),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(exact_sum_cents(amount, 5).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_ORACLE = """
SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.6 AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
ORDER BY nation, o_year DESC
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose inventory value exceeds a fraction of the
    global total. The global total is a 1-row aggregate crossed back in
    (broadcast nested-loop, zero shuffle) — the scalar-subquery pattern.
    Value = sum(extprice * qty) from EUROPE-nation suppliers."""
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation")
    )
    region = F.broadcast(
        load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    value = d2("l_extendedprice") * d2("l_quantity")
    per_part = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("value_dec"))
    )
    total = per_part.agg(
        (F.sum("value_dec") * F.lit(0.001).cast("decimal(8,4)")).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value_dec") > F.col("threshold"))
        .select(
            "l_partkey",
            F.round(F.col("value_dec").cast("double"), 2).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


Q11_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS value_dec
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE')
  GROUP BY l_partkey
)
SELECT l_partkey, ROUND(CAST(value_dec AS DOUBLE), 2) AS part_value
FROM per_part
WHERE value_dec > (SELECT SUM(value_dec) * CAST(0.001 AS DECIMAL(8,4)) FROM per_part)
ORDER BY part_value DESC, l_partkey
"""


def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: late-shipment counts split by order priority class.
    'Late' = shipped more than 60 days after the order date (the
    schema has no commitdate/receiptdate); grouping key is linestatus
    standing in for shipmode. One join on orderkey, one tiny rollup."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    late = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).where(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        late.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) with max quarterly revenue. The max is a
    1-row aggregate of the revenue view joined back broadcast — the
    'CREATE VIEW revenue' + scalar-max pattern without a self-join."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_c()).alias("rev_c"))
    )
    top = revenue.agg(F.max("rev_c").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(top))
        .where(F.col("rev_c") == F.col("max_rev"))  # exact integer compare
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(
                (
                    F.col("rev_c").cast("decimal(38,0)")
                    / F.lit(10**4).cast("decimal(20,0)")
                ).cast("double"),
                2,
            ).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, ROUND(CAST(rev_dec AS DOUBLE), 2) AS total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE rev_dec = (SELECT MAX(rev_dec) FROM revenue)
ORDER BY s_suppkey
"""


def q16_supplier_part_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per (brand, type, size) with
    NOT-style exclusions. lineitem stands in for partsupp as the
    part-supplier relation; the count-distinct shuffles once on the
    3-column group key."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(
            part.select("p_partkey", "p_brand", "p_type", "p_size"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue from lines whose quantity is below half the
    part's average. The correlated AVG subquery becomes a per-part
    aggregate joined back on partkey — same key, so AQE reuses the
    exchange; no row ever crosses the network twice."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    li = load_table(spark, sf_dir, "lineitem")
    branded = li.join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    avg_qty = branded.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.sum(d2("l_quantity")) / F.count("l_quantity")).alias("avg_qty")
    )
    return (
        branded.join(avg_qty, F.col("l_partkey") == F.col("a_partkey"))
        .where(d2("l_quantity") < F.col("avg_qty") * F.lit(0.5).cast("decimal(8,4)"))
        .agg(
            F.round(
                (F.sum(d2("l_extendedprice")) / F.lit(7).cast("decimal(4,1)"))
                .cast("double"),
                2,
            ).alias("avg_yearly")
        )
    )


Q17_ORACLE = """
WITH branded AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'
), avg_qty AS (
  SELECT l_partkey AS a_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) / COUNT(l_quantity) AS avg_qty
  FROM branded GROUP BY l_partkey
)
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) / CAST(7 AS DECIMAL(4,1)) AS DOUBLE), 2) AS avg_yearly
FROM branded JOIN avg_qty ON l_partkey = a_partkey
WHERE CAST(l_quantity AS DECIMAL(18,2)) < avg_qty * CAST(0.5 AS DECIMAL(8,4))
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue under three OR'd brand/size/quantity branches.
    The disjunction references both sides of the lineitem x part join,
    so it evaluates post-join; the shared conjuncts that CAN prune the
    scan (quantity and size windows) are stated separately so Catalyst
    pushes them down."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") >= 1) & (F.col("p_size") <= 35)
    )
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size") <= 15)
            & (F.col("l_quantity") <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size") <= 25)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("l_quantity") >= 20)
        )
    )
    return joined.where(branch).agg(exact_sum_cents(_rev_c(), 4).alias("revenue"))


Q19_ORACLE = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_quantity >= 1 AND l_quantity <= 30 AND p_size >= 1 AND p_size <= 35
  AND ((p_brand = 'Brand#1' AND p_size <= 15 AND l_quantity <= 11)
    OR (p_brand = 'Brand#2' AND p_size <= 25 AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#3' AND l_quantity >= 20))
"""


def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers who moved significant volume of targeted
    parts in a year — a chain of IN-subqueries rendered as aggregate ->
    filter -> semi join. Supplier payload rows never enter the shuffle;
    only the (suppkey) key set flows up the chain."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    heavy = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum(d2("l_quantity")).alias("qty"))
        .where(F.col("qty") > 250)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        supp.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


Q20_ORACLE = """
SELECT s_suppkey, s_name, n_name AS nation
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
ORDER BY s_suppkey
"""


def q21_blocking_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers whose line was the *sole* late one in a
    multi-supplier order. EXISTS(other supplier) and NOT EXISTS(other
    late supplier) are per-order countDistinct aggregates compared to
    1 — one shuffle on orderkey replaces TPC-H's double correlated
    self-join of lineitem."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)).alias("late"),
    )
    # two plain aggregations instead of the double countDistinct: the
    # multi-distinct form planned an Expand that tripled every lineitem
    # row through the shuffle; pre-aggregating to one row per
    # (order, supplier) computes the same three statistics from plain
    # count/max with map-side partial aggregation on both levels
    # (r15 interleaved A/B: 1.10 -> 0.87 s median, rows identical)
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("late_any")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.count(F.when(F.col("late_any"), F.lit(1))).alias("n_late"),
        F.max(F.when(F.col("late_any"), F.col("l_suppkey"))).alias("late_supp"),
    )
    blocking = per_order.where(
        (F.col("n_supp") > 1) & (F.col("n_late") == 1)
    ).select(F.col("late_supp").alias("bad_suppkey"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        blocking.groupBy("bad_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(supp, F.col("bad_suppkey") == F.col("s_suppkey"))
        .select("s_name", F.col("bad_suppkey").alias("s_suppkey"), "numwait")
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(20)
    )


Q21_ORACLE = """
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
         MAX(CASE WHEN late THEN l_suppkey END) AS late_supp
  FROM lines GROUP BY l_orderkey
)
SELECT s_name, late_supp AS s_suppkey, COUNT(*) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE n_supp > 1 AND n_late = 1
GROUP BY s_name, late_supp
ORDER BY numwait DESC, s_suppkey
LIMIT 20
"""


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: high-balance customers with no recent orders, rolled
    up by nation. Global avg balance = 1-row broadcast; 'no recent
    orders' = left-anti join against the date-filtered orders scan."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01")
    ).select("o_custkey")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (F.sum(d2("c_acctbal")) / F.count("c_acctbal")).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(d2("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            exact_sum(d2("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("nationkey")
    )


Q22_ORACLE = """
SELECT c_nationkey AS nationkey, COUNT(*) AS numcust,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS totacctbal
FROM customer
WHERE CAST(c_acctbal AS DECIMAL(18,2)) > (
        SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) / COUNT(c_acctbal)
        FROM customer WHERE c_acctbal > 0)
  AND c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey
ORDER BY nationkey
"""
