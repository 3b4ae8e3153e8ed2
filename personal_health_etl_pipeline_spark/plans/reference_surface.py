"""Reference-surface operators as oracle-checked queries (SURVEY.md §2).

Every operator class the reference performs — filters/projections (P*),
joins (J*), aggregations (A*), windows (W*), scalar functions (F*) and
schema alignment (C*) — expressed over the synthetic star schema so the
driver's DuckDB differential covers it. Each Spark path routes through
the *actual engine library function* (flatten, prefix_columns,
combine_on_key, conflicting_keys, new_keys, align_to_schema, ...), not
a re-inlined copy, so the gate certifies the library itself.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from personal_health_etl_pipeline_spark.functions.casts import to_timestamp_coerce
from personal_health_etl_pipeline_spark.functions.flatten import flatten, prefix_columns
from personal_health_etl_pipeline_spark.operators.combine import combine_on_key
from personal_health_etl_pipeline_spark.operators.conflict import conflicting_keys
from personal_health_etl_pipeline_spark.operators.incremental import (
    half_open_range,
    new_keys,
)
from personal_health_etl_pipeline_spark.plans.exact import (
    cents,
    cents_to_double,
    exact_sum_cents,
)
from personal_health_etl_pipeline_spark.schema import align_to_schema
from personal_health_etl_pipeline_spark.sources.tables import load_table


# --- P1: required-field filter (reference transform.py:68-75) --------

def p1_required_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.where(
        F.col("text").isNotNull() & (F.length("text") >= 100)
    ).select("doc_id", "lang", "n_chars")


P1_ORACLE = """
SELECT doc_id, lang, n_chars FROM documents
WHERE text IS NOT NULL AND length(text) >= 100
"""


# --- P2: half-open date-range filter (reference load.py:286-288) -----

def p2_halfopen_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        half_open_range("l_shipdate", "1997-01-01", "1997-02-01")
    ).select("l_orderkey", "l_linenumber", "l_shipdate")


P2_ORACLE = """
SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
"""


# --- P3: column namespace prefixing (reference transform.py:80-89) ---

def p3_prefix_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    return prefix_columns(nation, "nation", exclude=("n_nationkey",))


P3_ORACLE = """
SELECT n_nationkey,
       n_name AS nation__n_name,
       n_regionkey AS nation__n_regionkey
FROM nation
"""


# --- P4: distinct-day projection (reference load.py:209-224) ---------

def p4_distinct_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(F.to_date("o_orderdate").alias("day")).distinct()


P4_ORACLE = "SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders"


# --- P5: existence probe (reference load.py:325-348) ------------------

def p5_exists_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    probe = orders.where(F.to_date("o_orderdate") == F.lit("1997-03-15"))
    return probe.agg(
        F.count(F.lit(1)).alias("cnt"),
        (F.count(F.lit(1)) > 0).alias("does_exist"),
    )


P5_ORACLE = """
SELECT COUNT(*) AS cnt, COUNT(*) > 0 AS does_exist
FROM orders WHERE CAST(o_orderdate AS DATE) = DATE '1997-03-15'
"""


# --- P6: new-key set difference / anti-join (transform.py:183-190) ---

def p6_new_dates_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "lineitem").select(
        F.to_date("l_shipdate").alias("day")
    )
    existing = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day")
    )
    return new_keys(raw, existing, key="day")


P6_ORACLE = """
SELECT DISTINCT CAST(l_shipdate AS DATE) AS day FROM lineitem
WHERE CAST(l_shipdate AS DATE) NOT IN (SELECT CAST(o_orderdate AS DATE) FROM orders)
"""


# --- J1: multi-way full-outer combine (transform.py:130-140) ----------

def j1_multiway_outer_combine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type daily frames folded into one wide row per day —
    the reference's signature transform, on the events fixture."""
    events = load_table(spark, sf_dir, "events")
    types = ["click", "purchase", "error"]
    frames = []
    for t in types:
        daily = (
            events.where(F.col("event_type") == t)
            .groupBy(F.to_date("ts").alias("day"))
            .agg(
                exact_sum_cents(cents("value"), 2).alias("sum_value"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        frames.append(prefix_columns(daily, t, exclude=("day",)))
    return combine_on_key(frames, key="day")


J1_ORACLE = """
WITH per_type AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value,
         COUNT(*) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
)
SELECT day,
       c.sum_value AS click__sum_value, c.n AS click__n,
       p.sum_value AS purchase__sum_value, p.n AS purchase__n,
       e.sum_value AS error__sum_value, e.n AS error__n
FROM      (SELECT * FROM per_type WHERE event_type = 'click') c
FULL JOIN (SELECT * FROM per_type WHERE event_type = 'purchase') p USING (day)
FULL JOIN (SELECT * FROM per_type WHERE event_type = 'error') e USING (day)
"""


# --- J9: the reference's signature END-TO-END transform ----------------

def j9_oura_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole daily transform as ONE certified pipeline:
    per-data-type NESTED records -> recursive struct flatten (F1) ->
    prefix namespace (P3) -> multi-way full-outer combine (J1) ->
    schema alignment with null-fill + declared-type casts (C3/C5) —
    `transform.py:38-140` + `load.py:105-181` composed, not one-by-one.

    The Oura-shaped nested input is derived deterministically from the
    shared events table (one record per (type, day) with a nested
    contributors struct), so the DuckDB oracle rebuilds the identical
    records with struct_pack and flattens them by field access.
    """
    from personal_health_etl_pipeline_spark.schema import (
        struct_from_json_schema,
    )

    events = load_table(spark, sf_dir, "events")
    types = ["click", "purchase", "error"]
    frames = []
    for t in types:
        nested = (
            events.where(F.col("event_type") == t)
            .groupBy(F.to_date("ts").alias("day"))
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.countDistinct("user_id").alias("_u"),
            )
            .select(
                "day",
                F.col("_n").alias("score"),
                F.struct(
                    F.col("_u").alias("deep_sleep"),
                    (F.col("_n") - F.col("_u")).alias("efficiency"),
                ).alias("contributors"),
            )
        )
        flat = flatten(nested)  # contributors -> contributors__* (F1)
        frames.append(prefix_columns(flat, t, exclude=("day",)))  # P3
    wide = combine_on_key(frames, key="day")  # J1
    target = struct_from_json_schema(
        [{"name": "day", "type": "DATE", "mode": "REQUIRED"}]
        + [
            {"name": f"{t}{suffix}", "type": "INT64"}
            for t in types
            for suffix in (
                "__score",
                "__contributors__deep_sleep",
                "__contributors__efficiency",
            )
        ]
        # declared in the warehouse schema but produced by no source:
        # align null-fills it (C3), typed
        + [{"name": "ingest_note", "type": "STRING"}]
    )
    return align_to_schema(wide, target)  # C3 + C5


J9_ORACLE = """
WITH per AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         COUNT(*) AS score,
         struct_pack(
           deep_sleep := COUNT(DISTINCT user_id),
           efficiency := COUNT(*) - COUNT(DISTINCT user_id)
         ) AS contributors
  FROM events GROUP BY event_type, CAST(ts AS DATE)
)
SELECT day,
       c.score AS click__score,
       c.contributors.deep_sleep AS click__contributors__deep_sleep,
       c.contributors.efficiency AS click__contributors__efficiency,
       p.score AS purchase__score,
       p.contributors.deep_sleep AS purchase__contributors__deep_sleep,
       p.contributors.efficiency AS purchase__contributors__efficiency,
       e.score AS error__score,
       e.contributors.deep_sleep AS error__contributors__deep_sleep,
       e.contributors.efficiency AS error__contributors__efficiency,
       CAST(NULL AS VARCHAR) AS ingest_note
FROM      (SELECT * FROM per WHERE event_type = 'click') c
FULL JOIN (SELECT * FROM per WHERE event_type = 'purchase') p USING (day)
FULL JOIN (SELECT * FROM per WHERE event_type = 'error') e USING (day)
"""


# --- J7: salted join (skew mitigation under the hash gate) -------------

def j7_salted_user_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dimension enrichment through the SALTED join path
    (operators/skew.py): the events fact scatters each key across salt
    buckets, the customer dim explodes across all of them, the join
    runs on (key, salt) and the salt is dropped — so the certified
    result is bit-identical to the plain join the oracle runs, while
    the physical plan spreads a pathological hot key over
    ``salt_buckets`` tasks instead of one straggler."""
    from personal_health_etl_pipeline_spark.operators.skew import salted_join

    events = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        "c_mktsegment",
        "c_acctbal",
    )
    return (
        salted_join(events, dim, on="user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum_cents(cents("value"), 2).alias("sum_value"),
        )
        .orderBy("c_mktsegment")
    )


J7_ORACLE = """
SELECT c_mktsegment,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --- J10: Bloom-prefiltered semi-join (runtime-filter pattern) ---------

def j10_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective order set -> 1-row Bloom bit array -> map-side probe
    prefilter -> exact semi-join on the ~2% survivors
    (operators/runtime_filter.py). The certified result is provably the
    plain semi-join (Bloom filters have no false negatives and an exact
    join runs on the survivors), so the oracle is ordinary SQL; what
    the operator changes is WHERE the probe rows die — before the
    shuffle, in the scan stage, exactly like Spark's own
    runtime bloomFilter rewrite."""
    from personal_health_etl_pipeline_spark.operators.runtime_filter import (
        bloom_semi_join,
    )

    li = load_table(spark, sf_dir, "lineitem")
    build = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 250000.0)
        )
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return (
        bloom_semi_join(li, build, key="l_orderkey")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            exact_sum_cents(cents("l_extendedprice"), 2).alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


J10_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS n_items,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
           AS sum_price
FROM lineitem
WHERE l_orderkey IN (
    SELECT o_orderkey FROM orders
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 250000.0)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- J2: range-overlap join (reference load.py:266) --------------------

def j2_range_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval x interval overlap: per-user activity windows joined
    against per-event-type windows. Non-equi join -> Spark picks a
    broadcast nested-loop; at scale this would be bucketed by time."""
    events = load_table(spark, sf_dir, "events")
    user_win = events.groupBy("user_id").agg(
        F.min("ts").alias("u_start"), F.max("ts").alias("u_end")
    )
    type_win = events.groupBy("event_type").agg(
        F.min("ts").alias("t_start"), F.max("ts").alias("t_end")
    )
    overlap = (F.col("u_end") >= F.col("t_start")) & (
        F.col("u_start") <= F.col("t_end")
    )
    return (
        user_win.join(F.broadcast(type_win), overlap)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_overlapping_types"))
    )


J2_ORACLE = """
WITH u AS (SELECT user_id, MIN(ts) AS u_start, MAX(ts) AS u_end FROM events GROUP BY user_id),
     t AS (SELECT event_type, MIN(ts) AS t_start, MAX(ts) AS t_end FROM events GROUP BY event_type)
SELECT user_id, COUNT(*) AS n_overlapping_types
FROM u JOIN t ON u.u_end >= t.t_start AND u.u_start <= t.t_end
GROUP BY user_id
"""


# --- J3: duplicate-key conflict detection (load.py:277-302) ------------

def j3_duplicate_day_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    per_day = events.select(F.to_date("ts").alias("day"))
    return conflicting_keys(per_day, key="day")


J3_ORACLE = """
SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_records
FROM events GROUP BY CAST(ts AS DATE) HAVING COUNT(*) > 1
"""


# --- A1/A2: watermark aggregates (extract.py:172-174, transform.py:177-196)

def a1_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    day = F.to_date("l_shipdate")
    empty_side = F.when(F.col("l_quantity") < 0, day)  # always-empty branch
    return li.agg(
        F.max(day).alias("watermark"),
        F.coalesce(F.max(empty_side), F.lit(dt.date(1970, 1, 1))).alias(
            "watermark_empty_default"
        ),
        F.min(day).alias("min_new_date"),
    )


A1_ORACLE = """
SELECT MAX(CAST(l_shipdate AS DATE)) AS watermark,
       COALESCE(MAX(CASE WHEN l_quantity < 0 THEN CAST(l_shipdate AS DATE) END),
                DATE '1970-01-01') AS watermark_empty_default,
       MIN(CAST(l_shipdate AS DATE)) AS min_new_date
FROM lineitem
"""


# --- A3: count / count-distinct probes ---------------------------------

def a3_count_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.to_date("ts")).alias("n_days"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
    )


A3_ORACLE = """
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT event_type) AS n_types
FROM events
"""


# --- A4: set-union accumulation (extract.py:144-145) -------------------

def a4_union_distinct_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day")
    )
    ships = load_table(spark, sf_dir, "lineitem").select(
        F.to_date("l_shipdate").alias("day")
    )
    return orders.union(ships).distinct()


A4_ORACLE = """
SELECT CAST(o_orderdate AS DATE) AS day FROM orders
UNION
SELECT CAST(l_shipdate AS DATE) AS day FROM lineitem
"""


# --- W1: rolling 7-day average (SURVEY §2.5 analytic surface) ----------

def w1_rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue + 7-day rolling mean. The rolling mean is computed
    as exact-decimal rolling sum / count so it is oracle-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.where(half_open_range("l_shipdate", "1997-01-01", "1997-07-01"))
        .groupBy(F.to_date("l_shipdate").alias("day"))
        .agg(
            F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).alias(
                "_rev_c"
            )
        )
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        F.round(cents_to_double(F.col("_rev_c"), 4), 2).alias("revenue"),
        F.round(
            cents_to_double(F.sum("_rev_c").over(w), 4) / F.count(F.lit(1)).over(w),
            6,
        ).alias("rolling_avg_7d"),
    ).orderBy("day")


W1_ORACLE = """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS day,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS _rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
  GROUP BY CAST(l_shipdate AS DATE)
)
SELECT day,
       ROUND(CAST(_rev AS DOUBLE), 2) AS revenue,
       ROUND(CAST(SUM(_rev) OVER w AS DOUBLE)
             / COUNT(*) OVER w, 6) AS rolling_avg_7d
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY day
"""


# --- W2: ranked top-k per group ----------------------------------------

def w2_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("c_nationkey", "rk", "c_custkey", "c_name", "c_acctbal")
    )


W2_ORACLE = """
SELECT c_nationkey, rk, c_custkey, c_name, c_acctbal FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey) AS rk
  FROM customer
) WHERE rk <= 3
"""


# --- W3: gap-based sessionization (batch form of session windows) ------

SESSION_GAP_MIN = 30


def w3_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each user's event stream into sessions at >30-min gaps —
    the batch (window-function) twin of streaming session_window."""
    events = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_user)
    with_start = events.withColumn(
        "is_start",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0),
    )
    sessioned = with_start.withColumn(
        "session_seq", F.sum("is_start").over(by_user)
    )
    return (
        sessioned.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


W3_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT user_id, ts,
         CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sessioned GROUP BY user_id, session_seq
"""


# --- F3: timestamp parse with coerce (transform.py:107-111) -------------

def f3_timestamp_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip orders through the reference's wire format
    '%Y-%m-%dT%H:%M:%S.%f%z'; ~10% of rows deliberately malformed ->
    NULL (never failure), matching pandas errors='coerce'."""
    orders = load_table(spark, sf_dir, "orders")
    wire = F.when(
        F.col("o_orderkey") % 10 == 0, F.col("o_orderpriority")
    ).otherwise(
        F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS+00:00")
    )
    parsed = to_timestamp_coerce(wire)
    return orders.select(parsed.alias("parsed_ts")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("parsed_ts").alias("n_parsed"),
        F.min("parsed_ts").alias("min_ts"),
        F.max("parsed_ts").alias("max_ts"),
    )


F3_ORACLE = """
WITH wire AS (
  SELECT CASE WHEN o_orderkey % 10 = 0 THEN o_orderpriority
              ELSE strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%f+00:00') END AS s
  FROM orders
)
SELECT COUNT(*) AS n_rows,
       COUNT(CAST(try_strptime(s, '%Y-%m-%dT%H:%M:%S.%f%z') AS TIMESTAMP)) AS n_parsed,
       MIN(CAST(try_strptime(s, '%Y-%m-%dT%H:%M:%S.%f%z') AS TIMESTAMP)) AS min_ts,
       MAX(CAST(try_strptime(s, '%Y-%m-%dT%H:%M:%S.%f%z') AS TIMESTAMP)) AS max_ts
FROM wire
"""


# --- F5: date-range materialization (extract.py:140-147) ----------------

def f5_date_range_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequence+explode a calendar month, left-join per-day order counts
    (zero-filled) — the engine form of the reference's day-step loops."""
    orders = load_table(spark, sf_dir, "orders")
    cal = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(dt.date(1997, 1, 1)),
                F.lit(dt.date(1997, 1, 31)),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )
    per_day = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        cal.join(per_day, "day", "left")
        .select("day", F.coalesce("n", F.lit(0)).alias("n_orders"))
        .orderBy("day")
    )


F5_ORACLE = """
WITH cal AS (
  SELECT CAST(unnest(generate_series(DATE '1997-01-01', DATE '1997-01-31',
                                     INTERVAL 1 DAY)) AS DATE) AS day
),
per_day AS (
  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
)
SELECT cal.day, COALESCE(per_day.n, 0) AS n_orders
FROM cal LEFT JOIN per_day USING (day)
ORDER BY cal.day
"""


# --- F6/F7: path templating + regexp date extraction (load.py:51-55,262)

RANGE_RE = r"(\d{4}-\d{2}-\d{2})_(\d{4}-\d{2}-\d{2})"


def f6_path_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render the reference's raw-zone path template from data, then
    regexp-extract the range back out — format/parse parity check."""
    events = load_table(spark, sf_dir, "events")
    ranges = events.groupBy("event_type").agg(
        F.to_date(F.min("ts")).alias("start_date"),
        F.to_date(F.max("ts")).alias("end_date"),
    )
    path = F.concat(
        F.lit("raw/oura/"),
        F.col("event_type"),
        F.lit("/"),
        F.col("start_date").cast("string"),
        F.lit("_"),
        F.col("end_date").cast("string"),
        F.lit("/data.json"),
    )
    return ranges.select(
        F.col("event_type").alias("data_type"),
        path.alias("path"),
        F.regexp_extract(path, RANGE_RE, 1).alias("extracted_start"),
        F.regexp_extract(path, RANGE_RE, 2).alias("extracted_end"),
    )


F6_ORACLE = rf"""
WITH ranges AS (
  SELECT event_type, CAST(MIN(ts) AS DATE) AS start_date,
         CAST(MAX(ts) AS DATE) AS end_date
  FROM events GROUP BY event_type
),
paths AS (
  SELECT event_type,
         'raw/oura/' || event_type || '/' || CAST(start_date AS VARCHAR)
           || '_' || CAST(end_date AS VARCHAR) || '/data.json' AS path
  FROM ranges
)
SELECT event_type AS data_type, path,
       regexp_extract(path, '(\d{{4}}-\d{{2}}-\d{{2}})_(\d{{4}}-\d{{2}}-\d{{2}})', 1) AS extracted_start,
       regexp_extract(path, '(\d{{4}}-\d{{2}}-\d{{2}})_(\d{{4}}-\d{{2}}-\d{{2}})', 2) AS extracted_end
FROM paths
"""


# --- F8: JSON field extraction (load.py:280-281) -------------------------

def f8_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        events.groupBy("event_type")
        .agg(
            F.sum(k).alias("sum_k"),
            F.count(k).alias("n_k"),
        )
        .orderBy("event_type")
    )


F8_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- F1: struct flatten as a query (transform.py:38-52) ------------------

def f1_flatten_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build nested structs from events, flatten with the engine's
    flatten(), aggregate the flat columns — proves flattening is a pure
    projection with no value drift."""
    events = load_table(spark, sf_dir, "events")
    nested = events.select(
        F.col("event_id"),
        F.struct(
            F.col("user_id").alias("user"),
            F.struct(
                F.col("value").alias("v"),
                F.col("event_type").alias("t"),
            ).alias("metrics"),
        ).alias("payload"),
    )
    flat = flatten(nested)  # payload__user, payload__metrics__v, payload__metrics__t
    return (
        flat.groupBy(F.col("payload__metrics__t").alias("event_type"))
        .agg(
            F.countDistinct("payload__user").alias("n_users"),
            exact_sum_cents(cents(F.col("payload__metrics__v")), 2).alias("sum_value"),
        )
        .orderBy("event_type")
    )


F1_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- C3/C5: schema alignment as a query (load.py:178-181) ----------------

DOCS_TARGET = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("n_chars", LongType()),
        StructField("quality", DoubleType()),  # absent from source -> NULL
    ]
)


def c3_schema_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return align_to_schema(docs, DOCS_TARGET)


C3_ORACLE = """
SELECT doc_id, lang, n_chars, CAST(NULL AS DOUBLE) AS quality FROM documents
"""


# --- J13: heartrate SPECIAL chunked extraction end-to-end (S2/S4) -------

J13_START = dt.date(2024, 1, 1)
J13_END = dt.date(2024, 1, 30)


def j13_heartrate_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The heartrate SPECIAL path (``sources/registry.py``: 7-day
    chunked range fetch, reference ``extract.py:133-149,184``) driven
    END-TO-END over a fixed 30-day window: 5 chunk fetches union into
    one plan, flattened to scalars. The oracle recomputes every record
    independently per day from the fixture's sha256 arithmetic (DuckDB
    ``sha256`` == hashlib), so hash equality certifies the chunk
    windows tile the range exactly — no overlapping day fetched twice,
    no boundary day dropped — which is the chunking property S4's
    chunked==unchunked test asserts, now under the driver's gate.
    ``sf_dir`` is unused: this certifies the SOURCE layer, whose
    fixture is synthesized from (data_type, day) alone."""
    from personal_health_etl_pipeline_spark.sources.registry import (
        extract_data_type,
    )

    raw = extract_data_type(spark, "heartrate", J13_START, J13_END)
    return raw.select(
        "id",
        "day",
        "score",
        F.col("contributors.deep_sleep").alias("deep_sleep"),
        F.col("contributors.efficiency").alias("efficiency"),
        F.col("contributors.latency").alias("latency"),
        F.col("timestamp").alias("wire_ts"),
    ).orderBy("day")


def src_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME chunked heartrate extraction as ``j13``, but planned
    through the Python DataSource API (``sources/datasource.py``):
    ``spark.read.format("oura_fixture")`` with one input partition per
    7-day chunk, records synthesized executor-side inside the scan —
    no driver materialization, no union-of-frames plan. Hash equality
    against j13's oracle certifies that the DataSource planning path
    (partitions() tiling + per-partition read()) produces exactly the
    chunked-extract semantics; a plan test asserts the scan really
    carries one partition per chunk. ``sf_dir`` unused (source-layer
    certification)."""
    from personal_health_etl_pipeline_spark.sources.datasource import (
        register,
    )

    register(spark)
    raw = (
        spark.read.format("oura_fixture")
        .option("data_type", "heartrate")
        .option("start", J13_START.isoformat())
        .option("end", J13_END.isoformat())
        .option("chunk_days", "7")
        .load()
    )
    return raw.select(
        "id",
        "day",
        "score",
        F.col("contributors.deep_sleep").alias("deep_sleep"),
        F.col("contributors.efficiency").alias("efficiency"),
        F.col("contributors.latency").alias("latency"),
        F.col("timestamp").alias("wire_ts"),
    ).orderBy("day")


J13_ORACLE = f"""
WITH days AS (
  SELECT CAST(d AS DATE) AS day
  FROM generate_series(DATE '{J13_START.isoformat()}',
                       DATE '{J13_END.isoformat()}',
                       INTERVAL 1 DAY) t(d)
),
h AS (
  SELECT strftime(day, '%Y-%m-%d') AS day_s,
         CAST(('0x' || substr(
             sha256('heartrate|' || strftime(day, '%Y-%m-%d') || '|rec'),
             1, 16)) AS UBIGINT) AS h
  FROM days
)
SELECT 'heartrate-' || day_s AS id,
       day_s AS day,
       CAST(40 + h % 60 AS BIGINT) AS score,
       CAST(h % 100 AS BIGINT) AS deep_sleep,
       CAST((h // 100) % 100 AS BIGINT) AS efficiency,
       CAST((h // 10000) % 100 AS BIGINT) AS latency,
       day_s || 'T04:00:00.' || lpad(CAST(h % 1000000 AS VARCHAR), 6, '0')
           || '+00:00' AS wire_ts
FROM h ORDER BY day_s
"""


# --- F9/F10: scalar-function sweeps (string / datetime breadth) ---------

def f9_string_function_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One certified pass over the string/math scalar surface the
    engines share: length, case, substring, reverse, lpad, concat_ws,
    Levenshtein distance, sqrt/ceil and sign — each column a function
    family, all hash-checked at once. Breadth certification for §2.6:
    any engine-vs-oracle divergence in these scalars (collation, edit
    distance definition, rounding) surfaces as a value mismatch."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.where(F.col("doc_id") % 7 == 0)
        .select(
            "doc_id",
            F.length("text").alias("text_len"),
            F.upper(F.substring("text", 1, 3)).alias("up3"),
            F.reverse("lang").alias("rev_lang"),
            F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
            F.levenshtein("lang", "source").alias("lev_lang_source"),
            F.concat_ws("|", "lang", "source").alias("tagged"),
            F.ceil(F.sqrt(F.col("n_chars").cast("double")))
            .cast("bigint")
            .alias("sqrt_ceil_chars"),
            F.signum(F.col("n_chars").cast("double") - 500.0)
            .cast("bigint")
            .alias("sign_vs_500"),
        )
        .orderBy("doc_id")
    )


F9_ORACLE = """
SELECT doc_id,
       length(text) AS text_len,
       upper(substring(text, 1, 3)) AS up3,
       reverse(lang) AS rev_lang,
       lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
       levenshtein(lang, source) AS lev_lang_source,
       concat_ws('|', lang, source) AS tagged,
       CAST(ceil(sqrt(CAST(n_chars AS DOUBLE))) AS BIGINT)
           AS sqrt_ceil_chars,
       CAST(sign(CAST(n_chars AS DOUBLE) - 500.0) AS BIGINT) AS sign_vs_500
FROM documents WHERE doc_id % 7 = 0
ORDER BY doc_id
"""


def f10_datetime_function_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The datetime scalar surface, certified: ISO week fields, quarter,
    week truncation (Monday-aligned in both engines), month-end,
    month arithmetic, day difference from a fixed epoch, and the
    hour/minute accessors. The calendar is where engines silently
    disagree (week-of-year conventions, truncation anchors, DST
    handling — moot here, sessions run UTC); a hash match pins every
    convention at once."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.where(F.col("event_id") % 37 == 0)
        .select(
            "event_id",
            F.dayofyear("ts").alias("doy"),
            F.weekofyear("ts").cast("int").alias("iso_week"),
            F.quarter("ts").alias("qtr"),
            F.date_trunc("week", "ts").cast("date").alias("week_start"),
            F.last_day(F.to_date("ts")).alias("month_end"),
            F.add_months(F.to_date("ts"), 2).alias("plus2m"),
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).cast(
                "int"
            ).alias("days_since_y24"),
            F.hour("ts").alias("hh"),
            F.minute("ts").alias("mm"),
        )
        .orderBy("event_id")
    )


F10_ORACLE = """
SELECT event_id,
       CAST(dayofyear(ts) AS INT) AS doy,
       CAST(weekofyear(ts) AS INT) AS iso_week,
       CAST(quarter(ts) AS INT) AS qtr,
       CAST(date_trunc('week', ts) AS DATE) AS week_start,
       last_day(CAST(ts AS DATE)) AS month_end,
       CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
       CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS INT) AS days_since_y24,
       CAST(hour(ts) AS INT) AS hh,
       CAST(minute(ts) AS INT) AS mm
FROM events WHERE event_id % 37 = 0
ORDER BY event_id
"""


# --- F11: NULL-semantics sweep ------------------------------------------

def f11_null_semantics_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL conventions, certified: ``nullif``/``coalesce`` round
    trips, null-safe equality (Spark ``<=>`` vs SQL ``IS NOT DISTINCT
    FROM``), ``COUNT(col)`` vs ``COUNT(*)`` under injected NULLs,
    NULL-propagating concatenation, and aggregate NULL-skipping.
    NULL handling is where engines silently diverge (three-valued
    logic in filters, concat conventions, count semantics); this pins
    the engine's behavior to the oracle's per language group."""
    docs = load_table(spark, sf_dir, "documents")
    nl = F.nullif(F.col("lang"), F.lit("en"))
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(nl).alias("n_lang_not_en"),
            F.sum(
                F.when(nl.eqNullSafe(F.nullif(F.col("source"), F.lit("web"))), 1)
                .otherwise(0)
            ).cast("bigint").alias("n_nullsafe_eq"),
            F.min(F.coalesce(nl, F.lit("~was-en"))).alias("min_coalesced"),
            F.sum(
                F.when(F.concat(nl, F.col("source")).isNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_null_concat"),
            F.sum(F.length(nl)).cast("bigint").alias("sum_len_skipnull"),
        )
        .orderBy("lang")
    )


F11_ORACLE = """
SELECT lang,
       COUNT(*) AS n_rows,
       COUNT(nullif(lang, 'en')) AS n_lang_not_en,
       CAST(SUM(CASE WHEN nullif(lang, 'en') IS NOT DISTINCT FROM
                          nullif(source, 'web') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_nullsafe_eq,
       MIN(COALESCE(nullif(lang, 'en'), '~was-en')) AS min_coalesced,
       CAST(SUM(CASE WHEN nullif(lang, 'en') || source IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_null_concat,
       CAST(SUM(length(nullif(lang, 'en'))) AS BIGINT) AS sum_len_skipnull
FROM documents GROUP BY lang ORDER BY lang
"""


# --- F12: collection-function breadth sweep -----------------------------

def f12_collection_function_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array/collection scalar surface, certified in one pass over
    the tokenized documents (sibling of the f9/f10/f11 sweeps): size,
    order-sensitive first/last access, array_sort + element access,
    reverse, slice + array_join, array_contains, array_position
    (1-based in BOTH engines), array_distinct cardinality, and an
    aggregate-over-array fold (total characters via ``aggregate``).
    Collection functions are where engines quietly diverge (0- vs
    1-based indexing, NULL-vs-empty slices, sort stability); one value
    hash pins every convention at once. Scalar-only output (parity
    gate forbids top-level arrays)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.expr(r"filter(split(text, '\\s+'), x -> x <> '')")
    return (
        docs.where(F.col("doc_id") % 13 == 0)
        .select("doc_id", t.alias("t"))
        .where(F.size("t") >= 3)
        .select(
            "doc_id",
            F.size("t").alias("n_toks"),
            F.element_at("t", 1).alias("first_tok"),
            F.element_at("t", -1).alias("last_tok"),
            F.element_at(F.array_sort("t"), 1).alias("min_tok"),
            F.element_at(F.reverse(F.array_sort("t")), 1).alias("max_tok"),
            F.array_join(F.slice("t", 1, 3), "|").alias("head3"),
            F.array_contains("t", "the").alias("has_the"),
            F.expr("array_position(t, t[0])").cast("int").alias("pos_of_first"),
            F.size(F.array_distinct("t")).alias("n_distinct"),
            F.expr(
                "aggregate(t, 0L, (acc, x) -> acc + length(x))"
            ).alias("total_chars"),
        )
        .orderBy("doc_id")
    )


F12_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents WHERE doc_id % 13 = 0
)
SELECT doc_id,
       len(t) AS n_toks,
       t[1] AS first_tok,
       t[-1] AS last_tok,
       list_sort(t)[1] AS min_tok,
       list_reverse(list_sort(t))[1] AS max_tok,
       array_to_string(t[1:3], '|') AS head3,
       list_contains(t, 'the') AS has_the,
       CAST(list_indexof(t, t[1]) AS INTEGER) AS pos_of_first,
       len(list_distinct(t)) AS n_distinct,
       CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT)
           AS total_chars
FROM toks WHERE len(t) >= 3 ORDER BY doc_id
"""


# --- F13: bitwise-function breadth sweep --------------------------------

def f13_bitwise_function_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bitwise scalar + aggregate surface in one pass over events:
    shifts, AND/OR/XOR, popcount, and the ``bit_or``/``bit_and``
    aggregates (the machinery under Bloom filters, HLL registers and
    the z-order interleave — certified directly here, not only through
    those composites). Registered in the catalog TAIL (r7 window)."""
    events = load_table(spark, sf_dir, "events")
    masked = events.where(F.col("event_id") % 17 == 0).select(
        "event_type",
        "event_id",
        F.col("user_id").cast("bigint").alias("u"),
    )
    return (
        masked.select(
            "event_type",
            "event_id",
            F.shiftleft(F.col("u"), 3).alias("shl3"),
            F.shiftright(F.col("event_id"), 2).alias("shr2"),
            (F.col("u").bitwiseAND(F.lit(255))).alias("low8"),
            (F.col("u").bitwiseOR(F.col("event_id"))).alias("ored"),
            (F.col("u").bitwiseXOR(F.col("event_id"))).alias("xored"),
            F.bit_count(F.col("u")).cast("int").alias("popcount"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("shl3").alias("sum_shl3"),
            F.sum("shr2").alias("sum_shr2"),
            F.bit_or("low8").alias("or_low8"),
            F.bit_and("ored").alias("and_ored"),
            F.sum("xored").alias("sum_xored"),
            F.sum("popcount").cast("bigint").alias("sum_popcount"),
        )
        .orderBy("event_type")
    )


F13_ORACLE = """
WITH m AS (
  SELECT event_type, event_id, CAST(user_id AS BIGINT) AS u
  FROM events WHERE event_id % 17 = 0
),
b AS (
  SELECT event_type,
         u << 3 AS shl3,
         event_id >> 2 AS shr2,
         u & 255 AS low8,
         u | event_id AS ored,
         xor(u, event_id) AS xored,
         CAST(bit_count(u) AS INTEGER) AS popcount
  FROM m
)
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(shl3) AS BIGINT) AS sum_shl3,
       CAST(SUM(shr2) AS BIGINT) AS sum_shr2,
       CAST(bit_or(low8) AS BIGINT) AS or_low8,
       CAST(bit_and(ored) AS BIGINT) AS and_ored,
       CAST(SUM(xored) AS BIGINT) AS sum_xored,
       CAST(SUM(popcount) AS BIGINT) AS sum_popcount
FROM b GROUP BY event_type ORDER BY event_type
"""


def f14_lambda_function_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order-function surface in one pass over events:
    ``exists`` / ``forall`` / ``filter`` / ``zip_with`` / indexed
    ``transform`` / ``aggregate`` over per-row arrays — the lambda
    machinery the dedup shingles, PQ distance tables and audio windows
    are built from, certified directly (f12 covered the collection
    accessors; this pins the LAMBDA evaluation conventions: 0-based
    transform index, boolean exists/forall semantics, fold order).
    Registered in the catalog TAIL (r7 window)."""
    events = load_table(spark, sf_dir, "events")
    m = events.where(F.col("event_id") % 13 == 0).select(
        "event_type",
        F.col("event_id").alias("eid"),
        F.col("user_id").cast("bigint").alias("u"),
    )
    a = F.array(
        F.col("u") % 10,
        (F.col("u") / F.lit(10)).cast("bigint") % 10,
        F.col("eid") % 10,
        (F.col("eid") / F.lit(10)).cast("bigint") % 10,
    )
    b = F.array(
        F.col("eid") % 7,
        F.col("u") % 7,
        (F.col("u") + F.col("eid")) % 7,
        F.lit(3).cast("bigint"),
    )
    per_row = m.select(
        "event_type",
        F.exists(a, lambda x: x > 5).cast("int").alias("has_gt5"),
        F.forall(a, lambda x: x < 8).cast("int").alias("all_lt8"),
        F.size(F.filter(a, lambda x: x % 2 == 0)).alias("n_even"),
        F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("dot"),
        F.aggregate(
            F.transform(a, lambda x, i: x * (i + 1)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("wsum"),
    )
    return (
        per_row.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("has_gt5").alias("n_has_gt5"),
            F.sum("all_lt8").alias("n_all_lt8"),
            F.sum("n_even").alias("sum_n_even"),
            F.sum("dot").alias("sum_dot"),
            F.sum("wsum").alias("sum_wsum"),
        )
        .orderBy("event_type")
    )


F14_ORACLE = """
WITH m AS (
  SELECT event_type, event_id AS eid, CAST(user_id AS BIGINT) AS u
  FROM events WHERE event_id % 13 = 0
),
arrs AS (
  SELECT event_type,
         [u % 10, (u // 10) % 10, eid % 10, (eid // 10) % 10] AS a,
         [eid % 7, u % 7, (u + eid) % 7, CAST(3 AS BIGINT)] AS b
  FROM m
),
per_row AS (
  SELECT event_type,
         CASE WHEN len(list_filter(a, x -> x > 5)) > 0 THEN 1 ELSE 0 END
             AS has_gt5,
         CASE WHEN len(list_filter(a, x -> NOT (x < 8))) = 0 THEN 1 ELSE 0 END
             AS all_lt8,
         len(list_filter(a, x -> x % 2 = 0)) AS n_even,
         list_sum(list_transform(range(1, 5),
             i -> a[CAST(i AS INT)] * b[CAST(i AS INT)])) AS dot,
         list_sum(list_transform(range(1, 5),
             i -> a[CAST(i AS INT)] * i)) AS wsum
  FROM arrs
)
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(has_gt5) AS BIGINT) AS n_has_gt5,
       CAST(SUM(all_lt8) AS BIGINT) AS n_all_lt8,
       CAST(SUM(n_even) AS BIGINT) AS sum_n_even,
       CAST(SUM(dot) AS BIGINT) AS sum_dot,
       CAST(SUM(wsum) AS BIGINT) AS sum_wsum
FROM per_row GROUP BY event_type ORDER BY event_type
"""


def f15_url_parse_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing + domain-level curation rollup — the web-corpus ops
    (host extraction, per-domain doc counts, query-param reads) over
    deterministically constructed URLs, so Spark's ``parse_url``
    conventions (HOST / PATH / QUERY key lookup) are pinned against a
    regexp re-derivation. Per source-host: docs, distinct langs seen in
    the ``lang`` query param, and total path length — the shape of a
    domain blocklist / quota pass in a crawl pipeline. Registered in
    the catalog TAIL (r7 window)."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.format_string(
        "https://%s.example.com/docs/%d?lang=%s&v=2",
        F.col("source"),
        F.col("doc_id"),
        F.col("lang"),
    )
    parsed = docs.select(
        F.col("doc_id"),
        url.alias("url"),
    ).select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
    )
    return (
        parsed.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("q_lang").alias("n_langs"),
            F.sum(F.length("path")).alias("sum_path_len"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("host")
    )


F15_ORACLE = r"""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
           || '?lang=' || lang || '&v=2' AS url
  FROM documents
),
parsed AS (
  SELECT doc_id,
         regexp_extract(url, 'https?://([^/]+)', 1) AS host,
         regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1) AS path,
         regexp_extract(url, '[?&]lang=([^&]*)', 1) AS q_lang
  FROM u
)
SELECT host,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT q_lang) AS n_langs,
       CAST(SUM(length(path)) AS BIGINT) AS sum_path_len,
       MIN(doc_id) AS min_doc_id
FROM parsed GROUP BY host ORDER BY host
"""


# --- F17: map-function breadth sweep ------------------------------------

def f17_map_function_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MAP-type scalar surface in one pass (sibling of the f9-f14
    sweeps): per document, a token->count map built row-locally with
    ``map_from_arrays``, then exercised through ``map_keys``,
    ``map_entries`` (argmax fold over entries), ``map_filter``,
    ``transform_values``, ``map_concat`` and map ``element_at``. Map
    key order is engine-internal, so the entry never emits a raw map —
    every output is a derived scalar, and the oracle recomputes each
    one from the token list relationally (unnest + group), pinning the
    map semantics against an independent formulation. The per-row
    count build is O(k^2) in distinct tokens, bounded by slicing to
    the first 24 tokens — map construction conventions are the point
    here, not throughput. Registered in the catalog TAIL (r7
    certification window)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.expr(
        r"slice(filter(split(text, '\\s+'), x -> x <> ''), 1, 24)"
    )
    base = (
        docs.where(F.col("doc_id") % 11 == 0)
        .select("doc_id", t.alias("t"))
        .where(F.size("t") >= 3)
    )
    built = base.select(
        "doc_id",
        F.size("t").alias("n_toks"),
        F.expr(
            "map_from_arrays(array_distinct(t), "
            "transform(array_distinct(t), x -> size(filter(t, y -> y = x))))"
        ).alias("m"),
    )
    top = F.expr(
        "aggregate(map_entries(m), "
        "cast(null as struct<key:string,value:int>), "
        "(acc, e) -> case when acc is null or e.value > acc.value "
        "or (e.value = acc.value and e.key < acc.key) then e else acc end)"
    )
    return (
        built.select(
            "doc_id",
            "n_toks",
            F.size(F.map_keys(F.col("m"))).alias("n_keys"),
            top["key"].alias("mode_tok"),
            top["value"].cast("bigint").alias("mode_count"),
            F.size(
                F.expr("map_filter(m, (k, v) -> v = 1)")
            ).alias("n_singletons"),
            F.element_at(
                F.expr("transform_values(m, (k, v) -> v * 2)"),
                top["key"],
            ).cast("bigint").alias("mode_count_doubled"),
            F.element_at(
                F.expr("map_concat(m, map('__total__', n_toks))"),
                F.lit("__total__"),
            ).cast("bigint").alias("total_via_concat"),
            F.substring(
                F.array_join(F.array_sort(F.map_keys(F.col("m"))), ","),
                1,
                40,
            ).alias("keys_sig"),
        )
        .orderBy("doc_id")
    )


F17_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')[1:24]
             AS t
  FROM documents WHERE doc_id % 11 = 0
),
base AS (SELECT doc_id, t FROM toks WHERE len(t) >= 3),
flat AS (
  SELECT b.doc_id, u.tok
  FROM base b, UNNEST(b.t) AS u(tok)
),
counts AS (
  SELECT doc_id, tok, COUNT(*) AS cnt FROM flat GROUP BY 1, 2
),
modes AS (
  SELECT doc_id, tok AS mode_tok, cnt AS mode_count,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY cnt DESC, tok) AS rn
  FROM counts
),
stats AS (
  SELECT doc_id,
         COUNT(*) AS n_keys,
         CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS INT)
             AS n_singletons,
         substring(string_agg(tok, ',' ORDER BY tok), 1, 40) AS keys_sig
  FROM counts GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.t) AS INT) AS n_toks,
       CAST(s.n_keys AS INT) AS n_keys,
       m.mode_tok,
       CAST(m.mode_count AS BIGINT) AS mode_count,
       s.n_singletons,
       CAST(m.mode_count * 2 AS BIGINT) AS mode_count_doubled,
       CAST(len(b.t) AS BIGINT) AS total_via_concat,
       s.keys_sig
FROM base b
JOIN modes m ON m.doc_id = b.doc_id AND m.rn = 1
JOIN stats s ON s.doc_id = b.doc_id
ORDER BY b.doc_id
"""


# --- UDTF: table-valued Python function (SURVEY §2.9) --------------------

def udtf_token_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of each document's token stream through a
    PYTHON UDTF (``@udtf(useArrow=True)``) — the one Python-extension
    shape the §2.9 surface had not certified: mapInPandas/applyInPandas
    emit frames per batch/group; a UDTF is a per-row TABLE-VALUED
    function (variable rows out per row in) composable in SQL via
    LATERAL. The UDTF is Arrow-batched, stateless per row, and runs on
    a bounded doc subset sliced to 60 tokens — API-surface
    certification, not a hot path (the JVM way to RLE is the
    gaps-and-islands window, which is exactly what the DuckDB oracle
    uses, so the hash gate cross-checks the two formulations). At
    100 TB the same UDTF distributes per partition with no shuffle:
    rows in, runs out, map-side."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="start_pos int, tok string, run_len int", useArrow=True)
    class TokenRuns:
        def eval(self, doc_id: int, toks: list):
            if not toks:
                return
            start, prev, n = 1, toks[0], 1
            for i, t in enumerate(toks[1:], start=2):
                if t == prev:
                    n += 1
                else:
                    yield (start, prev, n)
                    start, prev, n = i, t, 1
            yield (start, prev, n)

    spark.udtf.register("token_runs", TokenRuns)
    docs = load_table(spark, sf_dir, "documents")
    docs.where(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.expr(
            r"slice(filter(split(text, '\\s+'), x -> x <> ''), 1, 60)"
        ).alias("t"),
    ).createOrReplaceTempView("udtf_token_base")
    return spark.sql(
        """
        SELECT b.doc_id, r.start_pos, r.tok, CAST(r.run_len AS BIGINT)
                   AS run_len
        FROM udtf_token_base b, LATERAL token_runs(b.doc_id, b.t) r
        ORDER BY b.doc_id, r.start_pos
        """
    )


UDTF_TOKEN_RUNS_ORACLE = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')[1:60]
             AS t
  FROM documents WHERE doc_id % 7 = 0
),
flat AS (
  SELECT b.doc_id, b.t[r.i] AS tok, CAST(r.i AS INT) AS pos
  FROM base b, UNNEST(range(1, len(b.t) + 1)) AS r(i)
),
islands AS (
  SELECT doc_id, tok, pos,
         pos - row_number() OVER (PARTITION BY doc_id, tok
                                  ORDER BY pos) AS grp
  FROM flat
)
SELECT doc_id, CAST(MIN(pos) AS INT) AS start_pos, tok,
       COUNT(*) AS run_len
FROM islands GROUP BY doc_id, tok, grp
ORDER BY doc_id, start_pos
"""


# --- F19: error-safe (try_*) arithmetic conventions ----------------------

def f19_error_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI-safety surface in one pass: ``try_divide`` (by zero and
    by NULL), ``try_multiply`` (BIGINT overflow), ``try_cast``
    (malformed string), ``try_element_at`` (out-of-range index) — the
    functions that turn per-row arithmetic faults into NULLs instead
    of job-killing exceptions, which is the only sane failure mode
    when one poisoned row out of 10^11 must not abort a 100 TB scan.
    DuckDB's conventions line up value-for-value (``/0`` -> NULL,
    out-of-range list index -> NULL, TRY_CAST -> NULL) except integer
    overflow, which DuckDB raises — the oracle re-derives that column
    from the planted modulus instead. The good-path division is one
    IEEE op on exact integers, so it hash-matches bitwise."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 997 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias(
                "price_cents"
            ),
            F.expr("CAST(round(l_quantity) AS BIGINT)").alias("qty"),
        )
    )
    wire = F.when(
        F.col("l_orderkey") % 3 == 0, F.lit("not-a-number")
    ).otherwise(F.col("l_orderkey").cast("string"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide("price_cents", F.col("qty") - F.col("qty")).alias(
            "div_by_zero"
        ),
        F.try_divide("price_cents", F.lit(None).cast("bigint")).alias(
            "div_by_null"
        ),
        F.try_divide("price_cents", "qty").alias("unit_price"),
        F.try_multiply(
            F.lit(9_223_372_036_854_775_807),
            F.when(F.col("l_linenumber") % 2 == 0, F.lit(2)).otherwise(
                F.lit(1)
            ),
        ).alias("maybe_overflow"),
        wire.try_cast("bigint").alias("parsed_key"),
        F.try_element_at(
            F.array("l_linenumber"), F.lit(3).cast("int")
        ).alias("oob_element"),
    ).orderBy("l_orderkey", "l_linenumber")


F19_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(round(l_extendedprice * 100) AS BIGINT) / 0 AS div_by_zero,
       CAST(round(l_extendedprice * 100) AS BIGINT) / CAST(NULL AS BIGINT)
           AS div_by_null,
       CAST(round(l_extendedprice * 100) AS BIGINT)
           / CAST(round(l_quantity) AS BIGINT) AS unit_price,
       CASE WHEN l_linenumber % 2 = 0 THEN CAST(NULL AS BIGINT)
            ELSE CAST(9223372036854775807 AS BIGINT) END AS maybe_overflow,
       TRY_CAST(CASE WHEN l_orderkey % 3 = 0 THEN 'not-a-number'
                     ELSE CAST(l_orderkey AS VARCHAR) END AS BIGINT)
           AS parsed_key,
       ([l_linenumber])[3] AS oob_element
FROM lineitem WHERE l_orderkey % 997 = 0
ORDER BY l_orderkey, l_linenumber
"""


# --- f20: string scalar-function sweep ---------------------------------

def f20_string_function_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The string scalar surface in one pass over ``part``: pad/trim
    (lpad), structure ops (split_part, left, reverse, repeat),
    character ops (translate, instr, ascii) and edit distance
    (levenshtein) — certified directly as scalars (f6/f15 cover the
    regex/URL families; this sweeps the plain-string builtins the
    fuzzy-match and path operators lean on). All engines-identical
    semantics: 1-based positions with 0-if-absent (instr/split_part),
    binary collation for MIN/MAX, unit-cost Levenshtein. Registered in
    the catalog TAIL (r8 window)."""
    part = load_table(spark, sf_dir, "part")
    thinned = part.where(F.col("p_partkey") % 7 == 0).select(
        "p_brand",
        F.col("p_name").alias("s"),
    )
    derived = thinned.select(
        "p_brand",
        F.length("s").alias("len"),
        F.levenshtein(F.col("s"), F.reverse(F.col("s"))).alias("lev"),
        F.instr(F.col("s"), "r").alias("pos_r"),
        F.reverse(F.col("s")).alias("rev"),
        F.split_part(F.col("s"), F.lit(" "), F.lit(2)).alias("w2"),
        F.ascii(F.translate(F.col("s"), "aeiou", "01234")).alias("a_tr"),
        F.left(F.lpad(F.col("s"), 30, "*"), F.lit(3)).alias("lp3"),
        F.repeat(F.left(F.col("s"), F.lit(2)), 2).alias("rep2"),
    )
    return (
        derived.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("len").alias("sum_len"),
            F.sum("lev").alias("sum_lev"),
            F.sum("pos_r").alias("sum_pos_r"),
            F.min("rev").alias("min_rev"),
            F.max("w2").alias("max_w2"),
            F.sum("a_tr").alias("sum_ascii_tr"),
            F.min("lp3").alias("min_lp3"),
            F.max("rep2").alias("max_rep2"),
        )
        .orderBy("p_brand")
    )


F20_ORACLE = """
WITH t AS (
  SELECT p_brand, p_name AS s FROM part WHERE p_partkey % 7 = 0
),
d AS (
  SELECT p_brand,
         length(s) AS len,
         levenshtein(s, reverse(s)) AS lev,
         instr(s, 'r') AS pos_r,
         reverse(s) AS rev,
         split_part(s, ' ', 2) AS w2,
         ascii(translate(s, 'aeiou', '01234')) AS a_tr,
         left(lpad(s, 30, '*'), 3) AS lp3,
         repeat(left(s, 2), 2) AS rep2
  FROM t
)
SELECT p_brand,
       COUNT(*) AS n,
       CAST(SUM(len) AS BIGINT) AS sum_len,
       CAST(SUM(lev) AS BIGINT) AS sum_lev,
       CAST(SUM(pos_r) AS BIGINT) AS sum_pos_r,
       MIN(rev) AS min_rev,
       MAX(w2) AS max_w2,
       CAST(SUM(a_tr) AS BIGINT) AS sum_ascii_tr,
       MIN(lp3) AS min_lp3,
       MAX(rep2) AS max_rep2
FROM d GROUP BY p_brand ORDER BY p_brand
"""


# --- UDTF with analyze(): polymorphic output schema (SURVEY §2.9) --------

NGRAM_GRID_N = 3


def udtf_ngram_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token n-gram expansion through a POLYMORPHIC Python UDTF — the
    Spark 4 ``analyze()`` static method computes the OUTPUT SCHEMA at
    plan time from the constant ``n`` argument (columns ``pos, g1..gn``
    — a table function whose shape is an argument, the capability a
    fixed ``returnType`` UDTF like ``udtf_token_runs`` cannot express;
    the generic unpivot/split/grid family needs it). The second
    ``udtf_`` entry: together they certify both UDTF declaration
    modes.

    Runtime semantics are deliberately simple so the certificate
    isolates the API: each row's token list emits one row per window
    position with the n tokens as columns. The oracle recomputes the
    grid relationally (unnest + array indexing). At 100 TB the UDTF is
    map-side: rows in, grids out, no shuffle.
    """
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    try:  # Spark 4 moved these between minor releases; cover both
        from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult  # noqa: F401
        from pyspark.sql.udtf import AnalyzeResult as _AR
    except ImportError:  # pragma: no cover - version skew guard
        from pyspark.sql.functions import AnalyzeResult as _AR  # type: ignore

    @udtf
    class NgramGrid:
        @staticmethod
        def analyze(toks, n):
            if n.value is None or not isinstance(n.value, int):
                raise ValueError("n must be a constant integer literal")
            return _AR(
                StructType(
                    [StructField("pos", IntegerType())]
                    + [
                        StructField(f"g{i + 1}", StringType())
                        for i in range(n.value)
                    ]
                )
            )

        def eval(self, toks, n):
            toks = toks or []
            for i in range(len(toks) - n + 1):
                yield (i + 1, *toks[i : i + n])

    spark.udtf.register("ngram_grid", NgramGrid)
    docs = load_table(spark, sf_dir, "documents")
    docs.where(F.col("doc_id") % 11 == 0).select(
        "doc_id",
        F.expr(
            r"slice(filter(split(text, '\\s+'), x -> x <> ''), 1, 40)"
        ).alias("t"),
    ).createOrReplaceTempView("udtf_ngram_base")
    return spark.sql(
        f"""
        SELECT b.doc_id, g.pos, g.g1, g.g2, g.g3
        FROM udtf_ngram_base b,
             LATERAL ngram_grid(b.t, {NGRAM_GRID_N}) g
        ORDER BY b.doc_id, g.pos
        """
    )


UDTF_NGRAM_GRID_ORACLE = rf"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')[1:40]
             AS t
  FROM documents WHERE doc_id % 11 = 0
)
SELECT doc_id, CAST(r.i AS INT) AS pos,
       t[r.i] AS g1, t[r.i + 1] AS g2, t[r.i + 2] AS g3
FROM base b, UNNEST(range(1, len(b.t) - {NGRAM_GRID_N} + 2)) AS r(i)
ORDER BY doc_id, pos
"""
