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


# --- TS1: dense daily calendar with forward fill ----------------------

def ts1_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user dense daily value series over events: sequence+explode
    calendar between each user's first and last day, left join of the
    observed daily sums (exact cents), running last(ignorenulls)
    forward fill — one hash-partitioning by user serves the join and
    the fill window (operators/timeseries.py)."""
    from personal_health_etl_pipeline_spark.operators.timeseries import (
        resample_daily_ffill,
    )
    from personal_health_etl_pipeline_spark.plans.exact import cents

    ev = load_table(spark, sf_dir, "events")
    dense = resample_daily_ffill(
        ev, key="user_id", ts_col="ts", value=cents("value"), out_value="v_cents"
    )
    return dense.select(
        "user_id",
        "day",
        F.round(F.col("v_cents").cast("double") / 100.0, 2).alias("day_value"),
        "is_gap",
    )


TS1_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), cal AS (
  SELECT user_id,
         CAST(UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1)
)
SELECT c.user_id, c.day,
       ROUND(CAST(last_value(d.v IGNORE NULLS) OVER (
           PARTITION BY c.user_id ORDER BY c.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / 100.0, 2) AS day_value,
       d.v IS NULL AS is_gap
FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
"""


# --- TS2: rolling z-score anomaly flags -------------------------------

def ts2_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order revenue -> trailing-7-day rolling mean/std -> z-score
    anomaly flags. Window moments are exact bigint cents sums; doubles
    appear only in the final divisions, so the oracle is bit-identical
    (operators/timeseries.py)."""
    from personal_health_etl_pipeline_spark.operators.timeseries import (
        rolling_zscore,
    )
    from personal_health_etl_pipeline_spark.plans.exact import cents

    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.col("o_orderdate").cast("date").alias("day"),
            cents("o_totalprice").alias("rev_c"),
        )
        .groupBy("day")
        .agg(F.sum("rev_c").alias("rev_c"))
    )
    out = rolling_zscore(daily, order_col="day", cents_col="rev_c", window=7)
    return out.select(
        "day",
        F.round(F.col("rev_c").cast("double") / 100.0, 2).alias("revenue"),
        "roll_mean",
        "roll_std",
        "z",
        "is_anomaly",
    )


TS2_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
  FROM orders GROUP BY 1
), rolled AS (
  -- moments in HUGEINT (the engine's decimal(38,0) twin): Σx² and
  -- (Σx)² pass int64 already at sf0.1 (r11 cross-sf sweep find)
  SELECT day, rev_c,
         CAST(SUM(rev_c) OVER w AS BIGINT) AS s1,
         SUM(CAST(rev_c AS HUGEINT) * rev_c) OVER w AS s2,
         CAST(COUNT(rev_c) OVER w AS BIGINT) AS n
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
), stats AS (
  SELECT day, rev_c,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
         sqrt(CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
              / CAST(n * n AS DOUBLE)) AS std_c
  FROM rolled
)
-- floor-based 6-decimal rounding, matching the engine: ROUND(x, 6)
-- diverges between engines at 16-significant-digit magnitudes
SELECT day,
       ROUND(CAST(rev_c AS DOUBLE) / 100.0, 2) AS revenue,
       floor(mean_c / 100.0 * 1000000.0 + 0.5) / 1000000.0 AS roll_mean,
       floor(std_c / 100.0 * 1000000.0 + 0.5) / 1000000.0 AS roll_std,
       floor((CASE WHEN std_c > 0
              THEN (CAST(rev_c AS DOUBLE) - mean_c) / std_c END)
             * 1000000.0 + 0.5) / 1000000.0 AS z,
       COALESCE(abs(CASE WHEN std_c > 0
             THEN (CAST(rev_c AS DOUBLE) - mean_c) / std_c END) > 2.0,
             FALSE) AS is_anomaly
FROM stats
"""


# --- TS3: weekday seasonal profile + anomaly flags ----------------------

def ts3_weekday_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality: daily event-value totals compared to
    their (event_type, weekday) seasonal mean — Mondays against
    Mondays — with a 2-sigma anomaly flag. The missing axis next to
    ``ts2_rolling_zscore``'s trailing window: a quiet Sunday is normal
    FOR a Sunday even when it is 3 sigma under the all-days mean (the
    reference's domain is exactly such daily health series).

    Exactness recipe: totals are bigint cents; the residual is kept
    divisionless as ``r_n = day_cents * n_dow - sum_dow`` (the true
    residual scaled by the weekday count, exact bigint); the 2-sigma
    test compares ``r_n^2 * n`` against ``4 * sum(r_n^2)`` — algebra
    identical to |r| > 2*sigma — with the squares computed in IEEE
    doubles FROM the exact integers, so both engines multiply the same
    ints and branch identically (no overflow envelope on the squares).
    Two bounded groupBys (days x types, then dow x types); no windows,
    no driver state.
    """
    from personal_health_etl_pipeline_spark.plans.exact import cents

    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            "event_type",
            F.to_date("ts").alias("day"),
            cents("value").alias("v_c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v_c").alias("day_c"))
        # 0 = Sunday in both engines (Spark dayofweek is 1-based)
        .withColumn("dow", (F.dayofweek("day") - 1).cast("int"))
    )
    prof = daily.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n_dow"),
        F.sum("day_c").alias("sum_dow"),
    )
    resid = daily.join(prof, ["event_type", "dow"]).withColumn(
        "resid_n", F.col("day_c") * F.col("n_dow") - F.col("sum_dow")
    )
    spread_ = resid.groupBy("event_type", "dow").agg(
        F.sum(
            F.col("resid_n").cast("double") * F.col("resid_n").cast("double")
        ).alias("ss_n")
    )
    return (
        resid.join(spread_, ["event_type", "dow"])
        .select(
            "event_type",
            "day",
            "dow",
            F.round(F.col("day_c").cast("double") / 100.0, 2).alias(
                "day_total"
            ),
            "resid_n",
            "n_dow",
            (
                F.col("resid_n").cast("double")
                * F.col("resid_n").cast("double")
                * F.col("n_dow").cast("double")
                > F.lit(4.0) * F.col("ss_n")
            ).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


TS3_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS day_c
  FROM events GROUP BY 1, 2
),
dowd AS (
  SELECT *, CAST(dayofweek(day) AS INT) AS dow FROM daily
),
prof AS (
  SELECT event_type, dow, COUNT(*) AS n_dow,
         CAST(SUM(day_c) AS BIGINT) AS sum_dow
  FROM dowd GROUP BY 1, 2
),
resid AS (
  SELECT d.event_type, d.day, d.dow, d.day_c, p.n_dow,
         d.day_c * p.n_dow - p.sum_dow AS resid_n
  FROM dowd d JOIN prof p USING (event_type, dow)
),
ss AS (
  SELECT event_type, dow,
         SUM(CAST(resid_n AS DOUBLE) * CAST(resid_n AS DOUBLE)) AS ss_n
  FROM resid GROUP BY 1, 2
)
SELECT r.event_type, r.day, r.dow,
       ROUND(CAST(r.day_c AS DOUBLE) / 100.0, 2) AS day_total,
       r.resid_n, r.n_dow,
       CAST(r.resid_n AS DOUBLE) * CAST(r.resid_n AS DOUBLE)
           * CAST(r.n_dow AS DOUBLE) > 4.0 * s.ss_n AS is_anomaly
FROM resid r JOIN ss s USING (event_type, dow)
ORDER BY r.event_type, r.day
"""


# --- TS4: seasonal decomposition (trend / weekday seasonal / residual) --

def ts4_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily revenue series —
    trend (centered 7-day moving window), weekday seasonal, residual —
    with EVERY quantity exact-integer and DIVISION-FREE: instead of
    ``avg`` (whose integer division floors/truncates differently
    across engines for negatives), each component carries its scale
    factor: ``detrended7 = 7*rev - sum7`` (7x the classical detrended
    value), ``residual_scaled = n_w*detrended7 - seas_sum`` (n_w*7x
    the classical residual). Scaled integers order/threshold exactly
    like their rational counterparts, which is all a downstream
    anomaly rule needs — and they make the decomposition
    hash-certifiable. Edge days without a full 7-day window decompose
    to NULL (and are excluded from the weekday means). One window
    pass + one 7-row weekday aggregate; completes the time-series
    family (gap-fill, rolling z-score, weekday anomaly, decompose).
    """
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias(
                "rev_cents"
            )
        )
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.select(
        "day",
        "rev_cents",
        F.count(F.lit(1)).over(w7).alias("n7"),
        F.sum("rev_cents").over(w7).alias("sum7"),
    ).select(
        "day",
        "rev_cents",
        F.when(F.col("n7") == 7, 7 * F.col("rev_cents") - F.col("sum7"))
        .alias("detrended7"),
    )
    seas = (
        trended.where(F.col("detrended7").isNotNull())
        .groupBy(F.expr("weekday(day)").cast("int").alias("dow"))
        .agg(
            F.sum("detrended7").alias("seas_sum"),
            F.count(F.lit(1)).alias("n_w"),
        )
    )
    return (
        trended.withColumn("dow", F.expr("weekday(day)").cast("int"))
        .join(F.broadcast(seas), "dow", "left")
        .select(
            "day",
            "dow",
            "rev_cents",
            "detrended7",
            F.when(F.col("detrended7").isNotNull(), F.col("seas_sum"))
            .alias("seas_sum"),
            F.when(F.col("detrended7").isNotNull(), F.col("n_w"))
            .alias("n_w"),
            F.when(
                F.col("detrended7").isNotNull(),
                F.col("n_w") * F.col("detrended7") - F.col("seas_sum"),
            ).alias("residual_scaled"),
        )
        .orderBy("day")
    )


TS4_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM events GROUP BY 1
),
trended AS (
  SELECT day, rev_cents,
         CASE WHEN COUNT(*) OVER w = 7
              THEN 7 * rev_cents - SUM(rev_cents) OVER w END AS detrended7
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
seas AS (
  SELECT CAST(isodow(day) - 1 AS INT) AS dow,
         CAST(SUM(detrended7) AS BIGINT) AS seas_sum,
         COUNT(*) AS n_w
  FROM trended WHERE detrended7 IS NOT NULL GROUP BY 1
)
SELECT t.day, CAST(isodow(t.day) - 1 AS INT) AS dow, t.rev_cents,
       CAST(t.detrended7 AS BIGINT) AS detrended7,
       CASE WHEN t.detrended7 IS NOT NULL THEN s.seas_sum END AS seas_sum,
       CASE WHEN t.detrended7 IS NOT NULL THEN s.n_w END AS n_w,
       CAST(CASE WHEN t.detrended7 IS NOT NULL
            THEN s.n_w * t.detrended7 - s.seas_sum END AS BIGINT)
           AS residual_scaled
FROM trended t LEFT JOIN seas s ON s.dow = isodow(t.day) - 1
ORDER BY t.day
"""


# --- ts5: exponentially weighted moving average ------------------------

EWMA_WINDOW = 20  # decay 1/2 per step, truncated at 20 observations


def ewma_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values, decay 1/2 per observation,
    truncated at the trailing ``EWMA_WINDOW`` rows — exponential
    smoothing as a pure window expression, no recursion and no UDF.
    This is the PRODUCTION form: full output, no display ordering —
    one hash shuffle on user_id, one sort, one window pass, then
    straight to the consumer/sink. The certified catalog entry
    (:func:`ts5_ewma_halflife`) is this operator hash-gated on a
    1-in-7 slice of its output.

    Why it is HASH-certifiable despite being float math: values are
    first fixed to integer cents, the decay is exactly 1/2, and the
    smoothing sum is evaluated by Horner's rule (``acc/2 + x``) whose
    intermediates are all multiples of 2^-19 bounded well under 2^53 —
    every step is EXACT in IEEE double, in any engine, in any
    evaluation order the frame imposes. The only rounding op is the
    final normalization divide (one IEEE division with identical
    operands on both sides). Truncation is what buys exactness: an
    unbounded EWMA's 2^-1000 tails underflow and round.

    Implementation: the Horner fold over a trailing-20 frame is
    algebraically  sum_{j=0..19} lag(cents, j) / 2^j  (j = rows back;
    NULL lags past the partition start contribute an exact +0.0), so
    the whole smoothing is 20 ``lag`` columns over ONE window spec —
    no per-row array materialization, no higher-order-function eval.
    Because every term and every partial sum is exact (see above), the
    left-to-right addition here equals the Horner evaluation bit-for-
    bit; the r7 ``collect_list`` + ``aggregate`` form hashed identical
    values 12x slower (1.66s at sf0.1) from per-row array churn.

    Scale shape: one shuffle on user_id, one sort, one window operator
    evaluating the 20 lags + row_number in a single pass. The window
    order (ts, event_id) is total, so the lag contents are
    deterministic."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.expr(
            "CAST(CAST(round(value * 100, 0) AS BIGINT) AS DOUBLE)"
        ).alias("cents"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.lit(0.0)
    for j in range(EWMA_WINDOW):
        num = num + (
            F.coalesce(F.lag("cents", j).over(w), F.lit(0.0))
            / F.lit(float(2**j))
        )
    n_obs = F.least(F.row_number().over(w), F.lit(EWMA_WINDOW))
    wsum = F.lit(2.0) - F.lit(1.0) / F.pow(
        F.lit(2.0), (n_obs - F.lit(1)).cast("double")
    )
    return ev.select(
        "event_id",
        "user_id",
        n_obs.alias("n_obs"),
        (num / wsum).alias("ewma_cents"),
    )


def ts5_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`ewma_events` under the hash gate, certified on a 1-in-7
    output slice (the f24 recipe): the WINDOW KERNEL still runs over
    every row — a filter on event_id cannot push through a window
    partitioned on user_id, and each sampled row's EWMA folds its 19
    predecessors, so the sample transitively certifies ~all input
    rows — but result DELIVERY is bounded to the sample.

    Why the slice (r9 floor decomposition, sf0.1, best-of-5): the full
    kernel costs 0.33-0.38s (``agg(count)`` over the un-ordered window
    output); the old full-output form cost 1.59-1.67s, i.e. ~1.25s —
    three quarters of the wall — was delivering 100k globally-sorted
    rows (the range-sort's sampling pass re-evaluates the window, then
    100k rows cross the driver boundary). That is certification
    plumbing, not operator cost, and it scales with corpus size while
    certifying nothing the sample doesn't. The single-partition sort
    at the tail orders the SAMPLE (~14k rows at sf0.1) for
    deterministic display — sized to the certified slice, never the
    corpus; a production consumer takes :func:`ewma_events` unordered
    (measured here: slice+1-partition sort 0.78-0.84s vs global-sort
    full 1.59s+ vs kernel floor 0.35s)."""
    return (
        ewma_events(spark, sf_dir)
        .where(F.col("event_id") % 7 == 0)
        .repartition(1)
        .sortWithinPartitions("event_id")
    )


TS5_ORACLE = f"""
WITH base AS (
  SELECT event_id, user_id, ts,
         CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS cents
  FROM events
),
win AS (
  SELECT event_id, user_id,
         list(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN {EWMA_WINDOW - 1} PRECEDING AND CURRENT ROW) AS vs
  FROM base
)
SELECT event_id, user_id,
       CAST(len(vs) AS INT) AS n_obs,
       list_reduce(vs, (acc, x) -> acc / 2 + x)
         / (2 - 1 / power(2, CAST(len(vs) - 1 AS DOUBLE))) AS ewma_cents
FROM win WHERE event_id % 7 = 0 ORDER BY event_id
"""


# --- j19: forward as-of with a match tolerance -------------------------

ASOF_TOL_SECONDS = 1800  # match only within 30 minutes


def j19_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each click, the user's NEXT purchase — but only if it lands
    within 30 minutes (forward as-of + tolerance, the attribution-
    window join). Certifies the two ``asof_join`` modes j4 leaves
    uncovered: ``direction="forward"`` (earliest right row with
    ``right_ts >= left_ts``, equality matching) and
    ``tolerance_seconds`` (match nulled when the gap exceeds the
    window; the left row survives with NULLs — left-join semantics
    throughout). Same one-shuffle union+window implementation; the
    oracle is DuckDB's native ASOF with the inequality flipped plus a
    CASE for the tolerance."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    joined = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="p_ts",
        direction="forward",
        tolerance_seconds=ASOF_TOL_SECONDS,
        right_prefix="",
    )
    return joined.select(
        "event_id",
        "user_id",
        "p_event_id",
        F.round("p_value", 2).alias("p_value"),
    ).orderBy("event_id")


J19_ORACLE = f"""
SELECT c.event_id, c.user_id,
       CASE WHEN abs(epoch(c.ts) - epoch(p.ts)) <= {float(ASOF_TOL_SECONDS)!r}
            THEN p.event_id END AS p_event_id,
       CASE WHEN abs(epoch(c.ts) - epoch(p.ts)) <= {float(ASOF_TOL_SECONDS)!r}
            THEN ROUND(p.value, 2) END AS p_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts <= p.ts
ORDER BY c.event_id
"""


# --- ts6: moving median (robust trailing smoother) ---------------------

MOVMED_WINDOW = 9


def ts6_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 9-row EXACT median per user — the robust smoother
    (50% breakdown point) next to ts2's mean/z-score family. Spark has
    no median window aggregate; the composition is sorted-frame
    element access: ``array_sort(collect_list over frame)`` then the
    middle element (odd frames) or the midpoint of the two middle
    elements (even frames — integer cents make the midpoint an exact
    .5 double). One user_id shuffle, bounded 9-element frames; DuckDB's
    native windowed ``median`` uses the same lower/upper-midpoint
    definition, so values hash-match bit-for-bit."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(MOVMED_WINDOW - 1), 0)
    )
    vs = F.array_sort(
        F.collect_list(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).over(w)
    )
    base = ev.select("event_id", "user_id", vs.alias("vs"))
    n = F.size("vs")
    med = F.when(
        n % 2 == 1,
        F.element_at("vs", ((n + F.lit(1)) / F.lit(2)).cast("int")).cast(
            "double"
        ),
    ).otherwise(
        (
            F.element_at("vs", (n / F.lit(2)).cast("int"))
            + F.element_at("vs", (n / F.lit(2)).cast("int") + F.lit(1))
        ).cast("double")
        / F.lit(2.0)
    )
    return base.select(
        "event_id", "user_id", med.alias("med_cents")
    ).orderBy("event_id")


TS6_ORACLE = f"""
SELECT event_id, user_id,
       CAST(median(CAST(round(value * 100) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN {MOVMED_WINDOW - 1} PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS med_cents
FROM events ORDER BY event_id
"""


# --- ts7: CUSUM change-point statistic ---------------------------------

def ts7_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact CUSUM-style change-point statistic per user: the maximum
    deviation of the running prefix sum from the straight line through
    the series total. With ``S_i`` = prefix sum of integer cents,
    ``N`` = the user's row count and ``T`` = the user's total, the
    statistic at row i is ``|N*S_i - i*T|`` — the standard CUSUM
    ``|S_i - (i/N)*T|`` multiplied through by N so every intermediate
    stays an exact BIGINT (no division until never). The argmax row is
    the estimated change point; ties break to the EARLIEST row, made
    deterministic with one ``min(struct(-stat, i))`` hash aggregate —
    no second window pass and no self-join. Two window frames over one
    user_id shuffle (running sum + full-partition N/T), then a single
    hash aggregate; magnitudes bound at ~n²·max_cents ≈ 2^47 at sf1,
    well inside BIGINT. Registered in the catalog TAIL (r7 window)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("user_id")
    rows = ev.select(
        "user_id",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("i"),
        F.sum("cents").over(wrun).alias("s_i"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("cents").over(wall).alias("t"),
    )
    stat = F.abs(F.col("n") * F.col("s_i") - F.col("i") * F.col("t"))
    best = (
        rows.select(
            "user_id",
            "n",
            "t",
            stat.alias("stat"),
            F.col("i").alias("i"),
        )
        .groupBy("user_id", "n", "t")
        .agg(
            F.min(
                F.struct(
                    (-F.col("stat")).alias("neg_stat"),
                    F.col("i").alias("i"),
                )
            ).alias("b")
        )
    )
    return best.select(
        "user_id",
        F.col("n").alias("n_events"),
        F.col("t").alias("total_cents"),
        F.col("b.i").alias("cp_index"),
        (-F.col("b.neg_stat")).alias("cusum_stat"),
    ).orderBy("user_id")


TS7_ORACLE = """
WITH base AS (
  SELECT user_id,
         row_number() OVER w AS i,
         SUM(CAST(round(value * 100) AS BIGINT))
             OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS s_i,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         CAST(SUM(CAST(round(value * 100) AS BIGINT))
              OVER (PARTITION BY user_id) AS BIGINT) AS t
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
scored AS (
  SELECT user_id, n, t, i,
         abs(n * CAST(s_i AS BIGINT) - i * t) AS stat
  FROM base
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY stat DESC, i) AS rn
  FROM scored
)
SELECT user_id, CAST(n AS BIGINT) AS n_events, t AS total_cents,
       CAST(i AS BIGINT) AS cp_index, CAST(stat AS BIGINT) AS cusum_stat
FROM ranked WHERE rn = 1 ORDER BY user_id
"""


# --- ts8: OHLC bars ------------------------------------------------------

def ts8_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) bars over purchase values —
    the canonical downsampling shape for tick data. Open and close are
    ``min_by``/``max_by`` with a composite ``struct(ts, event_id)``
    ordering key (total order, so ties are impossible by
    construction); high/low/volume are plain min/max/count — ONE hash
    aggregate on the hour bucket, no window sort of the full stream.
    Values are integer cents so the hash gate is bit-exact. The oracle
    re-derives open/close with a row_number window, pinning Spark's
    min_by struct-ordering semantics against an independent
    formulation. Registered in the catalog TAIL (r7 window)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            F.date_trunc("hour", "ts").alias("bar_ts"),
            "ts",
            "event_id",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    key = F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("event_id"))
    return (
        ev.groupBy("bar_ts")
        .agg(
            F.min_by("cents", key).alias("open_cents"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.max_by("cents", key).alias("close_cents"),
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum("cents").alias("volume_cents"),
        )
        .orderBy("bar_ts")
    )


TS8_ORACLE = """
WITH ticks AS (
  SELECT date_trunc('hour', ts) AS bar_ts, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_asc,
         row_number() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_desc
  FROM events WHERE event_type = 'purchase'
)
SELECT bar_ts,
       MAX(CASE WHEN rn_asc = 1 THEN cents END) AS open_cents,
       MAX(cents) AS high_cents,
       MIN(cents) AS low_cents,
       MAX(CASE WHEN rn_desc = 1 THEN cents END) AS close_cents,
       COUNT(*) AS n_ticks,
       CAST(SUM(cents) AS BIGINT) AS volume_cents
FROM ticks GROUP BY bar_ts ORDER BY bar_ts
"""


# --- ts9: autocorrelation function of the daily revenue series ---------

TS9_MAX_LAG = 7


def ts9_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of the daily order-revenue series —
    the seasonality diagnostic behind every forecasting pipeline (a
    weekly cycle shows as an acf(7) spike). Pearson r over the pairs
    ``(rev[d], rev[d+k])`` for dates where both days exist.

    The a10 exactness recipe at series scale: daily revenues reduce to
    exact integer cents, the five power sums accumulate as DECIMAL
    (order-independent across partitions — never the double
    accumulators), and the one double division happens after, so the
    result is bit-identical to the serial oracle. Scale shape: one
    date-keyed aggregation, then ONE equi-join of the daily series
    against itself shifted by an exploded lag column (7 lags ride one
    shuffle, not 7 self-joins), then a 7-group aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("d")
    ).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
            "cents"
        )
    )
    left = daily.withColumn(
        "k", F.explode(F.sequence(F.lit(1), F.lit(TS9_MAX_LAG)))
    ).withColumn("d2", F.date_add("d", F.col("k")))
    right = daily.select(
        F.col("d").alias("d2"), F.col("cents").alias("cents2")
    )
    x = F.col("cents").cast("decimal(18,0)")
    y = F.col("cents2").cast("decimal(18,0)")
    pairs = left.join(right, "d2").select("k", x.alias("x"), y.alias("y"))
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum("x").cast("double")
    sy = F.sum("y").cast("double")
    sxy = F.sum(F.col("x") * F.col("y")).cast("double")
    sxx = F.sum(F.col("x") * F.col("x")).cast("double")
    syy = F.sum(F.col("y") * F.col("y")).cast("double")
    acf = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return (
        pairs.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(acf, 6).alias("acf"),
        )
        .select(F.col("k").cast("bigint").alias("lag_days"), "n_pairs", "acf")
        .orderBy("lag_days")
    )


TS9_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         -- DECIMAL(19): int128-backed, so x*y binds as DECIMAL(38)
         -- (DECIMAL(18) is int64-backed and its product overflows at
         -- daily cents ~1.5e9, i.e. from sf0.1 up)
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
              AS DECIMAL(19,0)) AS cents
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
pairs AS (
  SELECT l.k, a.cents AS x, b.cents AS y
  FROM range(1, {TS9_MAX_LAG + 1}) l(k), daily a
  JOIN daily b ON b.d = a.d + CAST(l.k AS INT)
),
stats AS (
  SELECT k,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(y * y) AS DOUBLE) AS syy
  FROM pairs GROUP BY k
)
SELECT CAST(k AS BIGINT) AS lag_days,
       CAST(n AS BIGINT) AS n_pairs,
       ROUND((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS acf
FROM stats ORDER BY lag_days
"""


# --- TS10: exact trapezoidal time-weighted average ---------------------

def ts10_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trapezoidal time-weighted average of the sampled ``value`` per
    (event_type, day) — the estimator that is CORRECT for irregularly
    sampled telemetry, where the plain mean over-weights bursts. One
    window pass builds consecutive-sample pairs (lead over the same
    (type, day) partitioning the aggregate reuses — a single shuffle),
    then exact integer arithmetic end-to-end: Δt in microseconds
    (``unix_micros``), values in cents, so the weighted sum
    Σ Δt·(v1+v2) is a bigint both engines compute identically (per-day
    bound: 8.64e10 µs × 2e4 cents ≈ 1.7e15 ≪ int64; the ×1000 display
    ratio stays under 1.7e18). Days with a single sample have no pair
    and drop out in both engines. The TWA itself is the integer ratio
    (1000·num) div (2·den) — division-free comparison, no float in
    sight."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.unix_micros("ts").alias("t_us"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        "event_id",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type", "day").orderBy("t_us", "event_id")
    paired = ev.select(
        "event_type",
        "day",
        "t_us",
        "cents",
        F.lead("t_us").over(w).alias("t2_us"),
        F.lead("cents").over(w).alias("cents2"),
    ).where(F.col("t2_us").isNotNull())
    return (
        paired.groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("t2_us") - F.col("t_us")).alias("span_us"),
            F.sum(
                (F.col("t2_us") - F.col("t_us"))
                * (F.col("cents") + F.col("cents2"))
            ).alias("weighted_sum"),
        )
        .select(
            "event_type",
            "day",
            "n_pairs",
            "span_us",
            F.expr("CAST(1000 * weighted_sum AS BIGINT) div (2 * span_us)").alias(
                "twa_milli_cents"
            ),
        )
        .orderBy("event_type", "day")
    )


TS10_ORACLE = """
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         epoch_us(ts) AS t_us,
         CAST(round(value * 100) AS BIGINT) AS cents,
         event_id
  FROM events
),
paired AS (
  SELECT event_type, day, t_us, cents,
         lead(t_us) OVER w AS t2_us,
         lead(cents) OVER w AS cents2
  FROM s
  WINDOW w AS (PARTITION BY event_type, day ORDER BY t_us, event_id)
)
SELECT event_type, day,
       COUNT(*) AS n_pairs,
       CAST(SUM(t2_us - t_us) AS BIGINT) AS span_us,
       CAST(1000 * SUM((t2_us - t_us) * (cents + cents2)) AS BIGINT)
         // (2 * CAST(SUM(t2_us - t_us) AS BIGINT)) AS twa_milli_cents
FROM paired WHERE t2_us IS NOT NULL
GROUP BY event_type, day
ORDER BY event_type, day
"""


# --- J27: KEYLESS banded range join (global attribution window) --------

def j27_global_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keyless range join — every 'view' in the 2 hours before
    each 'purchase', regardless of user (a global attribution window:
    site-wide promos, incident blast-radius). Without an equality key
    a naive plan is a broadcast-nested-loop over the full cross space;
    the banded rewrite (operators/temporal.range_join with ``on=[]``)
    makes the epoch bucket itself the shuffle key: intervals explode
    to ≤2 covering 7200s buckets, points map to one, and the join is a
    plain hash equi-join + residual band filter. At 100 TB the bucket
    key bounds every task's work by the TIME-LOCAL event density —
    the physically meaningful skew dimension for this query — instead
    of all-pairs. Certified against DuckDB's native inequality join
    (its IEJoin path). Purchases sampled 1-in-7 to keep the oracle's
    quadratic check honest at sf0.1."""
    from personal_health_etl_pipeline_spark.operators.temporal import (
        range_join,
    )

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(
        (F.col("event_type") == "purchase") & (F.col("event_id") % 7 == 0)
    ).select(
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 2 HOURS")).alias("lo"),
        F.col("ts").alias("hi"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    matched = range_join(
        views,
        purchases,
        on=[],
        point_ts="view_ts",
        lower_ts="lo",
        upper_ts="hi",
        bucket_width_seconds=7200,
        closed="left",
    )
    return (
        matched.groupBy("purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_views"),
            F.min("view_id").alias("first_view_id"),
            F.max("view_id").alias("last_view_id"),
        )
        .orderBy("purchase_id")
    )


J27_ORACLE = """
SELECT p.event_id AS purchase_id,
       COUNT(*) AS n_views,
       MIN(v.event_id) AS first_view_id,
       MAX(v.event_id) AS last_view_id
FROM (SELECT * FROM events
      WHERE event_type = 'purchase' AND event_id % 7 = 0) p
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON v.ts >= p.ts - INTERVAL 2 HOURS AND v.ts < p.ts
GROUP BY p.event_id
ORDER BY purchase_id
"""


# --- TS11: calendar-hierarchy rollup from one day-level aggregate -----

def ts11_calendar_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day → week → month revenue rollup where the coarser grains are
    RE-AGGREGATED from the day-level partial state, not from the fact
    table: one base-table aggregate (the only shuffle that sees fact
    rows), then each day row explodes to its three (grain, period)
    memberships — a narrow generator over the already-tiny day frame —
    and a second aggregate folds the partials up. The hypertable /
    continuous-aggregate pattern: at 100 TB the week and month grains
    cost day-frame work, not another fact scan (a GROUPING SETS over
    the base would Expand ×3 BEFORE the big shuffle). All state is
    algebraic (count-sum/sum/min/max), so re-aggregation is exact.
    Week periods follow the shared Monday-start `date_trunc` rule."""
    orders = load_table(spark, sf_dir, "orders")
    day_agg = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
        ).alias("sum_cents"),
    )
    grains = day_agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("day").alias("granularity"),
                    F.col("day").alias("period_start"),
                ),
                F.struct(
                    F.lit("week").alias("granularity"),
                    F.to_date(F.date_trunc("week", "day")).alias(
                        "period_start"
                    ),
                ),
                F.struct(
                    F.lit("month").alias("granularity"),
                    F.to_date(F.date_trunc("month", "day")).alias(
                        "period_start"
                    ),
                ),
            )
        ).alias("g"),
        "n_orders",
        "sum_cents",
    )
    return (
        grains.groupBy("g.granularity", "g.period_start")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_cents").alias("sum_cents"),
        )
        .orderBy("granularity", "period_start")
    )


TS11_ORACLE = """
WITH day_agg AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents
  FROM orders GROUP BY 1
)
SELECT 'day' AS granularity, day AS period_start,
       CAST(n_orders AS BIGINT) AS n_orders, sum_cents
FROM day_agg
UNION ALL
SELECT 'week', CAST(date_trunc('week', day) AS DATE),
       CAST(SUM(n_orders) AS BIGINT), CAST(SUM(sum_cents) AS BIGINT)
FROM day_agg GROUP BY 2
UNION ALL
SELECT 'month', CAST(date_trunc('month', day) AS DATE),
       CAST(SUM(n_orders) AS BIGINT), CAST(SUM(sum_cents) AS BIGINT)
FROM day_agg GROUP BY 2
ORDER BY granularity, period_start
"""


# --- ts12: linear interpolation between sampled knots -------------------

def ts12_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of a sparsely sampled daily series — the
    gap-repair dual of ts1's forward fill (ffill holds the last level;
    interpolation draws the straight line to the NEXT observation —
    the correct choice for slowly-varying physical quantities, e.g.
    body-weight-style metrics sampled every few days in the reference's
    domain). The "observed" knots are deterministically thinned to
    days-of-month divisible by 3, so real multi-day gaps exist at every
    scale and the interpolated values are data-independent of the
    thinning rule.

    DIVISION-FREE exactness: each gap row emits the exact integer
    numerator ``prev*(span) + (next-prev)*(d-prev_day)`` and the span
    denominator, plus ONE IEEE division rounded to 6dp for display —
    no fraction ever accumulates, so engines agree bit-for-bit
    (truncating integer division would need a sign argument; a
    numerator/denominator pair needs none).

    Scale shape: one hash aggregate to the knot series, a per-key
    calendar explode (sequence is linear in output days), and TWO
    passes of the same (event_type, day)-sorted window (backward
    last/ignorenulls + forward first/ignorenulls) — all on one
    partitioning of the series key; no self-join, no iteration.
    """
    from personal_health_etl_pipeline_spark.plans.exact import cents

    ev = load_table(spark, sf_dir, "events")
    knots = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(cents("value")).alias("v"))
        .where(F.dayofmonth("day") % 3 == 0)
    )
    grid = (
        knots.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "event_type",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    from pyspark.sql import Window

    wb = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    series = (
        grid.join(knots, ["event_type", "day"], "left")
        .withColumn("prev_v", F.last("v", ignorenulls=True).over(wb))
        .withColumn("prev_d", F.last(obs_day, ignorenulls=True).over(wb))
        .withColumn("next_v", F.first("v", ignorenulls=True).over(wf))
        .withColumn("next_d", F.first(obs_day, ignorenulls=True).over(wf))
    )
    span = F.datediff("next_d", "prev_d")
    num = F.col("prev_v") * span + (
        F.col("next_v") - F.col("prev_v")
    ) * F.datediff("day", "prev_d")
    return series.select(
        "event_type",
        "day",
        F.col("v").isNotNull().alias("is_knot"),
        "v",
        F.when(span == 0, F.col("v")).otherwise(num).alias("interp_num"),
        F.when(span == 0, F.lit(1)).otherwise(span).alias("span_days"),
        F.round(
            F.when(span == 0, F.col("v")).otherwise(num).cast("double")
            / F.when(span == 0, F.lit(1)).otherwise(span).cast("double"),
            6,
        ).alias("interp_cents"),
    ).orderBy("event_type", "day")


TS12_ORACLE = """
WITH knots AS (
  SELECT * FROM (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
    FROM events GROUP BY 1, 2
  ) WHERE date_part('day', day) % 3 = 0
),
grid AS (
  SELECT event_type,
         CAST(UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
        FROM knots GROUP BY 1)
),
series AS (
  SELECT g.event_type, g.day, k.v,
         last_value(k.v IGNORE NULLS) OVER wb AS prev_v,
         last_value(CASE WHEN k.v IS NOT NULL THEN g.day END IGNORE NULLS)
             OVER wb AS prev_d,
         first_value(k.v IGNORE NULLS) OVER wf AS next_v,
         first_value(CASE WHEN k.v IS NOT NULL THEN g.day END IGNORE NULLS)
             OVER wf AS next_d
  FROM grid g LEFT JOIN knots k USING (event_type, day)
  WINDOW wb AS (PARTITION BY g.event_type ORDER BY g.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY g.event_type ORDER BY g.day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, day,
       v IS NOT NULL AS is_knot, v,
       CAST(CASE WHEN next_d - prev_d = 0 THEN v
            ELSE prev_v * (next_d - prev_d)
                 + (next_v - prev_v) * (day - prev_d) END AS BIGINT)
           AS interp_num,
       CAST(CASE WHEN next_d - prev_d = 0 THEN 1
            ELSE next_d - prev_d END AS INT) AS span_days,
       ROUND(CAST(CASE WHEN next_d - prev_d = 0 THEN v
                  ELSE prev_v * (next_d - prev_d)
                       + (next_v - prev_v) * (day - prev_d) END AS DOUBLE)
             / CAST(CASE WHEN next_d - prev_d = 0 THEN 1
                    ELSE next_d - prev_d END AS DOUBLE), 6) AS interp_cents
FROM series ORDER BY event_type, day
"""


# --- j29: first-touch attribution window --------------------------------

ATTR_WINDOW_SECONDS = 7 * 86400  # 7-day lookback


def j29_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style FIRST-touch attribution: for each purchase, the
    user's EARLIEST click strictly before it and within a 7-day
    lookback — the dual of j4's last-click (backward as-of = LAST
    touch). As-of composition can't express "earliest in a bounded
    window" (it keeps the nearest row), so this certifies the
    value-RANGE window frame instead: events ordered by exact epoch
    micros, frame ``RANGE [-7d, -1us)``, conditional MIN over the
    click rows only — one shuffle on user_id, no self-join, no
    explode. The winning click's id is then recovered by ONE equi-join
    back on (user_id, micros) — (user_id, ts) is unique in this table
    (module docstring), so the join is 1:1.

    Attribution gaps are first-class: purchases with no click in the
    window keep NULL click columns (left join semantics end-to-end).

    Scale shape: the window pass and the join-back share the user_id
    hash partitioning (AQE reuses the exchange); at 100 TB both sides
    of the join-back are the same pre-bucketed events table.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-ATTR_WINDOW_SECONDS * 1_000_000, -1)
    )
    first_click_us = F.min(
        F.when(F.col("event_type") == "click", F.col("us"))
    ).over(w)
    purchases = (
        ev.withColumn("click_us", first_click_us)
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "us", "click_us")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("us").alias("click_us"),
        F.col("event_id").alias("click_event_id"),
    )
    return (
        purchases.join(clicks, ["user_id", "click_us"], "left")
        .select(
            "event_id",
            "user_id",
            "ts",
            "click_event_id",
            F.expr("(us - click_us) div 1000000").alias("gap_seconds"),
        )
        .orderBy("event_id")
    )


J29_ORACLE = f"""
WITH ev AS (
  SELECT event_id, user_id, ts, event_type, epoch_us(ts) AS us
  FROM events
),
attributed AS (
  SELECT event_id, user_id, ts, us,
         MIN(CASE WHEN event_type = 'click' THEN us END) OVER (
             PARTITION BY user_id ORDER BY us
             RANGE BETWEEN {ATTR_WINDOW_SECONDS * 1_000_000} PRECEDING
                       AND 1 PRECEDING) AS click_us
  FROM ev
  QUALIFY event_type = 'purchase'
)
SELECT a.event_id, a.user_id, a.ts, c.event_id AS click_event_id,
       CAST((a.us - a.click_us) // 1000000 AS BIGINT) AS gap_seconds
FROM attributed a
LEFT JOIN (SELECT user_id, us, event_id FROM ev
           WHERE event_type = 'click') c
       ON c.user_id = a.user_id AND c.us = a.click_us
ORDER BY a.event_id
"""


# --- j31: cogrouped pandas as-of merge ----------------------------------

J31_BUCKETS = 64  # cogroup key granularity: tasks, not entities


def j31_merged_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-sort cogroup+``merge_asof`` frame of
    :func:`j31_cogroup_pandas_asof` — exposed so plan tests can assert
    the cogroup shape (FlatMapCoGroupsInPandas fed by one
    co-partitioned exchange pair) that the public entry's checkpoint
    hides behind a ``Scan ExistingRDD``.

    Per-user as-of merge through ``groupBy().cogroup().
    applyInPandas`` — the LAST Arrow-UDF shape the §2.9 surface had
    not certified (mapInPandas = per batch, applyInPandas = per group,
    UDTF = per row; cogroup = per ALIGNED group PAIR, the API for
    custom two-sided per-key logic that no join expresses directly).
    Inside each (purchases, clicks) cohort pair the merge is pandas'
    own ``merge_asof`` (backward, i.e. latest click at-or-before the
    purchase) — so the entry certifies Spark's cogroup machinery AND
    the pandas kernel against the relational as-of (j4's window
    composition) in one hash.

    Semantics pinned by the oracle: left join (purchases with no prior
    click keep NULLs), gap reported in exact integer MICROSECONDS
    (timestamps are µs; no float time math anywhere). (user_id, ts) is
    unique in the fixture, so backward matches are deterministic.

    Scale shape: the cogroup key is a BUCKET (user_id % {J31_BUCKETS}),
    not the raw user — cogrouping on a per-entity key spawns one
    Python invocation per entity (measured 19.7s at sf0.1 for ~10k
    users: pure per-group overhead), while bucketing bounds the task
    count and lets pandas' vectorized ``merge_asof(by=user_id)`` do
    ALL the per-user alignment inside each Arrow batch — 100x fewer
    Python crossings, identical semantics. ONE co-partitioned shuffle
    per side, the same shuffle count as the window composition (j4);
    the Python boundary is why j4 stays the default and this entry
    certifies the ESCAPE HATCH for per-key logic beyond SQL.
    """
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    bucket = (F.col("user_id") % J31_BUCKETS).alias("bucket")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        bucket, "user_id", "event_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        bucket,
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "click_event_id": pd.Series(dtype="Int64"),
                    "gap_us": pd.Series(dtype="Int64"),
                }
            )
        left = left.sort_values("ts", kind="mergesort")
        if right.empty:
            out = left[["event_id", "user_id"]].copy()
            out["click_event_id"] = pd.array([None] * len(out), dtype="Int64")
            out["gap_us"] = pd.array([None] * len(out), dtype="Int64")
            return out
        right = right.sort_values("click_ts", kind="mergesort")
        m = pd.merge_asof(
            left,
            right.drop(columns=["bucket"]),
            left_on="ts",
            right_on="click_ts",
            by="user_id",
            direction="backward",
        )
        # pandas datetime64 int views are NANOSECONDS; the µs-grained
        # source makes // 1000 exact
        gap = (
            (m["ts"].astype("int64") - m["click_ts"].astype("int64")) // 1000
        ).where(m["click_ts"].notna())
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "user_id": m["user_id"].astype("int64"),
                "click_event_id": m["click_event_id"].astype("Int64"),
                "gap_us": gap.astype("Int64"),
            }
        )

    out = (
        purchases.groupBy("bucket")
        .cogroup(clicks.groupBy("bucket"))
        .applyInPandas(
            merge,
            "event_id long, user_id long, click_event_id long, gap_us long",
        )
    )
    return out


def j31_cogroup_pandas_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`j31_merged_frame` with the display sort — see that
    docstring for the full semantics and scale notes.

    r15: the lineage is cut before the global sort. ``orderBy``'s
    range partitioner SAMPLES its input to draw split points, and
    sampling a cogroup+pandas subtree re-executes the entire Python
    pass — the whole shuffle + ``merge_asof`` ran twice per query
    (measured 2.01 s -> 1.33 s median at sf0.1, rows bit-identical).
    The checkpoint materializes the merged rows once; both the
    sampler and the sort then read the stored blocks. At scale this
    halves the Python-boundary work; see pagerank.py's note for the
    localCheckpoint-vs-reliable-checkpoint trade-off on clusters.
    """
    out = j31_merged_frame(spark, sf_dir)
    return out.localCheckpoint(eager=False).orderBy("event_id")


J31_ORACLE = """
SELECT p.event_id, p.user_id, c.event_id AS click_event_id,
       CASE WHEN c.ts IS NOT NULL
            THEN epoch_us(p.ts) - epoch_us(c.ts) END AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""
