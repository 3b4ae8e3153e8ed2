"""Statistical-inference surface: the hypothesis-test / model-fit
primitives a data warehouse runs AFTER the aggregates — independence
tests over contingency tables, two-sample location tests, closed-form
least-squares fits.

The reference pipeline stops at descriptive aggregates (its wide daily
table); analysts then ask "is activity independent of cohort?", "do
purchases differ from views?", "how does price scale with quantity?".
Each entry here answers one of those with EXACT arithmetic end-to-end:
counts and integer-cents power sums accumulate order-independently
(BIGINT / DECIMAL(38) — never double accumulators), and any final
statistic that needs real division/sqrt is a fixed, identical IEEE
expression over those exact integers in both engines (the ts9/a10
recipe), so the value hash certifies the math bit-for-bit.

Scale shape: every entry is ONE hash-aggregate over the fact table
(map-side partials, no shuffle wider than the group count) followed by
arithmetic over the tiny group frame — the cheapest possible plan at
100 TB. Nothing here collects, joins wide, or windows over rows.

Overflow discipline: per-row 2-factor products stay in BIGINT (the
exact.py envelope); any cross-GROUP product of two sums (chi-square's
R*C, OLS's n*Sxy) is promoted to DECIMAL(38,0) on the Spark side and
HUGEINT on the DuckDB side BEFORE multiplying, and integer division is
`div` / `//` (both truncate for the non-negative quantities used here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.sources.tables import load_table

# --- a27: chi-square test of independence -------------------------------

CHISQ_COHORTS = 8  # user_id % 8 buckets


def a27_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence screen over the (event_type x user-cohort)
    contingency table — "does behavior mix differ by cohort?", the first
    question asked of any segmentation. Emits the full per-cell table:
    observed count, row/column marginals, and the cell's chi-square
    contribution in exact integer ppm:

        contrib_ppm = (O*N - R*C)^2 * 10^6  div  (R*C*N)

    which is the classic (O-E)^2/E with E = R*C/N multiplied through by
    N^2/N^2 — ALL integer arithmetic, so both engines round identically
    (no expected-count doubles anywhere). The statistic itself is the
    sum of the 40 contribution cells; shipping the cells (not just the
    scalar) is deliberate — residual analysis needs exactly this frame.

    Exactness envelope: (O*N - R*C) <= N^2, squared <= N^4 — 10^24 at
    1M events, 10^56 at 100 TB row counts, so the products are built in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB); at trillions of rows the
    same query runs with the cells pre-divided by a common 10^k.

    Domain completeness: the table is over the FULL domain — every
    observed event_type crossed with all {CHISQ_COHORTS} cohorts (the
    cohort domain is 0..{CHISQ_COHORTS}-1 by construction of the
    modulus) — with O=0 for combinations no event hit, so each zero
    cell contributes its full (0-E)^2/E = R*C*10^6 div N term instead
    of being silently absent (the r7 observed-cells-only form lost
    those terms). Zero cells cost nothing extra: the per-event_type
    aggregate computes all {CHISQ_COHORTS} cohort counts as unrolled
    conditional sums in the SAME single pass, and ``posexplode``
    unrolls that fixed-width row back to cells — no domain join, no
    second scan.

    Scale shape: one hash-aggregate (map-side partials of
    {CHISQ_COHORTS} longs per event_type) to the per-type row, a
    posexplode of the {CHISQ_COHORTS}-element array, then window sums
    over the 40-cell frame for the marginals (single partition of 40
    rows — free), then pure projection. No joins, no second fact scan.
    """
    ev = load_table(spark, sf_dir, "events")
    cohort = F.col("user_id") % CHISQ_COHORTS
    per_type = ev.groupBy("event_type").agg(
        F.array(
            *[
                F.sum(F.when(cohort == k, 1).otherwise(0))
                for k in range(CHISQ_COHORTS)
            ]
        ).alias("os")
    )
    cells = per_type.select(
        "event_type", F.posexplode("os").alias("cohort_i", "o")
    ).select("event_type", F.col("cohort_i").cast("long").alias("cohort"), "o")
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("cohort")
    wn = Window.partitionBy()
    t = (
        cells.withColumn("r_marg", F.sum("o").over(wr))
        .withColumn("c_marg", F.sum("o").over(wc))
        .withColumn("n_total", F.sum("o").over(wn))
    )
    return t.select(
        "event_type",
        "cohort",
        "o",
        "r_marg",
        "c_marg",
        "n_total",
        F.expr(
            "CAST((CAST(o AS DECIMAL(38,0)) * CAST(n_total AS DECIMAL(38,0))"
            "  - CAST(r_marg AS DECIMAL(38,0)) * CAST(c_marg AS DECIMAL(38,0)))"
            " * (CAST(o AS DECIMAL(38,0)) * CAST(n_total AS DECIMAL(38,0))"
            "  - CAST(r_marg AS DECIMAL(38,0)) * CAST(c_marg AS DECIMAL(38,0)))"
            " * CAST(1000000 AS DECIMAL(38,0))"
            " div (CAST(r_marg AS DECIMAL(38,0)) * CAST(c_marg AS DECIMAL(38,0))"
            "      * CAST(n_total AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("contrib_ppm"),
    ).orderBy("event_type", "cohort")


A27_ORACLE = f"""
WITH observed AS (
  SELECT event_type, user_id % {CHISQ_COHORTS} AS cohort,
         COUNT(*) AS o_raw
  FROM events GROUP BY 1, 2
),
domain AS (
  SELECT e.event_type, CAST(gs.range AS BIGINT) AS cohort
  FROM (SELECT DISTINCT event_type FROM events) e
  CROSS JOIN range(0, {CHISQ_COHORTS}) gs
),
cells AS (
  SELECT d.event_type, d.cohort, COALESCE(o.o_raw, 0) AS o
  FROM domain d
  LEFT JOIN observed o
    ON o.event_type = d.event_type AND o.cohort = d.cohort
),
marg AS (
  SELECT event_type, cohort, o,
         SUM(o) OVER (PARTITION BY event_type) AS r_marg,
         SUM(o) OVER (PARTITION BY cohort) AS c_marg,
         SUM(o) OVER () AS n_total
  FROM cells
)
SELECT event_type, cohort,
       CAST(o AS BIGINT) AS o,
       CAST(r_marg AS BIGINT) AS r_marg,
       CAST(c_marg AS BIGINT) AS c_marg,
       CAST(n_total AS BIGINT) AS n_total,
       CAST((CAST(o AS HUGEINT) * CAST(n_total AS HUGEINT)
              - CAST(r_marg AS HUGEINT) * CAST(c_marg AS HUGEINT))
            * (CAST(o AS HUGEINT) * CAST(n_total AS HUGEINT)
              - CAST(r_marg AS HUGEINT) * CAST(c_marg AS HUGEINT))
            * CAST(1000000 AS HUGEINT)
            // (CAST(r_marg AS HUGEINT) * CAST(c_marg AS HUGEINT)
                * CAST(n_total AS HUGEINT)) AS BIGINT) AS contrib_ppm
FROM marg ORDER BY event_type, cohort
"""


# --- a28: Welch two-sample t-test ---------------------------------------

TTEST_COHORTS = 4
TTEST_A = "purchase"
TTEST_B = "view"


def a28_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of mean event value,
    '{TTEST_A}' vs '{TTEST_B}', per user cohort — the A/B-readout
    primitive (unequal n, unequal variance is the production default;
    Student's pooled test is the special case nobody's data satisfies).

    One conditional hash-aggregate collects the six exact sufficient
    statistics per cohort (n, sum-cents, sum-cents-squared for each
    side — BIGINT end-to-end; cents^2 per row <= 2.5e9 keeps the group
    sums inside int64 to ~3.7e9 rows per group, past which the sum is
    promoted to DECIMAL exactly like exact.py documents). The t
    statistic and Welch-Satterthwaite df are then a FIXED sequence of
    IEEE double ops over those exact integers — identical text in both
    engines, so the rounded values hash-match (the ts9 recipe):

        v    = (SS - S*S/n) / (n-1)          (per side)
        t    = (m_a - m_b) / sqrt(v_a/n_a + v_b/n_b)
        df_w = (v_a/n_a + v_b/n_b)^2
               / ((v_a/n_a)^2/(n_a-1) + (v_b/n_b)^2/(n_b-1))

    Degenerate-cohort guards (identical in both engines): cohorts
    without at least two observations PER SIDE are filtered out
    (HAVING n_a > 1 AND n_b > 1 — the test is undefined there), and
    the t/df divisions go through NULLIF so a zero-variance cohort
    yields NULL rather than engine-dependent inf/NaN (Spark's Divide
    returns NULL on /0, DuckDB's IEEE division returns inf — without
    the NULLIF the hash diverges exactly when the data is skewed).
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(TTEST_A, TTEST_B)
    )
    c = F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    is_a = F.col("event_type") == TTEST_A
    g = ev.groupBy((F.col("user_id") % TTEST_COHORTS).alias("cohort")).agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(is_a, c).otherwise(0)).alias("s_a"),
        F.sum(F.when(is_a, c * c).otherwise(0)).alias("ss_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(~is_a, c).otherwise(0)).alias("s_b"),
        F.sum(F.when(~is_a, c * c).otherwise(0)).alias("ss_b"),
    )
    g = g.where((F.col("n_a") > 1) & (F.col("n_b") > 1))
    # the double finish: expression text kept STRUCTURALLY IDENTICAL
    # to the oracle's (see module docstring)
    stats = g.selectExpr(
        "cohort",
        "n_a",
        "n_b",
        "CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS m_a",
        "CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS m_b",
        "(CAST(ss_a AS DOUBLE)"
        " - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))"
        " / (CAST(n_a AS DOUBLE) - 1) AS v_a",
        "(CAST(ss_b AS DOUBLE)"
        " - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
        " / (CAST(n_b AS DOUBLE) - 1) AS v_b",
    )
    se = "(v_a / CAST(n_a AS DOUBLE) + v_b / CAST(n_b AS DOUBLE))"
    t_expr = f"ROUND((m_a - m_b) / NULLIF(sqrt({se}), 0), 6)"
    df_expr = (
        f"ROUND({se} * {se} / NULLIF("
        f"(v_a / CAST(n_a AS DOUBLE)) * (v_a / CAST(n_a AS DOUBLE))"
        f"   / (CAST(n_a AS DOUBLE) - 1)"
        f" + (v_b / CAST(n_b AS DOUBLE)) * (v_b / CAST(n_b AS DOUBLE))"
        f"   / (CAST(n_b AS DOUBLE) - 1), 0), 6)"
    )
    return stats.selectExpr(
        "cohort",
        "n_a",
        "n_b",
        "ROUND(m_a, 6) AS mean_a_cents",
        "ROUND(m_b, 6) AS mean_b_cents",
        f"{t_expr} AS t_stat",
        f"{df_expr} AS df_welch",
    ).orderBy("cohort")


A28_ORACLE = f"""
WITH g AS (
  SELECT user_id % {TTEST_COHORTS} AS cohort,
         SUM(CASE WHEN event_type = '{TTEST_A}' THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN event_type = '{TTEST_A}'
             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS s_a,
         SUM(CASE WHEN event_type = '{TTEST_A}'
             THEN CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS ss_a,
         SUM(CASE WHEN event_type = '{TTEST_B}' THEN 1 ELSE 0 END) AS n_b,
         SUM(CASE WHEN event_type = '{TTEST_B}'
             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS s_b,
         SUM(CASE WHEN event_type = '{TTEST_B}'
             THEN CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS ss_b
  FROM events
  WHERE event_type IN ('{TTEST_A}', '{TTEST_B}')
  GROUP BY 1
  HAVING SUM(CASE WHEN event_type = '{TTEST_A}' THEN 1 ELSE 0 END) > 1
     AND SUM(CASE WHEN event_type = '{TTEST_B}' THEN 1 ELSE 0 END) > 1
),
stats AS (
  SELECT cohort, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS m_a,
      CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS m_b,
      (CAST(ss_a AS DOUBLE)
         - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        / (CAST(n_a AS DOUBLE) - 1) AS v_a,
      (CAST(ss_b AS DOUBLE)
         - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        / (CAST(n_b AS DOUBLE) - 1) AS v_b
  FROM g
)
SELECT cohort, n_a, n_b,
       ROUND(m_a, 6) AS mean_a_cents,
       ROUND(m_b, 6) AS mean_b_cents,
       ROUND((m_a - m_b)
             / NULLIF(sqrt((v_a / CAST(n_a AS DOUBLE)
                            + v_b / CAST(n_b AS DOUBLE))), 0),
             6) AS t_stat,
       ROUND((v_a / CAST(n_a AS DOUBLE) + v_b / CAST(n_b AS DOUBLE))
             * (v_a / CAST(n_a AS DOUBLE) + v_b / CAST(n_b AS DOUBLE))
             / NULLIF((v_a / CAST(n_a AS DOUBLE))
                        * (v_a / CAST(n_a AS DOUBLE))
                        / (CAST(n_a AS DOUBLE) - 1)
                      + (v_b / CAST(n_b AS DOUBLE))
                        * (v_b / CAST(n_b AS DOUBLE))
                        / (CAST(n_b AS DOUBLE) - 1), 0), 6) AS df_welch
FROM stats ORDER BY cohort
"""


# --- a29: closed-form least-squares fit ---------------------------------

def a29_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(returnflag, linestatus) simple linear regression of line
    price on quantity — the closed-form least-squares fit from the five
    power sums, i.e. "regression as an aggregate", the shape that runs
    in ONE pass at any scale (no gradient steps, no feature matrix):

        slope      = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)
        intercept  = (Sy - slope*Sx) / n

    Both are emitted in exact integer ppm: the numerator/denominator
    are exact integer-cents sums promoted to DECIMAL(38,0)/HUGEINT
    before the cross-sum products (n*Sxy ~ 5e20 at sf0.1 — past int64,
    well inside 38 digits to ~1e9-row groups), and the divisions are
    integer `div`:

        slope_ppm     = (n*Sxy - Sx*Sy) * 10^6 div (n*Sxx - Sx*Sx)
        intercept_ppm = (Sy * 10^6 div n) - (slope_ppm * Sx div n)

    (intercept_ppm is DEFINED by that ppm-truncated formula — the two
    engines agree bit-for-bit, and it is within 1ppm-of-x-scale of the
    real-valued intercept.) x = quantity cents, y = extendedprice
    cents, so slope_ppm reads "price cents per quantity cent * 10^6".

    Scale shape: one map-side-combinable hash aggregate over lineitem
    (six BIGINT sums per group), then constant arithmetic on the tiny
    group frame. The same plan at 100 TB is scan + partial agg +
    6-group final agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.expr("CAST(round(l_quantity * 100, 0) AS BIGINT)")
    y = F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    slope_num = (
        "(CAST(n AS DECIMAL(38,0)) * CAST(sxy AS DECIMAL(38,0))"
        " - CAST(sx AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0)))"
    )
    slope_den = (
        "(CAST(n AS DECIMAL(38,0)) * CAST(sxx AS DECIMAL(38,0))"
        " - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)))"
    )
    return g.selectExpr(
        "l_returnflag",
        "l_linestatus",
        "n",
        "sx",
        "sy",
        f"CAST({slope_num} * CAST(1000000 AS DECIMAL(38,0))"
        f" div {slope_den} AS BIGINT) AS slope_ppm",
    ).selectExpr(
        "l_returnflag",
        "l_linestatus",
        "n",
        "slope_ppm",
        "CAST((CAST(sy AS DECIMAL(38,0)) * 1000000 div n)"
        " - (CAST(slope_ppm AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))"
        "    div n) AS BIGINT) AS intercept_ppm",
    ).orderBy("l_returnflag", "l_linestatus")


A29_ORACLE = """
WITH g AS (
  SELECT l_returnflag, l_linestatus,
         COUNT(*) AS n,
         SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS sx,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
         SUM(CAST(round(l_quantity * 100) AS BIGINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy,
         SUM(CAST(round(l_quantity * 100) AS BIGINT)
             * CAST(round(l_quantity * 100) AS BIGINT)) AS sxx
  FROM lineitem GROUP BY 1, 2
),
fit AS (
  SELECT l_returnflag, l_linestatus,
         CAST(n AS BIGINT) AS n, CAST(sx AS BIGINT) AS sx,
         CAST(sy AS BIGINT) AS sy,
         CAST((CAST(n AS HUGEINT) * CAST(sxy AS HUGEINT)
               - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT))
              * CAST(1000000 AS HUGEINT)
              // (CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT)
                  - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT))
              AS BIGINT) AS slope_ppm
  FROM g
)
SELECT l_returnflag, l_linestatus, n, slope_ppm,
       CAST((CAST(sy AS HUGEINT) * 1000000 // n)
            - (CAST(slope_ppm AS HUGEINT) * CAST(sx AS HUGEINT) // n)
            AS BIGINT) AS intercept_ppm
FROM fit ORDER BY l_returnflag, l_linestatus
"""


# --- a30: two-sample Kolmogorov-Smirnov statistic ------------------------

KS_COHORTS = 4
KS_A = "purchase"
KS_B = "view"


def a30_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the '{KS_A}' and
    '{KS_B}' value distributions, per user cohort — the distribution-
    SHAPE test that complements a28's location test (Welch only sees
    means; KS sees any CDF difference, the standard drift/AB-shape
    screen).

    Exactness: D = max_x |F_a(x) - F_b(x)| evaluated at the pooled
    sample points. Multiplying through by n_a*n_b makes every term an
    integer: d_scaled = max |ca*n_b - cb*n_a| over the running
    conditional counts (ca, cb) in cents order — no ECDF doubles
    anywhere. The reported d_stat = round(d_scaled / (n_a*n_b), 6) is
    one identical IEEE division per cohort (n_a*n_b <= ~1e10 at sf0.1,
    exact in doubles; at 100-TB counts both engines promote the same
    way — and d_scaled itself is the certified integer).

    Scale shape: one hash-aggregate to the (cohort, cents) conditional
    counts, a per-cohort running-sum window over that BOUNDED distinct-
    value frame (distinct cents per cohort, not rows), one final max
    aggregate. The fact table is scanned once.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(KS_A, KS_B)
    )
    c = F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    is_a = F.col("event_type") == KS_A
    pts = ev.groupBy(
        (F.col("user_id") % KS_COHORTS).alias("cohort"), c.alias("cents")
    ).agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("da"),
        F.sum(F.when(~is_a, 1).otherwise(0)).alias("db"),
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("cohort")
    run = pts.select(
        "cohort",
        F.sum("da").over(w).alias("ca"),
        F.sum("db").over(w).alias("cb"),
        F.sum("da").over(wall).alias("n_a"),
        F.sum("db").over(wall).alias("n_b"),
    )
    return (
        run.groupBy("cohort")
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max(
                F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a"))
            ).alias("d_scaled"),
        )
        .selectExpr(
            "cohort",
            "n_a",
            "n_b",
            "d_scaled",
            "ROUND(CAST(d_scaled AS DOUBLE)"
            " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS d_stat",
        )
        .orderBy("cohort")
    )


A30_ORACLE = f"""
WITH pts AS (
  SELECT user_id % {KS_COHORTS} AS cohort,
         CAST(round(value * 100) AS BIGINT) AS cents,
         SUM(CASE WHEN event_type = '{KS_A}' THEN 1 ELSE 0 END) AS da,
         SUM(CASE WHEN event_type = '{KS_B}' THEN 1 ELSE 0 END) AS db
  FROM events WHERE event_type IN ('{KS_A}', '{KS_B}')
  GROUP BY 1, 2
),
run AS (
  SELECT cohort,
         SUM(da) OVER (PARTITION BY cohort ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
         SUM(db) OVER (PARTITION BY cohort ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
         SUM(da) OVER (PARTITION BY cohort) AS n_a,
         SUM(db) OVER (PARTITION BY cohort) AS n_b
  FROM pts
)
SELECT cohort,
       CAST(MAX(n_a) AS BIGINT) AS n_a,
       CAST(MAX(n_b) AS BIGINT) AS n_b,
       CAST(MAX(abs(ca * n_b - cb * n_a)) AS BIGINT) AS d_scaled,
       ROUND(CAST(MAX(abs(ca * n_b - cb * n_a)) AS DOUBLE)
             / (CAST(MAX(n_a) AS DOUBLE) * CAST(MAX(n_b) AS DOUBLE)), 6)
           AS d_stat
FROM run GROUP BY cohort ORDER BY cohort
"""


# --- a31: Mann-Whitney U (rank-sum) test ---------------------------------

MWU_COHORTS = 4
MWU_A = "purchase"
MWU_B = "view"


def a31_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between '{MWU_A}' and
    '{MWU_B}' values per cohort — the NONPARAMETRIC location test
    (a28's Welch assumes rough normality; rank tests don't), with
    textbook midrank tie handling, entirely in integers.

    Exactness: for a tie group of ``cnt`` values starting at min-rank
    ``r`` the average rank is r + (cnt-1)/2 — a half-integer — so
    everything is carried DOUBLED: 2*avgrank = 2*cum - cnt + 1 where
    ``cum`` is the running total count through this value. Then
    r2_a = sum(da * (2*cum - cnt + 1)) is twice the A rank-sum and
    u2_a = r2_a - n_a*(n_a+1) twice the U statistic — all BIGINT, no
    rounding anywhere. BOTH rank-sums are computed independently
    (r2_b from the B-side counts, not by subtraction), so the emitted
    ``identity_ok`` column — u2_a + u2_b = 2*n_a*n_b — is a real
    cross-check of the midrank computation: it only holds when the two
    independently-summed doubled rank-sums add to n*(n+1), i.e. when
    the midranks actually partition 1..n.

    Scale shape: identical to a30 — one conditional hash-aggregate to
    the bounded (cohort, cents) frame, one running-sum window over it,
    one final aggregate. Single fact scan.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(MWU_A, MWU_B)
    )
    c = F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    is_a = F.col("event_type") == MWU_A
    pts = ev.groupBy(
        (F.col("user_id") % MWU_COHORTS).alias("cohort"), c.alias("cents")
    ).agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("da"),
        F.sum(F.when(~is_a, 1).otherwise(0)).alias("db"),
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select(
        "cohort",
        "da",
        "db",
        (F.col("da") + F.col("db")).alias("cnt"),
        F.sum(F.col("da") + F.col("db")).over(w).alias("cum"),
    )
    g = run.groupBy("cohort").agg(
        F.sum("da").alias("n_a"),
        F.sum("db").alias("n_b"),
        F.sum(
            F.col("da") * (F.lit(2) * F.col("cum") - F.col("cnt") + F.lit(1))
        ).alias("r2_a"),
        F.sum(
            F.col("db") * (F.lit(2) * F.col("cum") - F.col("cnt") + F.lit(1))
        ).alias("r2_b"),
    )
    return g.selectExpr(
        "cohort",
        "n_a",
        "n_b",
        "r2_a",
        "r2_a - n_a * (n_a + 1) AS u2_a",
        "r2_b - n_b * (n_b + 1) AS u2_b",
        "(r2_a - n_a * (n_a + 1)) + (r2_b - n_b * (n_b + 1))"
        " = 2 * n_a * n_b AS identity_ok",
    ).orderBy("cohort")


A31_ORACLE = f"""
WITH pts AS (
  SELECT user_id % {MWU_COHORTS} AS cohort,
         CAST(round(value * 100) AS BIGINT) AS cents,
         SUM(CASE WHEN event_type = '{MWU_A}' THEN 1 ELSE 0 END) AS da,
         SUM(CASE WHEN event_type = '{MWU_B}' THEN 1 ELSE 0 END) AS db
  FROM events WHERE event_type IN ('{MWU_A}', '{MWU_B}')
  GROUP BY 1, 2
),
run AS (
  SELECT cohort, da, db, da + db AS cnt,
         SUM(da + db) OVER (PARTITION BY cohort ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM pts
),
g AS (
  SELECT cohort,
         CAST(SUM(da) AS BIGINT) AS n_a,
         CAST(SUM(db) AS BIGINT) AS n_b,
         CAST(SUM(da * (2 * cum - cnt + 1)) AS BIGINT) AS r2_a,
         CAST(SUM(db * (2 * cum - cnt + 1)) AS BIGINT) AS r2_b
  FROM run GROUP BY cohort
)
SELECT cohort, n_a, n_b, r2_a,
       r2_a - n_a * (n_a + 1) AS u2_a,
       r2_b - n_b * (n_b + 1) AS u2_b,
       (r2_a - n_a * (n_a + 1)) + (r2_b - n_b * (n_b + 1))
        = 2 * n_a * n_b AS identity_ok
FROM g ORDER BY cohort
"""


# --- a33: approximate-percentile windows (the GK sketch surface) --------

APCTL_FRAME = 30  # trailing frame rows; full frames only are emitted
APCTL_ACCURACY = 1000  # >> frame size: the GK sketch's EXACT regime
APCTL_PS = (0.25, 0.5, 0.9)


def approx_percentile_windows_full(
    events: DataFrame,
    frame_rows: int = APCTL_FRAME,
    accuracy: int = APCTL_ACCURACY,
    ps: tuple = APCTL_PS,
) -> DataFrame:
    """PRODUCTION form of the trailing-window approximate percentiles:
    EVERY full-frame row, unsliced and unsorted. The certified catalog
    entry :func:`a33_approx_percentile_window` slices this output
    1-in-5 for delivery; full-output correctness is pinned by
    ``tests/test_properties.py::test_approx_percentile_full_matches_sorted_frame``
    over the unsliced rows. One user_id shuffle, one sort, one window
    pass; per-row frame re-aggregation is O(frame)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-(frame_rows - 1), Window.currentRow)
    ps_sql = ", ".join(str(p) for p in ps)
    qs = F.expr(
        f"percentile_approx(cents, array({ps_sql}), {accuracy})"
    ).over(frame)
    d = events.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("rn"),
        qs.alias("q"),
    )
    sel = [
        F.col("q")[i].alias(f"p{int(p * 100)}_cents")
        for i, p in enumerate(ps)
    ]
    return d.where(F.col("rn") >= frame_rows).select(
        "user_id", "event_id", *sel
    )


def a33_approx_percentile_window(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``percentile_approx`` (the Greenwald-Khanna sketch — THE
    percentile operator at 100 TB, where exact per-group sorts are
    off the table) evaluated over a trailing {APCTL_FRAME}-row window
    per user, certified EXACTLY: the frame bounds the observation
    count at {APCTL_FRAME} <= accuracy={APCTL_ACCURACY}, so the GK
    buffer never compresses and the sketch is in its exact regime BY
    CONSTRUCTION — at any scale factor, because the frame (not the
    corpus) bounds n. What the hash certifies is the sketch's exact-
    regime RANK CONVENTION, pinned empirically (30/30 probes, r9) as
    ``sorted[ceil(p*n) - 1]``: the oracle re-derives each percentile
    by explicit sorted-frame indexing (list_sort + 1-based element
    ``ceil(p*30)``), NOT via DuckDB's own quantile_disc, whose
    ``floor(p*(n-1))`` convention diverges at e.g. (n=30, p=0.75).
    Only FULL frames are emitted — partial frames at a partition head
    would re-open the cross-engine convention gap at small n.

    Scale shape: one user_id shuffle, one sort, one window pass (the
    per-row frame re-aggregation is O(frame) like ts6's moving
    median); delivery is the ts5 recipe — this is the CERTIFIED 1-in-5
    SLICE of the full-output production twin
    :func:`approx_percentile_windows_full` (which this delegates to,
    so the two cannot drift; the twin's unsliced rows are pinned by
    its property test). In production the same expression with the
    corpus-sized group and a finite accuracy is the documented
    approximate path (rank error <= n/accuracy), which is what the
    operator exists for."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
    )
    return (
        approx_percentile_windows_full(ev)
        .where(F.col("event_id") % 5 == 0)
        .repartition(1)
        .sortWithinPartitions("event_id")
    )


def _apctl_idx(p: float) -> int:
    import math

    return math.ceil(p * APCTL_FRAME)  # 1-based sorted-frame index


A33_ORACLE = f"""
WITH base AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
win AS (
  SELECT user_id, event_id,
         list(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN {APCTL_FRAME - 1} PRECEDING AND CURRENT ROW) AS vs,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM base
)
SELECT user_id, event_id,
       list_sort(vs)[{_apctl_idx(0.25)}] AS p25_cents,
       list_sort(vs)[{_apctl_idx(0.5)}] AS p50_cents,
       list_sort(vs)[{_apctl_idx(0.9)}] AS p90_cents
FROM win
WHERE rn >= {APCTL_FRAME} AND event_id % 5 = 0
ORDER BY event_id
"""
