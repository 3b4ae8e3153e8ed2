"""Deterministic sketch operators: KMV distinct-count, JL projection.

Sketches are how a 100 TB engine answers "how many distinct / how
similar" without holding exact state. Spark's built-ins
(``approx_count_distinct`` HLL++, ``BucketedRandomProjectionLSH``) are
engine-internal and RNG-seeded, so the oracle cannot reproduce them;
these twins are built from the portable md5 hash family instead —
identical math in Spark and DuckDB, so the driver's value-hash gate
certifies the *sketch algorithm*, not just a row count.

* **KMV (k-minimum-values)** — keep the k smallest 60-bit hashes of the
  key; NDV ~= (k-1) * H / h_k where h_k is the k-th minimum and H the
  hash domain. Mergeable (union of min-sets), one shuffle, O(k) state
  per group: the classic distributed distinct-count sketch
  (Bar-Yossef et al., "Counting distinct elements in a data stream").
* **JL random projection** — 64-dim embeddings down to 16 dims with a
  +-1 sign matrix / sqrt(d): distance-preserving in expectation
  (Johnson-Lindenstrauss; Achlioptas signs). The sign matrix derives
  from md5 like the LSH hyperplanes, so both engines multiply the
  same matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.functions.hashing import (
    duckdb_md5_long,
    duckdb_md5_long_seeded,
    md5_long,
)
from personal_health_etl_pipeline_spark.operators.similarity import hyperplane_signs
from personal_health_etl_pipeline_spark.sources.tables import load_table

# --- KMV distinct-count sketch ----------------------------------------

KMV_K = 256
_H_DOMAIN = float(16 ** 15)  # md5_long range [0, 2^60)


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user estimate from a 256-minimum-values
    sketch, next to the exact count so the audit shows the error.

    Scale shape: the distinct pass shuffles (type, hash) pairs once;
    the rank window then operates on *distinct* hashes only. At real
    scale the k-min set would be kept by a partial top-k aggregate
    (O(k) executor state, mergeable across partitions) — the window
    formulation here is the same algorithm with Spark picking the
    physical plan. Estimate arithmetic is integer/IEEE-deterministic:
    bigint hash -> double divide -> floor.
    """
    events = load_table(spark, sf_dir, "events")
    d = events.select(
        "event_type", md5_long("user_id").alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = d.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= KMV_K)
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_mins"),
            F.max("h").alias("kth_min"),
        )
        .join(
            events.groupBy("event_type").agg(
                F.countDistinct("user_id").alias("exact_ndv")
            ),
            "event_type",
        )
        .select(
            "event_type",
            # a group with fewer than k distinct keys is exact by definition
            F.when(F.col("n_mins") < KMV_K, F.col("n_mins"))
            .otherwise(
                F.floor(
                    (F.lit(KMV_K - 1) * F.lit(_H_DOMAIN))
                    / F.col("kth_min").cast("double")
                ).cast("bigint")
            )
            .alias("est_ndv"),
            "exact_ndv",
        )
        .orderBy("event_type")
    )


SKETCH_KMV_ORACLE = rf"""
WITH d AS (
  SELECT DISTINCT event_type, {duckdb_md5_long("user_id")} AS h FROM events
),
r AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM d
),
mins AS (
  SELECT event_type, COUNT(*) AS n_mins, MAX(h) AS kth_min
  FROM r WHERE rn <= {KMV_K} GROUP BY event_type
),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_ndv
  FROM events GROUP BY event_type
)
SELECT m.event_type,
       CASE WHEN n_mins < {KMV_K} THEN n_mins
            ELSE CAST(FLOOR({KMV_K - 1} * {_H_DOMAIN!r} / CAST(kth_min AS DOUBLE))
                      AS BIGINT) END AS est_ndv,
       exact_ndv
FROM mins m JOIN exact e ON m.event_type = e.event_type
ORDER BY m.event_type
"""


# --- Johnson-Lindenstrauss random projection --------------------------

JL_OUT_DIMS = 16
JL_IN_DIMS = 64
_JL_TABLE_SEED = 97  # disjoint from the LSH tables' seeds


def _jl_signs() -> list[list[int]]:
    return hyperplane_signs(JL_OUT_DIMS, JL_IN_DIMS, table=_JL_TABLE_SEED)


def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64 -> 16 dim JL projection of every embedding: out_j =
    dot(quantized_vec, signs_j) / (sqrt(64) * 1e6) = dot * 125 / 1e9.

    Scale shape: pure map — one scan, no shuffle, each output dim one
    integer dot product (single SQL expression, cf. lsh_bucket_sql for
    why it is built as text). The exact-integer dot makes the double
    division the only float step, identical in both engines.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    signs = _jl_signs()
    # out_j = dot / (8 * 1e6) = dot * 125 / 1e9. dot*125 < 2^53 so the
    # numerator is exact in a double and the single division is
    # correctly rounded — bit-identical in Spark and DuckDB. (A final
    # ROUND(x, 6) would NOT be: decimal rounding of doubles differs
    # between engines at .5 boundaries.)
    dims = []
    for j, row in enumerate(signs):
        arr = ",".join(f"{s}L" for s in row)
        dims.append(
            f"CAST(aggregate(zip_with(_q, array({arr}), (x, s) -> x * s),"
            f" 0L, (a, x) -> a + x) * 125 AS DOUBLE) / 1.0e9"
        )
    # one row per (vec_id, dim): external hashers canonicalize via pandas
    # sort_values over every column, which throws on array cells, so the
    # projected vector is posexploded to scalar rows (gate:
    # tests/parity.py::assert_scalar_output).
    return (
        emb.select(
            "vec_id",
            F.expr(
                "transform(embedding, x -> "
                "CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))"
            ).alias("_q"),
        )
        .select(
            "vec_id",
            F.posexplode(F.expr(f"array({','.join(dims)})")).alias(
                "dim", "projected"
            ),
        )
        .withColumn("dim", F.col("dim").cast("long"))
        .orderBy("vec_id", "dim")
    )


def _jl_oracle() -> str:
    signs = _jl_signs()
    dims = []
    for row in signs:
        arr = ",".join(str(s) for s in row)
        dims.append(
            f"CAST(list_sum(list_transform(range(1, {JL_IN_DIMS + 1}),"
            f" i -> qv[i] * ([{arr}])[i])) * 125 AS DOUBLE) / 1.0e9"
        )
    return rf"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x ->
           CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS qv
  FROM embeddings
),
proj AS (
  SELECT vec_id, [{",".join(dims)}] AS pv
  FROM q
)
SELECT vec_id, k AS dim, pv[CAST(k + 1 AS INTEGER)] AS projected
FROM proj, range(0, {JL_OUT_DIMS}) r(k)
ORDER BY vec_id, dim
"""


EMB_RANDOM_PROJECTION_ORACLE = _jl_oracle()


# --- hash-sample quantile sketch --------------------------------------

SQ_SAMPLE = 1024
SQ_QUANTILES = (25, 50, 75, 90, 99)


def sketch_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimates from a deterministic 1024-row hash sample of
    lineitem prices — the sketch that replaces a full sort at 100 TB.

    The sample is the ``SQ_SAMPLE`` rows with the smallest portable row
    hash (a KMV-style uniform sample: mergeable top-k aggregate, O(k)
    executor state, one scan). Quantile q = the value at rank
    ``floor(q * (m - 1)) + 1`` of the sample sorted by (value, hash) —
    the hash tie-break makes the rank total-ordered, so both engines
    pick the identical row. Exact percentiles over the population are
    the a8 entry; this is the scale path next to it.
    """
    li = load_table(spark, sf_dir, "lineitem")
    m = SQ_SAMPLE
    sample = (
        li.select(
            F.col("l_extendedprice").alias("value"),
            md5_long(
                F.concat_ws("|", "l_orderkey", "l_linenumber")
            ).alias("h"),
        )
        .orderBy("h")
        .limit(m)
    )
    w = Window.orderBy("value", "h")
    ranked = sample.withColumn("rn", F.row_number().over(w))
    idx = {q: (q * (m - 1)) // 100 + 1 for q in SQ_QUANTILES}
    picks = ranked.where(F.col("rn").isin(*idx.values()))
    q_expr = F.lit(None).cast("bigint")
    for q, rn in sorted(idx.items(), reverse=True):
        q_expr = F.when(F.col("rn") == rn, F.lit(q).cast("bigint")).otherwise(
            q_expr
        )
    return picks.select(
        q_expr.alias("q_pct"),
        "value",
        F.lit(m).cast("bigint").alias("sample_size"),
    ).orderBy("q_pct")


def _sample_quantiles_oracle() -> str:
    m = SQ_SAMPLE
    pairs = ", ".join(
        f"(CAST({q} AS BIGINT), CAST({(q * (m - 1)) // 100 + 1} AS BIGINT))"
        for q in SQ_QUANTILES
    )
    return rf"""
WITH hashed AS (
  SELECT l_extendedprice AS value,
         {duckdb_md5_long("l_orderkey || '|' || l_linenumber")} AS h
  FROM lineitem
),
s AS (SELECT value, h FROM hashed ORDER BY h LIMIT {m}),
r AS (SELECT value, row_number() OVER (ORDER BY value, h) AS rn FROM s)
SELECT q_pct, value, CAST({m} AS BIGINT) AS sample_size
FROM r JOIN (VALUES {pairs}) p(q_pct, rn) USING (rn)
ORDER BY q_pct
"""


SKETCH_SAMPLE_QUANTILES_ORACLE = _sample_quantiles_oracle()


# --- count-min frequency sketch ---------------------------------------

CM_DEPTH = 4
CM_WIDTH = 1024
CM_PROBES = 20


def sketch_countmin_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min estimates for the corpus's 20 most frequent tokens,
    next to the exact counts so the audit shows the (one-sided) error.

    Build: every token increments ``CM_DEPTH`` counters, one per
    md5-seeded hash row, each ``CM_WIDTH`` wide — a (row, bucket)
    groupBy, O(depth * width) total state regardless of vocabulary.
    Query: estimate = min over rows of the probed counter, always >=
    the true count (Cormode-Muthukrishnan). Probes are the exact top
    20 by (count desc, term) — deterministic, so the whole audit is
    value-hash reproducible.
    """
    from personal_health_etl_pipeline_spark.functions import text as T
    from personal_health_etl_pipeline_spark.functions.hashing import (
        md5_long_seeded,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.tokens("text")).alias("term"))
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("true_count"))
    probes = counts.orderBy(F.col("true_count").desc(), "term").limit(CM_PROBES)

    rows = F.explode(F.expr(f"sequence(0, {CM_DEPTH - 1})")).alias("r")
    cms = (
        toks.select("term", rows)
        .select("r", (md5_long_seeded("term", 0) + F.col("r") * md5_long_seeded("term", 1)).alias("_mix"))
        .select("r", F.pmod("_mix", F.lit(CM_WIDTH)).alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probe_buckets = probes.select("term", "true_count", rows).select(
        "term",
        "true_count",
        "r",
        F.pmod(
            md5_long_seeded("term", 0) + F.col("r") * md5_long_seeded("term", 1),
            F.lit(CM_WIDTH),
        ).alias("bucket"),
    )
    # the sketch table is bounded (depth * width rows) — broadcast it
    return (
        probe_buckets.join(F.broadcast(cms), ["r", "bucket"])
        .groupBy("term", "true_count")
        .agg(F.min("c").alias("est_count"))
        .orderBy(F.col("true_count").desc(), "term")
    )


SKETCH_COUNTMIN_ORACLE = rf"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
                            x -> x <> '')) AS term
  FROM documents
),
counts AS (SELECT term, COUNT(*) AS true_count FROM toks GROUP BY term),
probes AS (SELECT term, true_count FROM counts
           ORDER BY true_count DESC, term LIMIT {CM_PROBES}),
hashed AS (
  SELECT term, r,
         ({duckdb_md5_long_seeded("term", 0)}
          + r * {duckdb_md5_long_seeded("term", 1)}) % {CM_WIDTH} AS bucket
  FROM toks, range(0, {CM_DEPTH}) rr(r)
),
cms AS (SELECT r, bucket, COUNT(*) AS c FROM hashed GROUP BY r, bucket),
probe_buckets AS (
  SELECT p.term, p.true_count, r,
         ({duckdb_md5_long_seeded("p.term", 0)}
          + r * {duckdb_md5_long_seeded("p.term", 1)}) % {CM_WIDTH} AS bucket
  FROM probes p, range(0, {CM_DEPTH}) rr(r)
)
SELECT pb.term, pb.true_count, CAST(MIN(c.c) AS BIGINT) AS est_count
FROM probe_buckets pb JOIN cms c ON pb.r = c.r AND pb.bucket = c.bucket
GROUP BY pb.term, pb.true_count
ORDER BY pb.true_count DESC, pb.term
"""


# --- int8 embedding quantization audit --------------------------------

INT8_MAX = 127


def emb_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization audit — the compression
    every large vector store applies (4x smaller than f32, 32x smaller
    than the raw grid): ``code_i = round(q_i * 127 / amax)`` with
    ``amax = max(|q_i|)``, reconstruction ``round(code_i * amax /
    127)``. Reports per vector the scale, the code-range proof
    (max |code| <= 127) and the exact squared reconstruction error on
    the integer grid — the quality number that decides whether int8 is
    safe for a given corpus.

    Scale shape: a pure map over the vector column (quantize, two
    array transforms, one aggregate fold) — no shuffle, no state.
    Zero vectors carry no direction to preserve; they are excluded
    identically in both engines (amax > 0).
    """
    from personal_health_etl_pipeline_spark.operators.similarity import (
        quantize,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        F.col("vec_id"), quantize(F.col("embedding")).alias("_q")
    ).withColumn(
        "amax",
        F.expr("aggregate(_q, 0L, (a, x) -> greatest(a, abs(x)))"),
    ).where(F.col("amax") > 0)
    codes = q.withColumn(
        "_c",
        F.expr(
            f"transform(_q, x -> cast(round(x * {INT8_MAX} "
            f"/ cast(amax as double), 0) as bigint))"
        ),
    )
    return codes.select(
        "vec_id",
        "amax",
        F.expr("aggregate(_c, 0L, (a, x) -> greatest(a, abs(x)))").alias(
            "max_abs_code"
        ),
        F.expr(
            f"aggregate(zip_with(_q, transform(_c, c -> cast(round("
            f"c * amax / cast({INT8_MAX} as double), 0) as bigint)),"
            f" (x, r) -> (x - r) * (x - r)), 0L, (a, x) -> a + x)"
        ).alias("l2_err"),
    )


_Q8 = (
    "list_transform(embedding, x -> "
    "CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))"
)

EMB_INT8_ORACLE = rf"""
WITH q AS (
  SELECT vec_id, {_Q8} AS qv FROM embeddings
),
am AS (
  SELECT vec_id, qv,
         list_max(list_transform(qv, x -> abs(x))) AS amax
  FROM q
),
codes AS (
  SELECT vec_id, qv, amax,
         list_transform(qv, x -> CAST(round(x * {INT8_MAX}
             / CAST(amax AS DOUBLE), 0) AS BIGINT)) AS c
  FROM am WHERE amax > 0
)
SELECT vec_id,
       amax,
       list_max(list_transform(c, x -> abs(x))) AS max_abs_code,
       CAST(list_sum(list_transform(range(1, len(qv) + 1),
            i -> (qv[i] - CAST(round(c[i] * amax
                  / CAST({INT8_MAX} AS DOUBLE), 0) AS BIGINT))
               * (qv[i] - CAST(round(c[i] * amax
                  / CAST({INT8_MAX} AS DOUBLE), 0) AS BIGINT))))
         AS BIGINT) AS l2_err
FROM codes
"""


# --- emb_covariance: distributed d x d covariance ---------------------

def emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full 64x64 covariance matrix of the embedding corpus via
    per-partition Gram partials (operators/linalg.py): Arrow-batched
    int64 X^T X per partition, one O(partitions * d^2) merge shuffle —
    the whitening/PCA precursor every embedding pipeline needs. The
    oracle unnests all (i, j) pairs; the engine never materializes a
    per-row pair explosion."""
    from personal_health_etl_pipeline_spark.operators.linalg import (
        covariance_matrix,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return covariance_matrix(emb, "embedding")


EMB_COVARIANCE_ORACLE = """
WITH q AS (
  SELECT list_transform(embedding, x ->
         CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS qv
  FROM embeddings
),
flat AS (
  SELECT i - 1 AS i, j - 1 AS j,
         qv[CAST(i AS INT)] AS xi, qv[CAST(j AS INT)] AS xj
  FROM q, range(1, 65) r1(i), range(1, 65) r2(j)
),
gram AS (
  SELECT i, j,
         CAST(SUM(xi * xj) AS BIGINT) AS sxx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM flat GROUP BY i, j
),
marg AS (
  SELECT i - 1 AS k, CAST(SUM(qv[CAST(i AS INT)]) AS BIGINT) AS s
  FROM q, range(1, 65) r(i) GROUP BY i
)
SELECT g.i, g.j,
       ROUND((CAST(g.sxx AS DOUBLE)
              - CAST(si.s AS DOUBLE) * CAST(sj.s AS DOUBLE)
                / CAST(g.n AS DOUBLE))
             / CAST(g.n AS DOUBLE) / 1000000000000.0, 8) AS cov
FROM gram g
JOIN marg si ON si.k = g.i
JOIN marg sj ON sj.k = g.j
"""


# --- HyperLogLog register sketch ---------------------------------------

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
_HLL_WBITS = 60 - HLL_P  # md5_long payload bits after the register index
# alpha_m * m^2 * 2^WBITS, written as one expression BOTH engines fold
# identically (never a pre-rounded Python float literal)
# Harmonic-sum scale is 2^(WBITS+1), NOT 2^WBITS: rho ranges over
# [1, WBITS+1] (the w == 0 register), so the per-register exponent
# WBITS+1-rho stays in [0, WBITS] — a 2^WBITS scale would need a
# NEGATIVE shift for rho = WBITS+1, which Spark's shiftleft silently
# mangles (masked shift count -> Long.MIN_VALUE) and DuckDB rejects.
# Max sum = m * 2^WBITS = 2^60 — still comfortably bigint.
_HLL_SCALE = f"(0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M * HLL_M}.0 * {1 << (_HLL_WBITS + 1)}.0"


def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user estimate from a HyperLogLog
    register sketch (Flajolet et al. 2007) — the portable twin of
    Spark's own ``approx_count_distinct`` (HLL++), whose engine seeds
    the oracle cannot reproduce. Emitted next to the exact count so
    the audit shows the error.

    Register build: hash -> low ``HLL_P`` bits pick a register, the
    remaining 52 bits w give rank rho = leading zeros + 1 (computed as
    53 - bit_length(w), pure string/integer ops); register value =
    max(rho). That is ONE (event_type, register) groupBy with a
    map-side-combining max — O(m) state per group no matter the
    cardinality, and registers merge across partitions/days by the
    same max, which is the whole point of HLL at 100 TB.

    Determinism: the 2^-rho harmonic sum is kept EXACT by scaling to
    integers (sum of 2^(53 - rho) <= m * 2^52 fits bigint), so no
    float-addition-order drift can flip the estimate; the one double
    division and the small-range ln correction round identically in
    both engines.
    """
    return hll_distinct(load_table(spark, sf_dir, "events"))


def hll_distinct(
    events: DataFrame,
    group_cols: tuple[str, ...] = ("event_type",),
    key_col: str = "user_id",
) -> DataFrame:
    """Register build + estimate body of :func:`sketch_hll_distinct`
    over any frame, grouped by ``group_cols`` (unit-testable; register
    merge = max, so the estimate is invariant under row duplication —
    the same property that lets a streaming sink keep the registers as
    its state, see ``st_hll_window``)."""
    gc = list(group_cols)
    exact = events.groupBy(*gc).agg(
        F.countDistinct(key_col).alias("exact_ndv")
    )
    return (
        hll_estimate(hll_registers(events, group_cols, key_col), group_cols)
        .join(exact, gc)
        .orderBy(*gc)
    )


def hll_registers(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("event_type",),
    key_col: str = "user_id",
) -> DataFrame:
    """The HLL register table ``(*group_cols, idx, r)`` — the sketch's
    ENTIRE state: O(m) rows per group, merged across any partitioning
    of the input (or across stored snapshots) by ``max(r)``. This is
    what a streaming sink persists per micro-batch
    (``streaming/hll_sink.py``)."""
    gc = list(group_cols)
    return (
        df.select(*gc, md5_long(key_col).alias("h"))
        .select(
            *gc,
            F.pmod("h", F.lit(HLL_M)).alias("idx"),
            F.expr(f"h div {HLL_M}").alias("w"),
        )
        .select(
            *gc,
            "idx",
            F.when(F.col("w") == 0, F.lit(_HLL_WBITS + 1))
            .otherwise(F.lit(_HLL_WBITS + 1) - F.length(F.bin("w")))
            .alias("rho"),
        )
        .groupBy(*gc, "idx")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(
    regs: DataFrame, group_cols: tuple[str, ...] = ("event_type",)
) -> DataFrame:
    """Distinct-count estimate from a register table (exact-integer
    harmonic sum, small-range ln correction)."""
    gc = list(group_cols)
    per = regs.groupBy(*gc).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST({_HLL_WBITS + 1} - r AS INT))"
            )
        ).alias("z_hit"),
    )
    zeros = F.lit(HLL_M) - F.col("n_present")
    z_int = F.col("z_hit") + zeros * F.lit(1 << (_HLL_WBITS + 1))
    e_raw = F.expr(_HLL_SCALE) / z_int.cast("double")
    e = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return per.select(*gc, F.round(e, 0).cast("bigint").alias("est_ndv"))


SKETCH_HLL_ORACLE = rf"""
WITH hashed AS (
  SELECT event_type, {duckdb_md5_long("user_id")} AS h FROM events
),
split AS (
  SELECT event_type, h % {HLL_M} AS idx, h // {HLL_M} AS w FROM hashed
),
regs AS (
  SELECT event_type, idx,
         MAX(CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                  ELSE {_HLL_WBITS + 1} - length(bin(w)) END) AS r
  FROM split GROUP BY event_type, idx
),
per AS (
  SELECT event_type, COUNT(*) AS n_present,
         SUM(CAST(1 AS BIGINT) << ({_HLL_WBITS + 1} - r)) AS z_hit
  FROM regs GROUP BY event_type
),
est AS (
  SELECT event_type,
         CAST(z_hit + ({HLL_M} - n_present) * CAST({1 << (_HLL_WBITS + 1)} AS BIGINT)
              AS DOUBLE) AS z,
         {HLL_M} - n_present AS zeros
  FROM per
),
ndv AS (
  SELECT event_type,
         CASE WHEN ({_HLL_SCALE}) / z <= {2.5 * HLL_M} AND zeros > 0
              THEN {HLL_M}.0 * ln({HLL_M}.0 / CAST(zeros AS DOUBLE))
              ELSE ({_HLL_SCALE}) / z END AS e
  FROM est
)
SELECT n.event_type, CAST(round(n.e, 0) AS BIGINT) AS est_ndv,
       x.exact_ndv
FROM ndv n JOIN (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_ndv
  FROM events GROUP BY event_type
) x USING (event_type)
ORDER BY n.event_type
"""


# --- KMV set operations: union / intersection estimates ----------------

SETOPS_K = 64  # small enough that the estimator path engages at sf0.01


def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user UNION and INTERSECTION estimates for every pair of
    event types, from merged KMV sketches — the mergeable-sketch
    algebra (theta-sketch style) that lets 1000 executors each keep
    O(k) state and still answer audience-overlap queries: union = the
    k smallest hashes of the combined streams (KMV merge is just
    re-min-ing), intersection = the Jaccard fraction OF THE UNION
    SKETCH scaled by the union estimate. Exact counts ride along so
    the output audits its own error.

    One distinct pass per (type, user), one broadcast of the tiny type-
    pair table, one shuffle on (pair, hash), one rank window, one
    groupBy — nothing driver-side. Estimate arithmetic is the same
    integer->double->floor recipe as ``sketch_kmv_distinct``, so every
    value hash-matches DuckDB."""
    events = load_table(spark, sf_dir, "events")
    # materialize the distinct pass ONCE (non-eager checkpoint, the
    # r11 scan-audit pattern): three consumers (the type table and
    # both pair-join sides) otherwise each re-derive the events scan +
    # md5 + distinct shuffle (~2.5 identical scans measured); the
    # frame is O(distinct (type, user)) — bounded — and the checkpoint
    # makes the docstring's "one distinct pass" physically true
    d = (
        events.select("event_type", md5_long("user_id").alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    types = d.select("event_type").distinct()
    pairs = (
        types.alias("x")
        .join(
            types.alias("y"),
            F.col("x.event_type") < F.col("y.event_type"),
        )
        .select(
            F.col("x.event_type").alias("ta"),
            F.col("y.event_type").alias("tb"),
        )
    )
    sides = (
        F.broadcast(pairs)
        .join(d, F.col("event_type") == F.col("ta"))
        .select("ta", "tb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            F.broadcast(pairs)
            .join(d, F.col("event_type") == F.col("tb"))
            .select(
                "ta", "tb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
            )
        )
    )
    grp = sides.groupBy("ta", "tb", "h").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    w = Window.partitionBy("ta", "tb").orderBy("h")
    ranked = grp.withColumn("rn", F.row_number().over(w))
    sk = F.col("rn") <= SETOPS_K
    agg = ranked.groupBy("ta", "tb").agg(
        F.sum(F.when(sk, 1).otherwise(0)).alias("n_mins"),
        F.max(F.when(sk, F.col("h"))).alias("kth_min"),
        F.sum(F.when(sk & (F.col("in_a") + F.col("in_b") == 2), 1).otherwise(0)).alias("n_both_sk"),
        F.count(F.lit(1)).alias("exact_union"),
        F.sum((F.col("in_a") + F.col("in_b") == 2).cast("int")).alias(
            "exact_inter"
        ),
    )
    est_union_d = (F.lit(SETOPS_K - 1) * F.lit(_H_DOMAIN)) / F.col(
        "kth_min"
    ).cast("double")
    full = F.col("n_mins") < SETOPS_K  # sketch holds the whole union
    return agg.select(
        "ta",
        "tb",
        F.when(full, F.col("n_mins"))
        .otherwise(F.floor(est_union_d).cast("bigint"))
        .alias("est_union"),
        F.when(full, F.col("n_both_sk"))
        .otherwise(
            F.floor(
                F.col("n_both_sk").cast("double")
                * est_union_d
                / F.lit(float(SETOPS_K))
            ).cast("bigint")
        )
        .alias("est_inter"),
        "exact_union",
        F.col("exact_inter").cast("bigint").alias("exact_inter"),
    ).orderBy("ta", "tb")


SKETCH_KMV_SET_OPS_ORACLE = rf"""
WITH d AS (
  SELECT DISTINCT event_type, {duckdb_md5_long("user_id")} AS h FROM events
),
types AS (SELECT DISTINCT event_type FROM d),
pairs AS (
  SELECT x.event_type AS ta, y.event_type AS tb
  FROM types x JOIN types y ON x.event_type < y.event_type
),
grp AS (
  SELECT p.ta, p.tb, d.h,
         MAX(CASE WHEN d.event_type = p.ta THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN d.event_type = p.tb THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN d ON d.event_type IN (p.ta, p.tb)
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
  FROM grp
),
agg AS (
  SELECT ta, tb,
         SUM(CASE WHEN rn <= {SETOPS_K} THEN 1 ELSE 0 END) AS n_mins,
         MAX(CASE WHEN rn <= {SETOPS_K} THEN h END) AS kth_min,
         SUM(CASE WHEN rn <= {SETOPS_K} AND in_a + in_b = 2 THEN 1
                  ELSE 0 END) AS n_both_sk,
         COUNT(*) AS exact_union,
         SUM(CASE WHEN in_a + in_b = 2 THEN 1 ELSE 0 END) AS exact_inter
  FROM ranked GROUP BY 1, 2
)
SELECT ta, tb,
       CAST(CASE WHEN n_mins < {SETOPS_K} THEN n_mins
            ELSE FLOOR({SETOPS_K - 1} * {_H_DOMAIN!r} / CAST(kth_min AS DOUBLE))
            END AS BIGINT) AS est_union,
       CAST(CASE WHEN n_mins < {SETOPS_K} THEN n_both_sk
            ELSE FLOOR(CAST(n_both_sk AS DOUBLE)
                       * ({SETOPS_K - 1} * {_H_DOMAIN!r}
                          / CAST(kth_min AS DOUBLE))
                       / {float(SETOPS_K)!r})
            END AS BIGINT) AS est_inter,
       CAST(exact_union AS BIGINT) AS exact_union,
       CAST(exact_inter AS BIGINT) AS exact_inter
FROM agg ORDER BY ta, tb
"""
