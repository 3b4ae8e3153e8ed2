"""The reference's FULL-WIDTH combined daily table, end-to-end.

``j15_oura_day_full_width`` materializes the actual 66-column
``oura_day`` warehouse schema (shipped at
``personal_health_etl_pipeline_spark/schemas/oura/oura_day.json`` —
the reference's public field list, reference
``schemas/oura/oura_day.json:2-332``): all six DAILY types fetched
full-width from the deterministic fixture, flattened (F1), array
columns serialized to JSON strings (C4), prefixed per type (P3),
full-outer combined on ``day`` (J1, reference ``transform.py:130-140``)
and aligned to the declared schema with type coercion (C5, reference
``load.py:105-181``) — the whole converter at its real width, under
the value-hash gate.

The oracle regenerates every cell independently in DuckDB from the
shared sha256 derivation (``pipeline/fixtures.py:OURA_DAILY_FULL``),
including which (type, day) cells are MISSING — so hash equality
certifies flatten naming, array serialization, the 6-way outer join's
null pattern, and the STRING->TIMESTAMP/DATE coercions for all 66
columns at once.
"""

from __future__ import annotations

import datetime as dt
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from personal_health_etl_pipeline_spark.functions.flatten import (
    flatten,
    prefix_columns,
)
from personal_health_etl_pipeline_spark.operators.combine import combine_on_key
from personal_health_etl_pipeline_spark.pipeline.fixtures import (
    LEVEL_WORDS,
    OURA_DAILY_FULL,
    SUMMARY_WORDS,
    fetch_daily_full_df,
)
from personal_health_etl_pipeline_spark.schema import load_json_schema

OURA_DAY_SCHEMA_PATH = (
    Path(__file__).resolve().parent.parent / "schemas" / "oura" / "oura_day.json"
)

J15_START = dt.date(2024, 2, 1)
J15_END = dt.date(2024, 3, 31)  # 60 days


def oura_day_target_schema():
    """The declared 66-column warehouse StructType (S9 + SURVEY §1.2)."""
    return load_json_schema(OURA_DAY_SCHEMA_PATH)


def j15_oura_day_full_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring. ``sf_dir`` is unused — this certifies the
    SOURCE+TRANSFORM layers, whose fixture is synthesized from
    ``(data_type, day, field)`` alone (the ``j13`` precedent)."""
    frames = []
    for data_type in OURA_DAILY_FULL:
        raw = fetch_daily_full_df(spark, data_type, J15_START, J15_END)
        flat = flatten(raw, arrays="json")  # F1 + C4
        frames.append(prefix_columns(flat, data_type, exclude=("day",)))  # P3
    wide = combine_on_key(frames, key="day")  # J1
    from personal_health_etl_pipeline_spark.schema import align_to_schema

    return align_to_schema(wide, oura_day_target_schema()).orderBy("day")  # C5


# --- oracle generation -------------------------------------------------

def _h_sql(data_type: str, path: str) -> str:
    return (
        f"CAST(('0x' || substr(sha256('{data_type}|' || ds || '|{path}'),"
        f" 1, 16)) AS UBIGINT)"
    )


def _case_words(h: str, words: tuple[str, ...]) -> str:
    arms = " ".join(
        f"WHEN {i} THEN '{w}'" for i, w in enumerate(words[:-1])
    )
    return f"CASE CAST({h} % 3 AS INT) {arms} ELSE '{words[-1]}' END"


def _val_sql(kind: str, data_type: str, path: str) -> str:
    h = _h_sql(data_type, path)
    if kind == "id":
        return f"'{data_type}-' || ds"
    if kind == "metric":
        return f"CAST({h} % 10000 AS DOUBLE) / 100"
    if kind == "ts":
        return (
            f"CAST(ds || 'T04:00:00.' || lpad(CAST({h} % 1000000 AS VARCHAR),"
            f" 6, '0') || '+00:00' AS TIMESTAMP)"
        )
    if kind == "ts_str":
        return (
            f"ds || 'T04:00:00.' || lpad(CAST({h} % 1000000 AS VARCHAR),"
            f" 6, '0') || '+00:00'"
        )
    if kind == "class5":
        return f"lpad(CAST({h} % 1000000000000 AS VARCHAR), 12, '0')"
    if kind == "summary":
        return _case_words(h, SUMMARY_WORDS)
    if kind == "level":
        return _case_words(h, LEVEL_WORDS)
    if kind == "int_list":
        return (
            f"'[' || CAST({h} % 97 AS VARCHAR)"
            f" || ',' || CAST(({h} // 97) % 97 AS VARCHAR)"
            f" || ',' || CAST(({h} // 9409) % 97 AS VARCHAR) || ']'"
        )
    raise ValueError(kind)


def _oura_wide_oracle() -> str:
    pres_cols = ", ".join(
        f"({_h_sql(t, 'presence')} % 10 > 0) AS p_{t}" for t in OURA_DAILY_FULL
    )
    val_cols = []
    for t, spec in OURA_DAILY_FULL.items():
        for path, kind in spec:
            col = f"{t}__{path.replace('.', '__')}"
            val_cols.append(
                f"CASE WHEN p_{t} THEN {_val_sql(kind, t, path)} END"
                f' AS "{col}"'
            )
    any_present = " OR ".join(f"p_{t}" for t in OURA_DAILY_FULL)
    vals = ",\n       ".join(val_cols)
    return f"""
WITH days AS (
  SELECT CAST(d AS DATE) AS day
  FROM generate_series(DATE '{J15_START.isoformat()}',
                       DATE '{J15_END.isoformat()}', INTERVAL 1 DAY) t(d)
),
base AS (SELECT day, strftime(day, '%Y-%m-%d') AS ds FROM days),
pres AS (SELECT day, ds, {pres_cols} FROM base)
SELECT day,
       {vals}
FROM pres WHERE {any_present} ORDER BY day
"""


J15_ORACLE = _oura_wide_oracle()


# --- DETAILED transform: workout -> its own warehouse table ------------

WORKOUT_SCHEMA_PATH = (
    Path(__file__).resolve().parent.parent
    / "schemas"
    / "oura"
    / "oura_workout.json"
)


def j16_detailed_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DETAILED-category transform path the reference drafts but
    leaves TODO (reference ``transform.py:120-128``; draft schema
    ``t.json``): a multi-row-per-day type (``workout``) fetched from
    the range source, prefixed (P3), given its incremental-load date
    key (``day`` derived from ``start_datetime`` — the added column the
    shipped ``oura_workout.json`` documents), coerced to the declared
    types (C5: wire strings -> TIMESTAMP), and LANDED in a second
    warehouse table — written partitioned by ``day`` (the S5/S7 range
    layout) and read BACK, so the certified frame is what a consumer of
    the detailed table sees. Unlike the DAILY path there is no combine:
    days repeat, one row per workout."""
    from pyspark.sql import functions as F

    from personal_health_etl_pipeline_spark.pipeline.fixtures import (
        fetch_detailed_workout_df,
    )
    from personal_health_etl_pipeline_spark.plans.audit_surface import (
        _scratch,
    )
    from personal_health_etl_pipeline_spark.schema import align_to_schema

    import os

    raw = fetch_detailed_workout_df(spark, J15_START, J15_END)
    flat = prefix_columns(raw, "workout", exclude=())  # P3 (no day yet)
    keyed = flat.withColumn(
        "day", F.to_date(F.substring("workout__start_datetime", 1, 10))
    )
    aligned = align_to_schema(keyed, load_json_schema(WORKOUT_SCHEMA_PATH))
    table = os.path.join(_scratch("oura_workout"), "oura_workout")
    aligned.write.partitionBy("day").parquet(table)
    back = spark.read.parquet(table)
    # partition-column readback infers day as DATE; project back to
    # declared order and sort for display stability
    return back.select(
        [f.name for f in load_json_schema(WORKOUT_SCHEMA_PATH).fields]
    ).orderBy("day", "workout__id")


def _workout_oracle() -> str:
    from personal_health_etl_pipeline_spark.pipeline.fixtures import (
        ACTIVITY_WORDS,
        INTENSITY_WORDS,
        SOURCE_WORDS,
    )

    def h(field: str) -> str:
        return (
            f"CAST(('0x' || substr(sha256('workout|' || ds || '|' ||"
            f" CAST(s AS VARCHAR) || '|{field}'), 1, 16)) AS UBIGINT)"
        )

    def words(field: str, ws: tuple[str, ...]) -> str:
        arms = " ".join(
            f"WHEN {i} THEN '{w}'" for i, w in enumerate(ws[:-1])
        )
        return (
            f"CASE CAST({h(field)} % {len(ws)} AS INT) {arms}"
            f" ELSE '{ws[-1]}' END"
        )

    def wire(field: str, minute: str) -> str:
        return (
            f"ds || 'T' || lpad(CAST(6 + s * 4 AS VARCHAR), 2, '0')"
            f" || ':{minute}:00.'"
            f" || lpad(CAST({h(field)} % 1000000 AS VARCHAR), 6, '0')"
            f" || '+00:00'"
        )

    return f"""
WITH days AS (
  SELECT CAST(d AS DATE) AS day
  FROM generate_series(DATE '{J15_START.isoformat()}',
                       DATE '{J15_END.isoformat()}', INTERVAL 1 DAY) t(d)
),
base AS (
  SELECT day, strftime(day, '%Y-%m-%d') AS ds, CAST(s AS BIGINT) AS s
  FROM days, range(0, 4) r(s)
  WHERE s < CAST(('0x' || substr(sha256('workout|' || ds || '|n'), 1, 16))
                 AS UBIGINT) % 4
)
SELECT day,
       'workout-' || ds || '-' || CAST(s AS VARCHAR) AS workout__id,
       {words("activity", ACTIVITY_WORDS)} AS workout__activity,
       CAST({h("calories")} % 90000 AS DOUBLE) / 100 AS workout__calories,
       CAST({h("distance")} % 2000000 AS DOUBLE) / 100 AS workout__distance,
       CAST({wire("end_datetime", "59")} AS TIMESTAMP)
           AS workout__end_datetime,
       {words("intensity", INTENSITY_WORDS)} AS workout__intensity,
       'session-' || CAST({h("label")} % 1000 AS VARCHAR) AS workout__label,
       {words("source", SOURCE_WORDS)} AS workout__source,
       CAST({wire("start_datetime", "30")} AS TIMESTAMP)
           AS workout__start_datetime
FROM base ORDER BY day, workout__id
"""


J16_ORACLE = _workout_oracle()


# --- SPECIAL transform: daily_spo2 (id_day) ----------------------------

SPO2_SCHEMA_PATH = (
    Path(__file__).resolve().parent.parent / "schemas" / "oura" / "oura_spo2.json"
)


def j17_spo2_id_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``id_day`` SPECIAL path the reference declares but leaves
    FIXME (reference ``constants.py:44-48`` registers ``daily_spo2``
    with ``special_params={'id_day': True}``; ``extract.py:128`` is the
    TODO): the wire record has NO ``day`` column, so the incremental
    date key is DERIVED from the record id (F6 regex-extract + F2
    cast). The warehouse columns follow the reference's draft
    ``t.json`` exactly — it keeps BOTH the C4-stringified
    ``spo2_percentage`` object (STRING) and the F1-flattened
    ``__average`` leaf (FLOAT64), so this entry produces both from the
    one nested struct. Aligned to the shipped declared schema (C5) and
    certified under the value hash, including which days are MISSING
    from the source."""
    from pyspark.sql import functions as F

    from personal_health_etl_pipeline_spark.pipeline.fixtures import (
        fetch_spo2_df,
    )
    from personal_health_etl_pipeline_spark.schema import align_to_schema

    raw = fetch_spo2_df(spark, J15_START, J15_END)
    keyed = raw.withColumn(
        "day",
        F.to_date(F.regexp_extract("id", r"(\d{4}-\d{2}-\d{2})$", 1)),
    )
    proj = keyed.select(
        "day",
        F.col("id").alias("daily_spo2__id"),
        # C4: the residual object stringified with a FIXED numeric
        # format (two decimals — the fixture's metric granularity) so
        # the serialization is engine-portable byte-for-byte
        F.format_string(
            '{"average":%.2f}', F.col("spo2_percentage.average")
        ).alias("daily_spo2__spo2_percentage"),
        F.col("breathing_disturbance_index").alias(
            "daily_spo2__breathing_disturbance_index"
        ),
        F.col("spo2_percentage.average").alias(
            "daily_spo2__spo2_percentage__average"
        ),
    )
    return align_to_schema(proj, load_json_schema(SPO2_SCHEMA_PATH)).orderBy(
        "day"
    )


def _spo2_oracle() -> str:
    avg = _h_sql("daily_spo2", "spo2_percentage.average")
    bdi = _h_sql("daily_spo2", "breathing_disturbance_index")
    return f"""
WITH days AS (
  SELECT CAST(d AS DATE) AS day,
         strftime(CAST(d AS DATE), '%Y-%m-%d') AS ds
  FROM generate_series(DATE '{J15_START.isoformat()}',
                       DATE '{J15_END.isoformat()}', INTERVAL 1 DAY) t(d)
),
base AS (
  SELECT day, ds FROM days
  WHERE {_h_sql("daily_spo2", "presence")} % 10 > 0
)
SELECT day,
       'daily_spo2-' || ds AS daily_spo2__id,
       printf('{{"average":%.2f}}', CAST({avg} % 10000 AS DOUBLE) / 100)
           AS daily_spo2__spo2_percentage,
       CAST({bdi} % 10000 AS DOUBLE) / 100
           AS daily_spo2__breathing_disturbance_index,
       CAST({avg} % 10000 AS DOUBLE) / 100
           AS daily_spo2__spo2_percentage__average
FROM base ORDER BY day
"""


J17_ORACLE = _spo2_oracle()


# --- DETAILED transform #2: sleep (widest draft schema) ----------------

SLEEP_SCHEMA_PATH = (
    Path(__file__).resolve().parent.parent / "schemas" / "oura" / "oura_sleep.json"
)


def j20_detailed_sleep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's WIDEST DETAILED draft (``t.json``'s 41 sleep
    fields) end-to-end: multi-row-per-day records with a BOOLEAN
    (``low_battery_alert`` — the one t.json type no other certified
    schema exercises), wire-string timestamps coerced to TIMESTAMP
    (C5), nested ``heart_rate``/``hrv`` objects whose ``items`` arrays
    serialize to C4 JSON strings, and the doubly-nested
    ``readiness.contributors`` object (depth-2 F1 flatten). ``day`` is
    derived from ``bedtime_start``'s date like j16; the oracle
    regenerates all 41 columns from the shared sha256 spec
    (``pipeline/fixtures.py:SLEEP_FIELDS``)."""
    from pyspark.sql import functions as F

    from personal_health_etl_pipeline_spark.pipeline.fixtures import (
        fetch_detailed_sleep_df,
    )
    from personal_health_etl_pipeline_spark.schema import align_to_schema

    raw = fetch_detailed_sleep_df(spark, J15_START, J15_END)
    flat = flatten(raw, arrays="json")  # F1 depth-2 + C4
    pre = prefix_columns(flat, "sleep", exclude=())
    keyed = pre.withColumn(
        "day", F.to_date(F.substring("sleep__bedtime_start", 1, 10))
    )
    return align_to_schema(keyed, load_json_schema(SLEEP_SCHEMA_PATH)).orderBy(
        "day", "sleep__id"
    )


def _sleep_oracle() -> str:
    from personal_health_etl_pipeline_spark.pipeline.fixtures import (
        SLEEP_FIELDS,
        SLEEP_TYPE_WORDS,
        SLEEP_VERSION_WORDS,
    )

    def h(path: str) -> str:
        return (
            f"CAST(('0x' || substr(sha256('sleep|' || ds || '|' ||"
            f" CAST(s AS VARCHAR) || '|{path}'), 1, 16)) AS UBIGINT)"
        )

    def micros(path: str) -> str:
        return f"lpad(CAST({h(path)} % 1000000 AS VARCHAR), 6, '0')"

    def words(path: str, ws: tuple[str, ...]) -> str:
        arms = " ".join(f"WHEN {i} THEN '{w}'" for i, w in enumerate(ws[:-1]))
        return (
            f"CASE CAST({h(path)} % {len(ws)} AS INT) {arms}"
            f" ELSE '{ws[-1]}' END"
        )

    def expr(path: str, kind: str) -> str:
        hp = h(path)
        if kind == "id":
            return "'sleep-' || ds || '-' || CAST(s AS VARCHAR)"
        if kind == "metric":
            return f"CAST({hp} % 10000 AS DOUBLE) / 100"
        if kind == "ts_start":
            return (
                f"CAST(ds || 'T2' || CAST(s AS VARCHAR) || ':00:00.'"
                f" || {micros(path)} || '+00:00' AS TIMESTAMP)"
            )
        if kind == "ts_end":
            return (
                f"CAST(ds || 'T23:' || CAST(30 + s * 5 AS VARCHAR) || ':00.'"
                f" || {micros(path)} || '+00:00' AS TIMESTAMP)"
            )
        if kind == "ts_str":
            return (
                f"ds || 'T2' || CAST(s AS VARCHAR) || ':05:00.'"
                f" || {micros(path)} || '+00:00'"
            )
        if kind == "bool":
            return f"({hp} % 2 = 0)"
        if kind == "digits":
            return f"lpad(CAST({hp} % 1000000000000 AS VARCHAR), 12, '0')"
        if kind == "sleep_type":
            return words(path, SLEEP_TYPE_WORDS)
        if kind == "version":
            return words(path, SLEEP_VERSION_WORDS)
        if kind == "int_list":
            return (
                f"'[' || CAST({hp} % 97 AS VARCHAR)"
                f" || ',' || CAST(({hp} // 97) % 97 AS VARCHAR)"
                f" || ',' || CAST(({hp} // 9409) % 97 AS VARCHAR) || ']'"
            )
        raise ValueError(kind)

    cols = ",\n       ".join(
        f'{expr(path, kind)} AS "sleep__{path.replace(".", "__")}"'
        for path, kind in SLEEP_FIELDS
    )
    return f"""
WITH days AS (
  SELECT CAST(d AS DATE) AS day,
         strftime(CAST(d AS DATE), '%Y-%m-%d') AS ds
  FROM generate_series(DATE '{J15_START.isoformat()}',
                       DATE '{J15_END.isoformat()}', INTERVAL 1 DAY) t(d)
),
base AS (
  SELECT day, ds, CAST(s AS BIGINT) AS s
  FROM days, range(0, 3) r(s)
  WHERE s < CAST(('0x' || substr(sha256('sleep|' || ds || '|n'), 1, 16))
                 AS UBIGINT) % 3
)
SELECT day,
       {cols}
FROM base ORDER BY day, "sleep__id"
"""


J20_ORACLE = _sleep_oracle()


# --- DETAILED transform #3: sleep_time (draft type-conflict path) ------

SLEEP_TIME_SCHEMA_PATH = (
    Path(__file__).resolve().parent.parent
    / "schemas"
    / "oura"
    / "oura_sleep_time.json"
)


def j22_detailed_sleep_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third DETAILED type end-to-end: ``sleep_time`` (reference
    ``constants.py:33`` registers the endpoint; draft columns at
    ``t.json:188-306``). One recommendation record per present day
    with a native wire ``day`` string (F2 cast, unlike j16/j20's
    derived key), the flattened ``optimal_bedtime`` leaves (F1), and
    the draft's one TYPE CONFLICT surfaced honestly: it declares the
    residual ``optimal_bedtime`` object column as TIMESTAMP, which no
    C4 JSON serialization can coerce to (ANSI cast would throw), so
    the schema-driven load cannot land a value there and the pipeline
    fills the declared column as a typed NULL (C3) — exactly what the
    reference's own schema-driven loader would do once the column is
    withheld, while the three FLOAT64 leaves carry the data. The
    oracle pins the NULL column alongside every populated cell."""
    from pyspark.sql import functions as F

    from personal_health_etl_pipeline_spark.pipeline.fixtures import (
        fetch_sleep_time_df,
    )
    from personal_health_etl_pipeline_spark.schema import align_to_schema

    raw = fetch_sleep_time_df(spark, J15_START, J15_END)
    proj = raw.select(
        F.to_date("day").alias("day"),  # F2
        F.col("id").alias("sleep_time__id"),
        # F1 flatten of the nested object; the residual-object column
        # (sleep_time__optimal_bedtime TIMESTAMP) is deliberately NOT
        # produced — align_to_schema C3-fills it as typed NULL
        F.col("optimal_bedtime.day_tz").alias(
            "sleep_time__optimal_bedtime__day_tz"
        ),
        F.col("optimal_bedtime.end_offset").alias(
            "sleep_time__optimal_bedtime__end_offset"
        ),
        F.col("optimal_bedtime.start_offset").alias(
            "sleep_time__optimal_bedtime__start_offset"
        ),
        F.col("recommendation").alias("sleep_time__recommendation"),
        F.col("status").alias("sleep_time__status"),
    )
    return align_to_schema(
        proj, load_json_schema(SLEEP_TIME_SCHEMA_PATH)
    ).orderBy("day")


def _sleep_time_oracle() -> str:
    from personal_health_etl_pipeline_spark.pipeline.fixtures import (
        RECOMMENDATION_WORDS,
        SLEEP_STATUS_WORDS,
    )

    day_tz = _h_sql("sleep_time", "optimal_bedtime.day_tz")
    end_off = _h_sql("sleep_time", "optimal_bedtime.end_offset")
    start_off = _h_sql("sleep_time", "optimal_bedtime.start_offset")
    reco = _case_words(_h_sql("sleep_time", "recommendation"), RECOMMENDATION_WORDS)
    status = _case_words(_h_sql("sleep_time", "status"), SLEEP_STATUS_WORDS)
    return f"""
WITH days AS (
  SELECT CAST(d AS DATE) AS day,
         strftime(CAST(d AS DATE), '%Y-%m-%d') AS ds
  FROM generate_series(DATE '{J15_START.isoformat()}',
                       DATE '{J15_END.isoformat()}', INTERVAL 1 DAY) t(d)
),
base AS (
  SELECT day, ds FROM days
  WHERE {_h_sql("sleep_time", "presence")} % 10 > 0
)
SELECT day,
       'sleep_time-' || ds AS sleep_time__id,
       CAST(NULL AS TIMESTAMP) AS sleep_time__optimal_bedtime,
       CAST({day_tz} % 10000 AS DOUBLE) / 100
           AS sleep_time__optimal_bedtime__day_tz,
       CAST({end_off} % 10000 AS DOUBLE) / 100
           AS sleep_time__optimal_bedtime__end_offset,
       CAST({start_off} % 10000 AS DOUBLE) / 100
           AS sleep_time__optimal_bedtime__start_offset,
       {reco} AS sleep_time__recommendation,
       {status} AS sleep_time__status
FROM base ORDER BY day
"""


J22_ORACLE = _sleep_time_oracle()


# --- DETAILED transform #4: vO2_max ------------------------------------

VO2MAX_SCHEMA_PATH = (
    Path(__file__).resolve().parent.parent
    / "schemas"
    / "oura"
    / "oura_vo2_max.json"
)


def j23_detailed_vo2max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fourth DETAILED type end-to-end: ``vO2_max`` (reference
    ``constants.py:36`` registers ``/usercollection/vO2_max``; no
    t.json draft exists, so the shipped ``oura_vo2_max.json`` follows
    the j16 naming convention). The pipeline-relevant wrinkle is the
    type's MIXED-CASE name flowing through the P3 prefix and into
    column identifiers (``vO2_max__vo2_max``) — case preservation
    through flatten/prefix/align is what the hash certifies, plus the
    usual F2 day cast and C5 wire-string -> TIMESTAMP coercion."""
    from pyspark.sql import functions as F

    from personal_health_etl_pipeline_spark.pipeline.fixtures import (
        fetch_vo2max_df,
    )
    from personal_health_etl_pipeline_spark.schema import align_to_schema

    raw = fetch_vo2max_df(spark, J15_START, J15_END)
    flat = prefix_columns(raw.drop("day"), "vO2_max", exclude=())  # P3
    keyed = flat.withColumn(
        "day", F.to_date(F.substring("vO2_max__timestamp", 1, 10))  # F2
    )
    return align_to_schema(
        keyed, load_json_schema(VO2MAX_SCHEMA_PATH)  # C5
    ).orderBy("day")


def _vo2max_oracle() -> str:
    ts = _val_sql("ts", "vO2_max", "timestamp")
    vo2 = _h_sql("vO2_max", "vo2_max")
    return f"""
WITH days AS (
  SELECT CAST(d AS DATE) AS day,
         strftime(CAST(d AS DATE), '%Y-%m-%d') AS ds
  FROM generate_series(DATE '{J15_START.isoformat()}',
                       DATE '{J15_END.isoformat()}', INTERVAL 1 DAY) t(d)
),
base AS (
  SELECT day, ds FROM days
  WHERE {_h_sql("vO2_max", "presence")} % 10 > 0
)
SELECT day,
       'vO2_max-' || ds AS "vO2_max__id",
       {ts} AS "vO2_max__timestamp",
       CAST({vo2} % 10000 AS DOUBLE) / 100 AS "vO2_max__vo2_max"
FROM base ORDER BY day
"""


J23_ORACLE = _vo2max_oracle()


# --- DETAILED transforms #5-#7: session, rest_mode_period, enhanced_tag

SESSION_SCHEMA_PATH = (
    Path(__file__).resolve().parent.parent / "schemas" / "oura" / "oura_session.json"
)
REST_MODE_SCHEMA_PATH = (
    Path(__file__).resolve().parent.parent
    / "schemas"
    / "oura"
    / "oura_rest_mode_period.json"
)
ENHANCED_TAG_SCHEMA_PATH = (
    Path(__file__).resolve().parent.parent
    / "schemas"
    / "oura"
    / "oura_enhanced_tag.json"
)


def j24_detailed_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth DETAILED type: ``session`` (reference ``constants.py:31``)
    — with j22-j26 this completes an end-to-end certified transform
    for every endpoint in the reference's 15-type dispatch registry.
    A nested ``heart_rate`` object mixes all three leaf treatments in
    one struct: a FLOAT64 metric (F1), an ``items`` array serialized
    to a C4 JSON string, and a wire-string timestamp coerced by C5 —
    alongside the native-``day`` F2 path."""
    from pyspark.sql import functions as F

    from personal_health_etl_pipeline_spark.pipeline.fixtures import (
        fetch_session_df,
    )
    from personal_health_etl_pipeline_spark.schema import align_to_schema

    raw = fetch_session_df(spark, J15_START, J15_END)
    proj = raw.select(
        F.to_date("day").alias("day"),  # F2
        F.col("id").alias("session__id"),
        F.col("start_datetime").alias("session__start_datetime"),
        F.col("end_datetime").alias("session__end_datetime"),
        F.col("type").alias("session__type"),
        F.col("mood").alias("session__mood"),
        F.col("heart_rate.interval").alias("session__heart_rate__interval"),
        F.to_json(F.col("heart_rate.items")).alias(  # C4
            "session__heart_rate__items"
        ),
        F.col("heart_rate.timestamp").alias("session__heart_rate__timestamp"),
    )
    return align_to_schema(
        proj, load_json_schema(SESSION_SCHEMA_PATH)  # C5
    ).orderBy("day")


def _session_oracle() -> str:
    from personal_health_etl_pipeline_spark.pipeline.fixtures import (
        MOOD_WORDS,
        SESSION_TYPE_WORDS,
    )

    items_h = _h_sql("session", "heart_rate.items")
    return f"""
WITH days AS (
  SELECT CAST(d AS DATE) AS day,
         strftime(CAST(d AS DATE), '%Y-%m-%d') AS ds
  FROM generate_series(DATE '{J15_START.isoformat()}',
                       DATE '{J15_END.isoformat()}', INTERVAL 1 DAY) t(d)
),
base AS (
  SELECT day, ds FROM days
  WHERE {_h_sql("session", "presence")} % 10 > 0
)
SELECT day,
       'session-' || ds AS session__id,
       {_val_sql("ts", "session", "start_datetime")} AS session__start_datetime,
       {_val_sql("ts", "session", "end_datetime")} AS session__end_datetime,
       {_case_words(_h_sql("session", "type"), SESSION_TYPE_WORDS)}
           AS session__type,
       {_case_words(_h_sql("session", "mood"), MOOD_WORDS)} AS session__mood,
       CAST({_h_sql("session", "heart_rate.interval")} % 10000 AS DOUBLE) / 100
           AS session__heart_rate__interval,
       '[' || CAST({items_h} % 97 AS VARCHAR)
           || ',' || CAST(({items_h} // 97) % 97 AS VARCHAR)
           || ',' || CAST(({items_h} // 9409) % 97 AS VARCHAR) || ']'
           AS session__heart_rate__items,
       {_val_sql("ts", "session", "heart_rate.timestamp")}
           AS session__heart_rate__timestamp
FROM base ORDER BY day
"""


J24_ORACLE = _session_oracle()


def j25_detailed_rest_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sixth DETAILED type: ``rest_mode_period`` (reference
    ``constants.py:34``) — the one PERIOD-shaped record (start_day +
    end_day spanning 0-2 extra days), so the warehouse row carries a
    SECOND date column through the F2 cast, plus an ``episodes``
    array-of-structs serialized whole to a C4 JSON string (the deepest
    residual-object serialization among the detailed types)."""
    from pyspark.sql import functions as F

    from personal_health_etl_pipeline_spark.pipeline.fixtures import (
        fetch_rest_mode_df,
    )
    from personal_health_etl_pipeline_spark.schema import align_to_schema

    raw = fetch_rest_mode_df(spark, J15_START, J15_END)
    proj = raw.select(
        F.to_date("start_day").alias("day"),  # F2 (period start = day key)
        F.col("id").alias("rest_mode_period__id"),
        F.col("end_day").alias("rest_mode_period__end_day"),
        F.col("start_time").alias("rest_mode_period__start_time"),
        F.col("end_time").alias("rest_mode_period__end_time"),
        F.to_json(F.col("episodes")).alias("rest_mode_period__episodes"),  # C4
    )
    return align_to_schema(
        proj, load_json_schema(REST_MODE_SCHEMA_PATH)  # C5 (end_day -> DATE)
    ).orderBy("day")


def _rest_mode_oracle() -> str:
    from personal_health_etl_pipeline_spark.pipeline.fixtures import (
        REST_TAG_WORDS,
    )

    tag = _case_words(_h_sql("rest_mode_period", "episodes.tags"), REST_TAG_WORDS)
    ep_ts = _val_sql("ts_str", "rest_mode_period", "episodes.timestamp")
    return f"""
WITH days AS (
  SELECT CAST(d AS DATE) AS day,
         strftime(CAST(d AS DATE), '%Y-%m-%d') AS ds
  FROM generate_series(DATE '{J15_START.isoformat()}',
                       DATE '{J15_END.isoformat()}', INTERVAL 1 DAY) t(d)
),
base AS (
  SELECT day, ds FROM days
  WHERE {_h_sql("rest_mode_period", "presence")} % 10 > 0
)
SELECT day,
       'rest_mode_period-' || ds AS rest_mode_period__id,
       CAST(day + INTERVAL (CAST({_h_sql("rest_mode_period", "span")} % 3
                                 AS INT)) DAY AS DATE)
           AS rest_mode_period__end_day,
       {_val_sql("ts", "rest_mode_period", "start_time")}
           AS rest_mode_period__start_time,
       {_val_sql("ts", "rest_mode_period", "end_time")}
           AS rest_mode_period__end_time,
       '[{{"tags":["' || {tag} || '"],"timestamp":"' || {ep_ts} || '"}}]'
           AS rest_mode_period__episodes
FROM base ORDER BY day
"""


J25_ORACLE = _rest_mode_oracle()


def j26_detailed_enhanced_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seventh DETAILED type: ``enhanced_tag`` (reference
    ``constants.py:35``) — multi-row like workout (0-2 tags per day,
    per-(day, seq) hashing), with BOTH period dates (start_day keys
    the row, end_day lands as a second DATE column) and free-text
    ``comment``. Completes the reference's DETAILED category."""
    from pyspark.sql import functions as F

    from personal_health_etl_pipeline_spark.pipeline.fixtures import (
        fetch_enhanced_tag_df,
    )
    from personal_health_etl_pipeline_spark.schema import align_to_schema

    raw = fetch_enhanced_tag_df(spark, J15_START, J15_END)
    proj = raw.select(
        F.to_date("start_day").alias("day"),  # F2
        F.col("id").alias("enhanced_tag__id"),
        F.col("tag_type_code").alias("enhanced_tag__tag_type_code"),
        F.col("start_time").alias("enhanced_tag__start_time"),
        F.col("end_time").alias("enhanced_tag__end_time"),
        F.col("end_day").alias("enhanced_tag__end_day"),
        F.col("comment").alias("enhanced_tag__comment"),
    )
    return align_to_schema(
        proj, load_json_schema(ENHANCED_TAG_SCHEMA_PATH)  # C5
    ).orderBy("day", "enhanced_tag__id")


def _enhanced_tag_oracle() -> str:
    from personal_health_etl_pipeline_spark.pipeline.fixtures import (
        TAG_TYPE_WORDS,
    )

    def h(field: str) -> str:
        return (
            f"CAST(('0x' || substr(sha256('enhanced_tag|' || ds || '|' ||"
            f" CAST(s AS VARCHAR) || '|{field}'), 1, 16)) AS UBIGINT)"
        )

    def wire(field: str, minute: str) -> str:
        return (
            f"ds || 'T' || lpad(CAST(6 + s * 4 AS VARCHAR), 2, '0')"
            f" || ':{minute}:00.'"
            f" || lpad(CAST({h(field)} % 1000000 AS VARCHAR), 6, '0')"
            f" || '+00:00'"
        )

    tag_word = _case_words(h("tag_type_code"), TAG_TYPE_WORDS)
    return f"""
WITH days AS (
  SELECT CAST(d AS DATE) AS day
  FROM generate_series(DATE '{J15_START.isoformat()}',
                       DATE '{J15_END.isoformat()}', INTERVAL 1 DAY) t(d)
),
base AS (
  SELECT day, strftime(day, '%Y-%m-%d') AS ds, CAST(s AS BIGINT) AS s
  FROM days, range(0, 3) r(s)
  WHERE s < CAST(('0x' || substr(sha256('enhanced_tag|' || ds || '|n'), 1, 16))
                 AS UBIGINT) % 3
)
SELECT day,
       'enhanced_tag-' || ds || '-' || CAST(s AS VARCHAR) AS enhanced_tag__id,
       {tag_word} AS enhanced_tag__tag_type_code,
       CAST({wire("start_time", "30")} AS TIMESTAMP) AS enhanced_tag__start_time,
       CAST({wire("end_time", "59")} AS TIMESTAMP) AS enhanced_tag__end_time,
       day AS enhanced_tag__end_day,
       'note-' || CAST({h("comment")} % 1000 AS VARCHAR)
           AS enhanced_tag__comment
FROM base ORDER BY day, enhanced_tag__id
"""


J26_ORACLE = _enhanced_tag_oracle()
