"""Full-width oura_day + DETAILED workout surface (plans/oura_wide.py).

The hash gate certifies values; these tests pin the SCHEMA contract:
the converter's output StructType must equal the shipped declared
schema files column-for-column (VERDICT r5 item 5's schema-equality
assert), and the fixture layer's shape invariants hold.
"""

from __future__ import annotations

import datetime as dt
import json

from personal_health_etl_pipeline_spark.pipeline.fixtures import (
    OURA_DAILY_FULL,
    day_present,
    fetch_daily_full,
    fetch_detailed_workout,
    workout_count,
)
from personal_health_etl_pipeline_spark.plans.oura_wide import (
    J15_END,
    J15_START,
    OURA_DAY_SCHEMA_PATH,
    WORKOUT_SCHEMA_PATH,
    j15_oura_day_full_width,
    j16_detailed_transform,
    oura_day_target_schema,
)


def test_declared_schema_file_has_66_fields():
    fields = json.loads(OURA_DAY_SCHEMA_PATH.read_text())
    assert len(fields) == 66
    assert fields[0] == {"name": "day", "type": "DATE", "mode": "REQUIRED"}
    # every non-day column belongs to exactly one DAILY type namespace
    types = set(OURA_DAILY_FULL)
    for f in fields[1:]:
        assert f["name"].split("__")[0] in types, f["name"]


def test_j15_output_schema_equals_declared_schema(spark, sf_dir):
    """The converter's StructType IS the declared 66-column warehouse
    schema — name and type, in declared order. (Nullability is not
    compared: align's cast projection yields nullable columns; the
    REQUIRED mode is a load-time constraint, not a projection type.)"""
    df = j15_oura_day_full_width(spark, sf_dir)
    got = [(f.name, f.dataType) for f in df.schema.fields]
    want = [(f.name, f.dataType) for f in oura_day_target_schema().fields]
    assert got == want
    assert len(got) == 66


def test_j15_gap_days_are_null_per_type(spark, sf_dir):
    """A (type, day) the presence rule withholds must surface as NULLs
    in that type's columns while other types' columns stay populated."""
    rows = {r["day"].isoformat(): r for r in j15_oura_day_full_width(spark, sf_dir).collect()}
    checked = 0
    day = J15_START
    while day <= J15_END:
        ds = day.isoformat()
        if ds in rows:
            for t in OURA_DAILY_FULL:
                first_col = f"{t}__{OURA_DAILY_FULL[t][0][0].replace('.', '__')}"
                if day_present(t, ds):
                    assert rows[ds][first_col] is not None, (t, ds)
                else:
                    assert rows[ds][first_col] is None, (t, ds)
                    checked += 1
        day += dt.timedelta(days=1)
    assert checked > 0  # the 60-day window must contain real gaps


def test_workout_fixture_is_multirow_and_gappy():
    recs = fetch_detailed_workout(J15_START, J15_END)
    by_day: dict[str, int] = {}
    for r in recs:
        by_day[r["id"].rsplit("-", 1)[0]] = by_day.get(r["id"].rsplit("-", 1)[0], 0) + 1
    counts = sorted(set(by_day.values()))
    assert max(counts) > 1  # multi-row days exist
    n_days = (J15_END - J15_START).days + 1
    assert len(by_day) < n_days  # zero-workout days exist
    day = J15_START
    while day <= J15_START + dt.timedelta(days=9):
        ds = day.isoformat()
        assert by_day.get(f"workout-{ds}", 0) == workout_count(ds)
        day += dt.timedelta(days=1)


def test_j16_schema_and_day_derivation(spark, sf_dir):
    df = j16_detailed_transform(spark, sf_dir)
    declared = json.loads(WORKOUT_SCHEMA_PATH.read_text())
    assert [f.name for f in df.schema.fields] == [f["name"] for f in declared]
    rows = df.collect()
    assert len(rows) > 0
    for r in rows[:20]:
        # day is derived from start_datetime's date (UTC session)
        assert r["day"] == r["workout__start_datetime"].date()


def test_j17_day_derived_from_id_only(spark, sf_dir):
    """id_day semantics (ref constants.py:44-48): the wire record has
    no day column; the date key comes from the id."""
    from personal_health_etl_pipeline_spark.pipeline.fixtures import fetch_spo2
    from personal_health_etl_pipeline_spark.plans.oura_wide import (
        SPO2_SCHEMA_PATH,
        j17_spo2_id_day,
    )

    recs = fetch_spo2(J15_START, J15_START + dt.timedelta(days=9))
    assert recs and all("day" not in r for r in recs)  # wire has no day

    df = j17_spo2_id_day(spark, sf_dir)
    declared = json.loads(SPO2_SCHEMA_PATH.read_text())
    assert [f.name for f in df.schema.fields] == [f["name"] for f in declared]
    rows = df.collect()
    assert rows
    for r in rows[:20]:
        assert r["daily_spo2__id"] == f"daily_spo2-{r['day'].isoformat()}"
        # draft t.json keeps both the stringified object and the leaf
        assert (
            r["daily_spo2__spo2_percentage"]
            == '{"average":%.2f}' % r["daily_spo2__spo2_percentage__average"]
        )


def test_daily_full_records_cover_spec():
    for t, spec in OURA_DAILY_FULL.items():
        recs = fetch_daily_full(t, J15_START, J15_START + dt.timedelta(days=14))
        assert recs, t
        flat_keys = set()

        def walk(d, prefix=""):
            for k, v in d.items():
                if isinstance(v, dict):
                    walk(v, f"{prefix}{k}.")
                else:
                    flat_keys.add(f"{prefix}{k}")

        walk(recs[0])
        assert flat_keys == {"day"} | {p for p, _ in spec}


def test_j20_sleep_boolean_and_depth2_flatten(spark, sf_dir):
    """The sleep draft's distinctive shapes: a real BOOLEAN column, the
    doubly-nested readiness.contributors flatten, and the C4 JSON
    serialization of the heart_rate.items array."""
    from personal_health_etl_pipeline_spark.plans.oura_wide import (
        SLEEP_SCHEMA_PATH,
        j20_detailed_sleep,
    )

    df = j20_detailed_sleep(spark, sf_dir)
    declared = json.loads(SLEEP_SCHEMA_PATH.read_text())
    assert [f.name for f in df.schema.fields] == [f["name"] for f in declared]
    assert dict(df.dtypes)["sleep__low_battery_alert"] == "boolean"
    assert (
        dict(df.dtypes)["sleep__readiness__contributors__hrv_balance"]
        == "double"
    )
    rows = df.collect()
    assert rows
    seen_bools = {r["sleep__low_battery_alert"] for r in rows}
    assert seen_bools == {True, False}  # both values actually occur
    for r in rows[:10]:
        assert r["day"] == r["sleep__bedtime_start"].date()
        items = json.loads(r["sleep__heart_rate__items"])
        assert isinstance(items, list) and len(items) == 3


def test_j22_draft_type_conflict_lands_as_typed_null(spark, sf_dir):
    """The t.json draft types the residual optimal_bedtime OBJECT as
    TIMESTAMP (t.json:193); no C4 serialization can coerce to it, so
    the schema-driven load must land the declared column as a typed
    NULL (C3) while the three FLOAT64 leaves carry the data."""
    from personal_health_etl_pipeline_spark.plans.oura_wide import (
        j22_detailed_sleep_time,
    )
    from pyspark.sql.types import TimestampType

    df = j22_detailed_sleep_time(spark, sf_dir)
    field = df.schema["sleep_time__optimal_bedtime"]
    assert isinstance(field.dataType, TimestampType)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["sleep_time__optimal_bedtime"] is None
        assert r["sleep_time__optimal_bedtime__day_tz"] is not None


def test_j23_mixed_case_prefix_survives(spark, sf_dir):
    """vO2_max's mixed-case type name must flow through prefix/align
    into column identifiers unmangled."""
    from personal_health_etl_pipeline_spark.plans.oura_wide import (
        j23_detailed_vo2max,
    )

    df = j23_detailed_vo2max(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == [
        "day", "vO2_max__id", "vO2_max__timestamp", "vO2_max__vo2_max",
    ]
    r = df.collect()[0]
    assert r["vO2_max__id"].startswith("vO2_max-")
    # C5 coerced the wire string to a real timestamp on the keyed day
    assert r["vO2_max__timestamp"].date() == r["day"]


def test_j25_period_spans_days_and_episodes_serialize(spark, sf_dir):
    """rest_mode_period: end_day lands as a DATE >= the day key, and
    the episodes array-of-structs serializes to compact C4 JSON."""
    from personal_health_etl_pipeline_spark.plans.oura_wide import (
        j25_detailed_rest_mode,
    )

    rows = j25_detailed_rest_mode(spark, sf_dir).collect()
    assert rows
    spans = set()
    for r in rows:
        delta = (r["rest_mode_period__end_day"] - r["day"]).days
        assert 0 <= delta <= 2
        spans.add(delta)
        assert r["rest_mode_period__episodes"].startswith('[{"tags":["')
    assert len(spans) > 1  # the fixture exercises real multi-day spans


def test_registry_every_reference_type_has_a_transform():
    """Completion check for ref constants.py:20-49: all 15 endpoint
    types map to a certified catalog entry."""
    from personal_health_etl_pipeline_spark.plans.catalog import CATALOG

    covered = {
        # DAILY x6 via the full-width combine
        "daily_activity": "j15_oura_day_full_width",
        "daily_sleep": "j15_oura_day_full_width",
        "daily_readiness": "j15_oura_day_full_width",
        "daily_stress": "j15_oura_day_full_width",
        "daily_resilience": "j15_oura_day_full_width",
        "daily_cardiovascular_age": "j15_oura_day_full_width",
        # DETAILED x7
        "workout": "j16_detailed_transform",
        "session": "j24_detailed_session",
        "sleep": "j20_detailed_sleep",
        "sleep_time": "j22_detailed_sleep_time",
        "rest_mode_period": "j25_detailed_rest_mode",
        "enhanced_tag": "j26_detailed_enhanced_tag",
        "vO2_max": "j23_detailed_vo2max",
        # SPECIAL x2
        "heartrate": "j13_heartrate_chunked",
        "daily_spo2": "j17_spo2_id_day",
    }
    assert len(covered) == 15
    missing = [t for t, entry in covered.items() if entry not in CATALOG]
    assert missing == []
