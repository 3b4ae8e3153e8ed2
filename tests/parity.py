"""Local mirror of the driver's DuckDB-oracle differential check.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column-name set and
(order-insensitively) every value. Stricter than a plain value compare,
to mirror the driver's type-sensitive value hash:

- floats must match EXACTLY (the engine's aggregation recipe in
  plans.exact is designed bit-identical vs DuckDB; drift is a bug);
- oracle column types may not include HUGEINT/UHUGEINT (DuckDB's
  SUM(integer) result type) — pandas-based hashers normalize int128
  differently than Spark's bigint, so an oracle emitting HUGEINT can
  pass a Python-int compare yet fail the driver hash (q12, round 1);
- per-column type *category* (int/float/decimal/str/bool/date/
  timestamp/list) must agree between the Spark schema and the DuckDB
  relation type.

Oracle-dialect gotchas collected while writing the 200+ oracles:

- window ``SUM(BIGINT) OVER (...)`` is ALSO HUGEINT in DuckDB — CAST
  it even when the plain aggregate case is already handled;
- DuckDB has no ``UNNEST(...) WITH ORDINALITY``; positional unnest is
  ``FROM base b, UNNEST(range(1, len(b.t) + 1)) AS r(i)`` + ``b.t[r.i]``;
- never compare against an order-dependent float threshold (e.g.
  ``x > AVG(double)``): phrase it division-free in integers
  (``x*n > sum``) or the last-ulp of the sum's add order can flip a
  predicate between engines;
- windowed running sums over TIED order keys are only hash-safe when
  the consumer is tie-order-invariant (peak/max, any-row-of-group
  membership) — state the argument in the entry's docstring.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import re

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def run_oracle(
    sql: str, sf_dir: str
) -> tuple[list[str], list[tuple], list[str]]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = [str(t) for t in rel.types]
    rows = rel.fetchall()
    con.close()
    return cols, rows, types


_BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT")


def _type_category(type_name: str) -> str:
    """Collapse a Spark dtype or DuckDB type string to a coarse category."""
    t = type_name.upper()
    if t.endswith("[]") or t.startswith("ARRAY"):
        return "list"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("FLOAT", "DOUBLE", "REAL") or t.startswith("FLOAT"):
        return "float"
    if re.match(r"^U?(TINY|SMALL|BIG|HUGE)?INT", t) or t in ("LONG", "SHORT", "BYTE"):
        return "int"
    if t.startswith("VARCHAR") or t.startswith("STRING") or t == "TEXT":
        return "str"
    if t.startswith("BOOL"):
        return "bool"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "DATE":
        return "date"
    if t.startswith("BINARY") or t.startswith("BLOB"):
        return "binary"
    return t.lower()


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return dt.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x).__name__), str(x)) for x in row
    )


def compare(
    spark_df,
    oracle_cols: list[str],
    oracle_rows: list[tuple],
    oracle_types: list[str] | None = None,
) -> None:
    s_cols = list(spark_df.columns)
    assert sorted(s_cols) == sorted(oracle_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(oracle_cols)}"
    )
    if oracle_types is not None:
        s_types = dict(spark_df.dtypes)
        o_types = dict(zip(oracle_cols, oracle_types))
        for c in oracle_cols:
            ot = o_types[c]
            for banned in _BANNED_ORACLE_TYPES:
                assert banned not in ot.upper(), (
                    f"oracle column {c!r} is {ot}: DuckDB int128 does not "
                    f"round-trip through pandas like Spark bigint — CAST the "
                    f"oracle expression AS BIGINT"
                )
            sc, oc = _type_category(s_types[c]), _type_category(ot)
            # decimal-vs-float is tolerated: pandas renders both as float64,
            # and several oracles intentionally return DECIMAL where Spark
            # rounds to double (values still compared exactly below).
            if {sc, oc} == {"decimal", "float"}:
                continue
            assert sc == oc, (
                f"type-category mismatch on {c!r}: spark {s_types[c]} ({sc}) "
                f"vs oracle {ot} ({oc})"
            )
    s_rows = [tuple(row) for row in spark_df.collect()]
    assert len(s_rows) == len(oracle_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(oracle_rows)}"
    )
    # column-name-sorted projection, order-insensitive row compare
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    o_idx = [oracle_cols.index(c) for c in sorted(oracle_cols)]
    s_norm = sorted(
        (tuple(_norm(r[i]) for i in s_idx) for r in s_rows), key=_sort_key
    )
    o_norm = sorted(
        (tuple(_norm(r[i]) for i in o_idx) for r in oracle_rows), key=_sort_key
    )
    for rn, (sr, orow) in enumerate(zip(s_norm, o_norm)):
        for cn, (sv, ov) in enumerate(zip(sr, orow)):
            if isinstance(sv, float) and isinstance(ov, float):
                ok = sv == ov or (math.isnan(sv) and math.isnan(ov))
            else:
                ok = sv == ov
            assert ok, (
                f"value mismatch at sorted-row {rn}, col {sorted(s_cols)[cn]!r}: "
                f"spark={sv!r} oracle={ov!r}"
            )


def assert_scalar_output(spark_df, name: str = "") -> None:
    """Catalog outputs must be scalar-only columns.

    External hashers canonicalize results with pandas ``sort_values``
    over EVERY column; an ARRAY/STRUCT/MAP cell throws ``unhashable
    type`` there and the query is recorded as an error even when the
    values match (cost mm_decode_features its round-2 row). Same family
    of trap as the HUGEINT ban above: the comparison harness, not the
    engine, dictates the output shape."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    for field in spark_df.schema.fields:
        assert not isinstance(field.dataType, (ArrayType, MapType, StructType)), (
            f"catalog query {name or '<df>'!r} column {field.name!r} is "
            f"{field.dataType.simpleString()}: explode/serialize to scalar "
            f"columns — pandas-based value hashers die on nested cells"
        )


def check_query(spark, name: str, sf_dir: str) -> None:
    from personal_health_etl_pipeline_spark.plans.catalog import CATALOG

    fn, sql = CATALOG[name]
    df = fn(spark, sf_dir)
    assert_scalar_output(df, name)
    if sql is None:
        assert df.count() >= 0  # rows-only check, mirrors driver fallback
        return
    cols, rows, types = run_oracle(sql, sf_dir)
    compare(df, cols, rows, types)
