"""Local mirror of the driver's DuckDB-oracle differential check.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column-name set and
(order-insensitively) every value. Floats must match to 1e-9 — the
engine's aggregation recipe (plans.exact) is designed to make them
bit-identical, so any drift is a real bug, not noise.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

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


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


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


def compare(spark_df, oracle_cols: list[str], oracle_rows: list[tuple]) -> None:
    s_cols = list(spark_df.columns)
    assert sorted(s_cols) == sorted(oracle_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(oracle_cols)}"
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
                ok = (
                    math.isclose(sv, ov, rel_tol=1e-9, abs_tol=1e-9)
                    or (math.isnan(sv) and math.isnan(ov))
                )
            else:
                ok = sv == ov
            assert ok, (
                f"value mismatch at sorted-row {rn}, col {sorted(s_cols)[cn]!r}: "
                f"spark={sv!r} oracle={ov!r}"
            )


def check_query(spark, name: str, sf_dir: str) -> None:
    from personal_health_etl_pipeline_spark.plans.catalog import CATALOG

    fn, sql = CATALOG[name]
    df = fn(spark, sf_dir)
    if sql is None:
        assert df.count() >= 0  # rows-only check, mirrors driver fallback
        return
    cols, rows = run_oracle(sql, sf_dir)
    compare(df, cols, rows)
