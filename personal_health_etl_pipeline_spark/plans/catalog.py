"""Query catalog: every implemented operator exposed as a named query.

Each entry maps a name to ``(spark_fn, oracle_sql)`` where ``spark_fn``
is ``(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the DuckDB
equivalent over the same parquet tables (or ``None`` for ops SQL can't
express — the driver then records a rows-only check).

This is the single source of truth behind ``__spark_entry__.queries()``
/ ``oracle_sql()`` and the local parity test mirrors the driver's gate
over exactly this dict.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from personal_health_etl_pipeline_spark.plans import tpch

QueryFn = Callable[[SparkSession, str], DataFrame]

CATALOG: dict[str, tuple[QueryFn, Optional[str]]] = {}


def register(name: str, fn: QueryFn, oracle: Optional[str]) -> None:
    if name in CATALOG:
        raise ValueError(f"duplicate query name {name!r}")
    CATALOG[name] = (fn, oracle)


register("q1_pricing_summary", tpch.q1_pricing_summary, tpch.Q1_ORACLE)
register("q3_shipping_priority", tpch.q3_shipping_priority, tpch.Q3_ORACLE)
register("q5_region_volume", tpch.q5_region_volume, tpch.Q5_ORACLE)
register("q6_revenue_delta", tpch.q6_revenue_delta, tpch.Q6_ORACLE)
register("q10_returned_items", tpch.q10_returned_items, tpch.Q10_ORACLE)


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in CATALOG.items() if sql is not None}
