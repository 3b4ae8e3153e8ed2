"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``personal_health_etl_pipeline_spark``; the
catalog module assembles the query/oracle registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from personal_health_etl_pipeline_spark.plans import catalog
from personal_health_etl_pipeline_spark.plans.reference_surface import (
    j9_oura_end_to_end,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's signature end-to-end daily transform
    (nested records -> flatten -> prefix -> combine -> schema align)
    on sf0.001; rows > 0, stable schema."""
    return j9_oura_end_to_end(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL equivalent for each query (where expressible)."""
    return catalog.oracle_sql()
