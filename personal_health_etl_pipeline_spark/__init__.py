"""personal_health_etl_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference repo ``kirill-markin/personal-health-etl-pipeline`` (a pandas +
GCS + BigQuery daily health ETL), re-expressed Spark-first and extended
with large-scale training-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis).

Design principles (SURVEY.md §2/§4):

* DataFrame/SQL everywhere — declare the logical plan and let Catalyst
  choose the physical strategy (predicate pushdown, column pruning,
  broadcast vs sort-merge joins, AQE).
* No driver-side materialization in the hot path; every operator is a
  DataFrame -> DataFrame transform that scales by partitioning.
* Python UDFs only where built-ins genuinely can't express the
  semantics, and then Arrow-batched (pandas_udf / mapInPandas).
"""

from personal_health_etl_pipeline_spark.session import get_spark

__all__ = ["get_spark"]

__version__ = "0.1.0"
