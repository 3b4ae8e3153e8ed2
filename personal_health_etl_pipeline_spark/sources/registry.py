"""Config-driven source registry with category dispatch (S1-S3).

The reference routes each logical data type through a category
registry: DAILY and DETAILED types use date-range requests, SPECIAL
types use datetime-range or id-day variants, unknown types are a hard
error, and unconfigured endpoints / API failures degrade to an empty
envelope rather than failing the pipeline (reference
``constants.py:20-49``, ``extract.py:82-131``).

The Spark-native form is a plain mapping ``data_type -> SourceSpec``
whose ``reader`` produces a typed DataFrame. Readers are driver-side
thin (an HTTP fetch or fixture call feeding ``createDataFrame``); at
scale the reader instead points at pre-fetched landing files and
returns ``spark.read.schema(...).json(paths)`` so executors do the IO.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from personal_health_etl_pipeline_spark.pipeline.fixtures import (
    RECORD_SCHEMA,
    fetch_range_df,
)

CATEGORY_DAILY = "daily"
CATEGORY_DETAILED = "detailed"
CATEGORY_SPECIAL = "special"

Reader = Callable[[SparkSession, str, dt.date, dt.date], DataFrame]


@dataclass(frozen=True)
class SourceSpec:
    """One logical source: category routing + chunking + schema."""

    category: str
    reader: Optional[Reader] = None  # None = unconfigured endpoint
    chunk_days: Optional[int] = None  # S4: fetch window for high-volume types
    schema: StructType = RECORD_SCHEMA


class UnknownDataTypeError(ValueError):
    """Requested type absent from the registry (extract.py:107-109)."""


# the reference's 15-type registry shape (constants.py:20-49), with the
# fixture reader standing in for the REST endpoints that exist locally
DEFAULT_REGISTRY: dict[str, SourceSpec] = {
    **{
        t: SourceSpec(CATEGORY_DAILY, fetch_range_df)
        for t in (
            "daily_activity",
            "daily_sleep",
            "daily_readiness",
            "daily_stress",
            "daily_resilience",
            "daily_cardiovascular_age",
        )
    },
    **{
        t: SourceSpec(CATEGORY_DETAILED, fetch_range_df)
        for t in (
            "workout",
            "session",
            "sleep",
            "sleep_time",
            "rest_mode_period",
            "enhanced_tag",
            "vO2_max",
        )
    },
    "heartrate": SourceSpec(CATEGORY_SPECIAL, fetch_range_df, chunk_days=7),
    "daily_spo2": SourceSpec(CATEGORY_SPECIAL, fetch_range_df),
}


def extract_data_type(
    spark: SparkSession,
    data_type: str,
    start: dt.date,
    end: dt.date,
    registry: dict[str, SourceSpec] | None = None,
) -> DataFrame:
    """Category-dispatched extraction with the reference's error policy:

    * unknown type  -> ``UnknownDataTypeError`` (hard failure),
    * unconfigured reader or reader failure -> **empty frame** (the
      pipeline records a processed-marker and moves on,
      ``extract.py:111-129``),
    * chunked types -> per-window fetches unioned into one plan (S4).
    """
    reg = DEFAULT_REGISTRY if registry is None else registry
    if data_type not in reg:
        raise UnknownDataTypeError(
            f"unknown data type {data_type!r}; registered: {sorted(reg)}"
        )
    spec = reg[data_type]
    if spec.reader is None:
        return spark.createDataFrame([], spec.schema)
    try:
        if spec.chunk_days:
            frames = []
            lo = start
            while lo <= end:
                hi = min(lo + dt.timedelta(days=spec.chunk_days - 1), end)
                frames.append(spec.reader(spark, data_type, lo, hi))
                lo = hi + dt.timedelta(days=1)
            df = frames[0]
            for f in frames[1:]:
                df = df.unionByName(f)
            return df
        return spec.reader(spark, data_type, start, end)
    except Exception:
        # degrade to empty envelope, never fail the whole extraction
        return spark.createDataFrame([], spec.schema)
