"""Deterministic Oura-shaped source fixture (stands in for the REST API).

The reference's extract layer GETs ``{base}{endpoint}?start_date&end_date``
with bearer auth and returns ``{"data": [record, ...]}`` (reference
``extract.py:24-46``). Tests and the local pipeline need the same shape
without a network, so this module synthesizes records purely from
``(data_type, day)`` — same inputs, same bytes, every run.

Record shape mirrors the daily types: a required ``day``, a string id,
scalar metrics, a nested ``contributors`` object (flattened to
``contributors__*`` downstream, F1) and a list column (serialized to a
JSON string at the warehouse boundary, F4).
"""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RECORD_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("day", StringType()),  # wire format: ISO string (F2 casts)
        StructField("score", LongType()),
        StructField("temperature_deviation", DoubleType()),
        StructField("timestamp", StringType()),  # wire ts, F3 coerce-parses
        StructField(
            "contributors",
            StructType(
                [
                    StructField("deep_sleep", LongType()),
                    StructField("efficiency", LongType()),
                    StructField("latency", LongType()),
                ]
            ),
        ),
        StructField("met_items", ArrayType(DoubleType())),
    ]
)


def _h(data_type: str, day: dt.date, salt: str) -> int:
    digest = hashlib.sha256(f"{data_type}|{day.isoformat()}|{salt}".encode()).digest()
    return int.from_bytes(digest[:8], "big")


def fetch_range(data_type: str, start: dt.date, end: dt.date) -> list[dict]:
    """Inclusive-range fetch, one record per day (DAILY-category shape).

    Matches the reference API contract: inverted range -> empty ``data``
    (``extract.py:40-44``), end date inclusive (``extract.py:36-37``).
    """
    if end < start:
        return []
    out = []
    day = start
    while day <= end:
        h = _h(data_type, day, "rec")
        out.append(
            {
                "id": f"{data_type}-{day.isoformat()}",
                "day": day.isoformat(),
                "score": 40 + h % 60,
                "temperature_deviation": round((h % 2000) / 1000 - 1.0, 2),
                "timestamp": f"{day.isoformat()}T04:00:00.{h % 1000000:06d}+00:00",
                "contributors": {
                    "deep_sleep": h % 100,
                    "efficiency": (h // 100) % 100,
                    "latency": (h // 10000) % 100,
                },
                "met_items": [round(((h >> s) % 900) / 100, 2) for s in (0, 8, 16)],
            }
        )
        day += dt.timedelta(days=1)
    return out


def fetch_range_df(
    spark: SparkSession, data_type: str, start: dt.date, end: dt.date
) -> DataFrame:
    """The fixture source as a typed DataFrame (what S1-S3 hand on)."""
    return spark.createDataFrame(fetch_range(data_type, start, end), RECORD_SCHEMA)
