"""Coercing casts and boundary serialization (reference F2/F3/F4).

* ``to_date_strict`` — reference F2 (``transform.py:17-22``): string to
  date, *raise* on invalid. Spark transforms can't raise per-row, so the
  strict variant is validate-then-act: cast, then fail if any row became
  NULL that wasn't NULL before (aggregate check, no collect of data).
* ``to_timestamp_coerce`` — reference F3 (``transform.py:107-111``):
  ``pd.to_datetime(..., errors='coerce')`` with format
  ``%Y-%m-%dT%H:%M:%S.%f%z``; invalid input becomes NULL. Spark's
  non-ANSI ``to_timestamp`` already returns NULL on mismatch.
* ``arrays_to_json`` — reference F4 (``transform.py:142-150``,
  ``load.py:163-171``): serialize array/struct cells to JSON strings at
  the warehouse boundary only; internally the engine keeps native types.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType

# Spark pattern equivalent of the reference's '%Y-%m-%dT%H:%M:%S.%f%z'
OURA_TIMESTAMP_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


class InvalidDateError(ValueError):
    """Raised by strict casts when non-null input fails to parse."""


def to_date_strict(df: DataFrame, col: str, fmt: str | None = None) -> DataFrame:
    """Cast ``col`` to DateType; raise if any non-null value is unparseable.

    Distributed validate-then-act: the invalid-row probe is an aggregate
    (count of newly-null rows), never a driver-side row loop.
    """
    # try_to_date keeps the probe ANSI-mode-independent (Spark 4 runs
    # ANSI by default, where a plain cast would itself raise mid-scan).
    casted = (
        F.try_to_date(F.col(col), F.lit(fmt)) if fmt else F.try_to_date(F.col(col))
    )
    bad_pred = F.col(col).isNotNull() & casted.isNull()
    sample = df.where(bad_pred).select(col).first()
    if sample is not None:
        raise InvalidDateError(f"unparseable date in column {col!r}: {sample[0]!r}")
    return df.withColumn(col, casted)


def to_timestamp_coerce(col: Column | str, fmt: str = OURA_TIMESTAMP_FORMAT) -> Column:
    """String -> timestamp; malformed input -> NULL (pandas 'coerce')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt))


def arrays_to_json(df: DataFrame) -> DataFrame:
    """Serialize every array/map/struct column to a JSON string.

    Warehouse-boundary parity with the reference's ``json.dumps`` pass;
    NULL-safe (``to_json`` of NULL is NULL, matching the reference's
    ``if x is not None`` guard).
    """
    cols = []
    for field in df.schema.fields:
        if isinstance(field.dataType, (ArrayType, MapType, StructType)):
            cols.append(F.to_json(F.col(field.name)).alias(field.name))
        else:
            cols.append(F.col(field.name))
    return df.select(cols)
