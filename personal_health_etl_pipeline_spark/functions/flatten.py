"""Recursive struct flattening (reference operator F1).

The reference flattens nested dicts into ``parent__child`` columns with a
recursive Python walk and serializes any list it meets to a JSON string
(reference ``transform.py:38-52`` — ``flatten_dict``). Here the same
semantics are a *pure projection* over a typed ``StructType``: Catalyst
sees ``col("a.b.c").alias("a__b__c")``, so flattening costs nothing at
runtime (no UDF, no shuffle) and column pruning still reaches the scan.

Two array modes:

* ``arrays="keep"`` (engine-native): arrays stay ``ArrayType`` — the
  lossless, columnar-friendly representation.
* ``arrays="json"`` (warehouse-boundary parity): arrays are serialized
  with ``to_json``, matching the reference's ``json.dumps`` behavior
  (reference ``transform.py:47-49``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

SEP = "__"


def _flatten_field(
    col: Column, dtype, name: str, arrays: str, sep: str
) -> list[tuple[str, Column]]:
    if isinstance(dtype, StructType):
        out: list[tuple[str, Column]] = []
        for field in dtype.fields:
            out.extend(
                _flatten_field(
                    col.getField(field.name),
                    field.dataType,
                    f"{name}{sep}{field.name}",
                    arrays,
                    sep,
                )
            )
        return out
    if isinstance(dtype, ArrayType) and arrays == "json":
        return [(name, F.to_json(col))]
    return [(name, col)]


def flatten(
    df: DataFrame,
    sep: str = SEP,
    arrays: str = "keep",
    prefix: str | None = None,
) -> DataFrame:
    """Flatten all struct columns to ``parent{sep}child`` flat columns.

    ``prefix`` additionally namespaces every column (reference operator
    P3: ``{data_type}__{column}``, ``transform.py:80-89``), except
    columns listed in no-prefix position — callers that need a stable
    join key should apply :func:`prefix_columns` instead.
    """
    if arrays not in ("keep", "json"):
        raise ValueError(f"arrays must be 'keep' or 'json', got {arrays!r}")
    cols: list[Column] = []
    for field in df.schema.fields:
        for name, col in _flatten_field(
            F.col(field.name), field.dataType, field.name, arrays, sep
        ):
            full = f"{prefix}{sep}{name}" if prefix else name
            cols.append(col.alias(full))
    return df.select(cols)


def prefix_columns(
    df: DataFrame, prefix: str, exclude: tuple[str, ...] = ("day",), sep: str = SEP
) -> DataFrame:
    """Namespace columns as ``{prefix}{sep}{col}`` except join keys.

    Reference operator P3 (``transform.py:80-89``): every non-``day``
    column of a per-data-type frame is prefixed with the data type name
    before the multi-way combine join.
    """
    return df.select(
        [
            F.col(c).alias(c if c in exclude else f"{prefix}{sep}{c}")
            for c in df.columns
        ]
    )


def unflatten_expr_map(schema: StructType, sep: str = SEP) -> dict[str, str]:
    """Map flat ``a__b__c`` names back to struct field paths ``a.b.c``.

    Library helper (SURVEY.md §4): lets callers write queries against the
    reference's flat column names while storing native structs.
    """
    out: dict[str, str] = {}

    def walk(dtype, flat: str, path: str):
        if isinstance(dtype, StructType):
            for field in dtype.fields:
                walk(field.dataType, f"{flat}{sep}{field.name}", f"{path}.{field.name}")
        else:
            out[flat] = path

    for field in schema.fields:
        walk(field.dataType, field.name, field.name)
    return out
