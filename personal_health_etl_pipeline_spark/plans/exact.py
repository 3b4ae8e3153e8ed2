"""Order-independent float aggregation helpers (oracle-exact math).

Double summation is order-dependent, and Spark's partitioned sums visit
rows in a different order than a single-threaded oracle — so a raw
``SUM(double)`` can differ in the last bits and flip a rounding
boundary. The engine's contract for value-hash parity:

1. cast each *input column* to ``DECIMAL(18,2)`` (the synthetic data is
   generated at 2-decimal precision; the cast is deterministic and
   identical in Spark and DuckDB because .xx5 boundaries are not exactly
   representable in binary doubles),
2. do the row arithmetic in decimal (exact),
3. ``SUM`` decimals (exact, order-independent),
4. cast the exact total to double and ``ROUND`` for display.

Both engines then produce bit-identical doubles. Averages are exact-sum
/ count rather than ``AVG(double)``.

This costs a little vs a native double sum, but stays whole-stage
codegen on the JVM; at true scale flip the queries to plain double sums
when bit-parity with a serial oracle is not a requirement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

IN_DECIMAL = "decimal(18,2)"


def d2(col: Column | str) -> Column:
    """Decimalize a generated-at-2dp double column (exact row value)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(IN_DECIMAL)


def exact_sum(expr: Column, round_to: int = 2) -> Column:
    """Order-independent ``SUM`` of a decimal expression, as rounded double."""
    return F.round(F.sum(expr).cast("double"), round_to)


def exact_avg(expr: Column, round_to: int = 6) -> Column:
    """Order-independent mean: exact decimal sum / count, in double."""
    return F.round(F.sum(expr).cast("double") / F.count(expr), round_to)


# --- DuckDB oracle-side renderings (same math, same rounding) --------

def od2(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(18,2))"


def oracle_sum(expr: str, round_to: int = 2) -> str:
    return f"ROUND(CAST(SUM({expr}) AS DOUBLE), {round_to})"


def oracle_avg(expr: str, round_to: int = 6) -> str:
    return f"ROUND(CAST(SUM({expr}) AS DOUBLE) / COUNT({expr}), {round_to})"
