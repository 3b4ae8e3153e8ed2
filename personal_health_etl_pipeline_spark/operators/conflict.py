"""Duplicate-key conflict detection (reference J3).

The reference raises mid-scan when two raw blobs contain the same day
(``load.py:277-302``). Per-row raising doesn't exist in a distributed
transform, so the engine restructures it as validate-then-act
(SURVEY.md §7 "error-as-dataflow"): an aggregate counts conflicting
keys, the pipeline fails *before* the write if any exist.

``conflicting_keys`` is also exposed as a plain query (groupBy + HAVING
count > 1) so data-quality probes can run it without the raise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DuplicateKeyError(ValueError):
    """Raised when a frame violates a uniqueness invariant."""


def conflicting_keys(df: DataFrame, key: str = "day") -> DataFrame:
    """Keys appearing more than once, with their multiplicities."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_records"))
        .where(F.col("n_records") > 1)
    )


def assert_unique_key(df: DataFrame, key: str = "day", sample: int = 5) -> DataFrame:
    """Fail fast (with offending keys cited) if ``key`` is not unique.

    Returns ``df`` unchanged on success so it chains inside pipelines.
    The probe is a single aggregation job; only ``sample`` offending
    keys are brought to the driver for the error message.
    """
    bad = conflicting_keys(df, key).limit(sample).collect()
    if bad:
        cited = ", ".join(f"{r[key]!r}(x{r['n_records']})" for r in bad)
        raise DuplicateKeyError(f"duplicate {key!r} values detected: {cited}")
    return df
