"""Skew mitigation: salted joins for pathological key distributions.

AQE's skew-join split handles most skew at runtime (enabled by the
session factory), but it only helps sort-merge joins whose skewed
partitions it can subdivide. When one join key dominates the fact side
(the classic "null key" / "default user" pathology at 100 TB), salting
is the deterministic fix: explode the dimension side ``salt_buckets``
ways, scatter the fact side across the same buckets, join on
(key, salt), drop the salt. The fact side's hot key now spreads over
``salt_buckets`` tasks instead of one straggler.

Cost model: dimension rows are replicated ``salt_buckets`` times —
appropriate when dim << fact (the only case where skew hurts anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Join ``fact`` with ``dim`` on ``on`` with salt-scattered keys.

    ``fact`` rows get a deterministic pseudo-random salt derived from a
    uniformly-distributed surrogate (crc32 of all columns would do; we
    use a hash of the whole row via ``xxhash64`` — executor-stable);
    ``dim`` rows are exploded across every salt value.
    """
    if how not in ("inner", "left_outer", "left"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_fact = fact.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*fact.columns), F.lit(salt_buckets)).cast("int")
    )
    salted_dim = dim.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")),
    )
    return salted_fact.join(salted_dim, on=[on, SALT_COL], how=how).drop(SALT_COL)
