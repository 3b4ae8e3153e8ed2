"""Multi-way full-outer combine on a shared key (reference J1).

The reference folds N per-data-type daily frames into one wide row per
day with an iterated pandas outer merge (``transform.py:130-140``). The
Spark form is a reduce over ``join(..., on=key, how="full_outer")`` —
joining *on the column name* so the key is coalesced automatically and
stays a single column.

Scale notes (100 TB): all N joins share the same key, so Spark can
reuse one hash-partitioning by ``key`` across the whole fold — one
shuffle per input, no re-shuffle between joins. When inputs are known
to be small (the reference's case: one row per day), AQE demotes to
broadcast joins at runtime. For truly large inputs, pre-bucketing the
raw zone by the key removes the shuffle entirely.
"""

from __future__ import annotations

from functools import reduce
from typing import Iterable

from pyspark.sql import DataFrame


def combine_on_key(dfs: Iterable[DataFrame], key: str = "day") -> DataFrame:
    """Full-outer join all frames on ``key``; one wide row per key value.

    Non-key column names must be disjoint (the caller namespaces them
    via ``prefix_columns`` first, reference P3), otherwise the join
    raises an AnalysisException — same contract as the reference, where
    duplicate names would silently collide.
    """
    frames = list(dfs)
    if not frames:
        raise ValueError("combine_on_key requires at least one DataFrame")
    seen: set[str] = set()
    for df in frames:
        non_key = {c for c in df.columns if c != key}
        clash = seen & non_key
        if clash:
            raise ValueError(f"non-key column collision in combine: {sorted(clash)}")
        seen |= non_key
    return reduce(lambda a, b: a.join(b, on=key, how="full_outer"), frames)
