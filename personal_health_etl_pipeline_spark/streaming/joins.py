"""Stream-stream interval join with watermark-bounded state.

The reference has no streaming runtime (SURVEY.md §2.8); this is the
engine's extended surface for correlating two live event streams — the
canonical "purchase joined to the clicks that preceded it" shape.

Mode-agnostic by construction: the same function runs as a batch plan
(how the catalog oracle-checks its semantics) and as a Structured
Streaming plan (how ``tests/test_streaming.py`` certifies execution).
In streaming mode the watermarks + the two-sided time bound are what
let Spark evict join state: a buffered left row can be dropped once
the right watermark passes ``left_ts + 0``, a right row once the left
watermark passes ``right_ts + lookback``. Without the explicit bounds
the state store grows forever — that is the 100 TB failure mode this
wrapper exists to prevent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RKEY = "__sj_rkey_{}"


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_ts: str,
    right_ts: str,
    lookback_seconds: int,
    watermark: str | None = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join right rows whose timestamp falls in
    ``[left_ts - lookback_seconds, left_ts]`` for the same keys.

    ``watermark`` (a Spark interval string) is applied to BOTH event-
    time columns; pass ``None`` in batch mode to skip it (harmless
    either way — ``withWatermark`` is a no-op in batch plans, so the
    default keeps one code path for both modes).

    Non-key column names must be disjoint between the two sides (the
    usual stream-join hygiene); key columns are deduplicated to the
    left side's.
    """
    keys = [on] if isinstance(on, str) else list(on)
    collisions = (set(left.columns) & set(right.columns)) - set(keys)
    if collisions:
        raise ValueError(
            f"column collision between streams: {sorted(collisions)}; "
            "rename before joining"
        )
    if watermark is not None:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    renamed = right
    for i, k in enumerate(keys):
        renamed = renamed.withColumnRenamed(k, _RKEY.format(i))
    cond = F.lit(True)
    for i, k in enumerate(keys):
        cond = cond & (F.col(k) == F.col(_RKEY.format(i)))
    cond = (
        cond
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {int(lookback_seconds)} SECOND"))
        & (F.col(right_ts) <= F.col(left_ts))
    )
    return left.join(renamed, cond, how).drop(
        *[_RKEY.format(i) for i in range(len(keys))]
    )


def enrich_static(
    stream: DataFrame,
    static: DataFrame,
    on: Sequence[str] | str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of ``stream`` is
    joined against the (bounded) ``static`` dimension, broadcast so the
    stream never shuffles and no join state is kept.

    This is the canonical "attach the profile/dimension to the live
    event" operator. Unlike a stream-stream join it needs no watermark:
    the static side is re-resolved per micro-batch (so an updated
    dimension table is picked up on the next batch) and nothing is
    buffered. Works identically in batch mode — the catalog
    oracle-checks the semantics there, ``tests/test_streaming.py``
    certifies micro-batch execution.

    At 100 TB the constraint is only the broadcast limit on the static
    side; past that, drop the hint and pre-bucket both sides on the key.
    """
    keys = [on] if isinstance(on, str) else list(on)
    collisions = (set(stream.columns) & set(static.columns)) - set(keys)
    if collisions:
        raise ValueError(
            f"column collision with static side: {sorted(collisions)}; "
            "rename before joining"
        )
    return stream.join(F.broadcast(static), keys, how)
