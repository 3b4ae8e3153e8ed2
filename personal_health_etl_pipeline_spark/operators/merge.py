"""CDC / warehouse maintenance: SCD-2 merge and snapshot diff.

The reference's warehouse contract is append-only with a duplicate-day
hard error (``etl/load.py:226-323`` validate-then-append) — it never
UPDATEs. Real warehouses built on that raw zone eventually need the two
canonical mutation patterns, expressed here as pure-DataFrame batch
operators (no table-format dependency, so they run on plain parquet):

* ``scd2_merge`` — slowly-changing-dimension type-2: apply an update
  batch to a dimension history, closing changed rows (``valid_to`` =
  effective date) and opening new current rows. This is the MERGE
  statement of Delta/Iceberg re-expressed as joins, so the semantics
  are portable and oracle-checkable.
* ``snapshot_diff`` — classify rows of two table versions into
  added / removed / changed via one full-outer join (the CDC "diff"
  primitive; what table formats compute between versions).

Scale notes (100 TB): every join in ``scd2_merge`` is on the same
dimension key, so Catalyst plans ONE hash-partitioning of each side and
reuses it (no re-shuffle between the change-detect, close, and
anti-join steps; AQE demotes to broadcast when the update batch is
small — the common CDC case). ``snapshot_diff`` is a single full-outer
shuffle join; with both snapshots bucketed by the key it becomes
shuffle-free. Nothing collects to the driver.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _any_attr_differs(attrs: Sequence[str]) -> Column:
    """NULL-safe "payload changed" predicate between u.<attr> and d.<attr>."""
    diffs = [~F.col(f"u.{a}").eqNullSafe(F.col(f"d.{a}")) for a in attrs]
    return reduce(lambda x, y: x | y, diffs)


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: Sequence[str],
    eff_col: str = "eff_date",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Apply one update batch to an SCD-2 dimension history.

    ``dim`` holds the full history (``key``, ``attrs...``, ``from_col``,
    ``to_col`` NULL for open rows, ``current_col``); ``updates`` holds at
    most one row per key (``key``, ``attrs...``, ``eff_col``). Per key:

    * attrs identical to the open row -> no-op (idempotent re-delivery),
    * attrs differ -> open row closes (``to_col`` = eff date, current
      False) and a new open row starts at the effective date,
    * key absent from ``dim`` -> new open row (initial insert).

    Closed history rows pass through untouched. Multi-batch CDC is a
    fold of this operator in effective-date order — same contract as a
    sequence of MERGE statements. Output schema = ``dim``'s.
    """
    cur = dim.filter(F.col(current_col)).alias("d")
    hist = dim.filter(~F.col(current_col))
    u = updates.alias("u")

    # Change detection: left join so brand-new keys (no open row) count.
    joined = u.join(cur, on=F.col(f"u.{key}") == F.col(f"d.{key}"), how="left")
    changed = joined.filter(
        F.col(f"d.{key}").isNull() | _any_attr_differs(attrs)
    ).select(
        F.col(f"u.{key}").alias(key),
        *[F.col(f"u.{a}").alias(a) for a in attrs],
        F.col(f"u.{eff_col}").alias(eff_col),
    )

    change_keys = changed.select(key, eff_col)
    closed = (
        dim.filter(F.col(current_col))
        .join(change_keys, on=key, how="inner")
        .withColumn(to_col, F.col(eff_col))
        .withColumn(current_col, F.lit(False))
        .drop(eff_col)
    )
    untouched = dim.filter(F.col(current_col)).join(
        change_keys.select(key), on=key, how="left_anti"
    )
    opened = changed.select(
        key,
        *attrs,
        F.col(eff_col).alias(from_col),
        F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col),
        F.lit(True).alias(current_col),
    )

    cols = dim.columns
    return (
        hist.select(cols)
        .unionByName(closed.select(cols))
        .unionByName(untouched.select(cols))
        .unionByName(opened.select(cols))
    )


def scd2_merge_cdc(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: Sequence[str],
    op_col: str = "op",
    eff_col: str = "eff_date",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """SCD-2 merge for a FULL CDC batch: ``updates`` carries an
    ``op_col`` of ``'upsert'`` or ``'delete'`` (at most one row per key
    per batch, like :func:`scd2_merge`).

    * ``upsert`` rows behave exactly as :func:`scd2_merge`;
    * ``delete`` rows CLOSE the key's open row (``to_col`` = effective
      date, current False) without opening a successor — the dimension
      remembers the row existed and when it ended, which is what SCD-2
      deletion means (physical removal would falsify history);
    * a delete for an absent/already-closed key is a no-op (idempotent
      re-delivery);
    * a LATER batch upserting a deleted key re-opens it via the
      insert path (its open row is gone, so change-detect sees a new
      key) — tested tombstone->rebirth round trip.

    Scale: one extra equi-join on the (small) delete key set on top of
    :func:`scd2_merge`'s plan; same single hash-partitioning by key.
    """
    ups = updates.filter(F.col(op_col) == "upsert").drop(op_col)
    dels = updates.filter(F.col(op_col) == "delete").select(key, eff_col)
    merged = scd2_merge(
        dim, ups, key, attrs,
        eff_col=eff_col, from_col=from_col, to_col=to_col,
        current_col=current_col,
    )
    d = dels.withColumnRenamed(eff_col, "_del_eff")
    return (
        merged.join(d, on=key, how="left")
        .select(
            *[
                c
                for c in merged.columns
                if c not in (to_col, current_col)
            ],
            F.when(
                F.col(current_col) & F.col("_del_eff").isNotNull(),
                F.col("_del_eff"),
            )
            .otherwise(F.col(to_col))
            .alias(to_col),
            (
                F.col(current_col) & F.col("_del_eff").isNull()
            ).alias(current_col),
        )
        .select(dim.columns)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare: Sequence[str],
) -> DataFrame:
    """Classify rows between two snapshot versions of a keyed table.

    One full-outer join on ``key``; rows only in ``new`` -> ``added``,
    only in ``old`` -> ``removed``, in both with any NULL-safe
    difference over ``compare`` -> ``changed``; identical rows are
    dropped (the usual CDC contract — emit only the delta). Output:
    ``key``, ``change_type``, and ``old_<c>`` / ``new_<c>`` for each
    compared column.
    """
    o = old.select(key, *compare).alias("o")
    n = new.select(key, *compare).alias("n")
    j = o.join(n, on=F.col(f"o.{key}") == F.col(f"n.{key}"), how="full_outer")

    in_old = F.col(f"o.{key}").isNotNull()
    in_new = F.col(f"n.{key}").isNotNull()
    differs = reduce(
        lambda x, y: x | y,
        [~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in compare],
    )
    change_type = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(differs, F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
            "change_type",
            *[F.col(f"o.{c}").alias(f"old_{c}") for c in compare],
            *[F.col(f"n.{c}").alias(f"new_{c}") for c in compare],
        )
    )
