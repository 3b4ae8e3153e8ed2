"""Data-quality expectation reports and blocked fuzzy matching.

Two pipeline-hygiene operators the reference's validate-then-act
contract (``load.py:277-302`` hard-fails on duplicate days) generalizes
to:

* ``expectations_report`` — declarative rule evaluation in ONE
  aggregation pass: every rule is a boolean Column; violations
  accumulate as conditional sums with map-side combine, so a thousand
  rules still cost one scan and one 1-row shuffle. The report unpivots
  to a row per rule (rule, n_rows, n_violations, violation_rate,
  passed) — the Great-Expectations/dbt-test shape, Spark-native.
* ``blocked_fuzzy_join`` — approximate string matching with explicit
  blocking: candidate pairs come from an equi-join on the block key
  (never a cross join), then exact Levenshtein scores the survivors
  JVM-side. Recall is bounded by the blocking function — callers pick
  block keys the corruption process cannot touch (documented in the
  catalog entry); that trade is the standard record-linkage design,
  not an implementation shortcut.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectations_report(
    df: DataFrame, rules: dict[str, Column], rate_dp: int = 6
) -> DataFrame:
    """Evaluate expectation ``rules`` (name -> boolean Column that is
    True when the ROW SATISFIES the expectation; NULL counts as a
    violation) in one aggregation; returns one row per rule."""
    if not rules:
        raise ValueError("expectations_report needs at least one rule")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (_, expect) in enumerate(rules.items()):
        aggs.append(
            F.sum(
                F.when(F.coalesce(expect, F.lit(False)), 0).otherwise(1)
            ).alias(f"_v{i}")
        )
    summary = df.agg(*aggs)
    per_rule = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"_v{i}").alias("n_violations"),
            )
            for i, name in enumerate(rules)
        ]
    )
    return (
        summary.select(F.col("_n").alias("n_rows"), F.explode(per_rule).alias("r"))
        .select(
            F.col("r.rule").alias("rule"),
            "n_rows",
            F.col("r.n_violations").alias("n_violations"),
            F.round(
                F.col("r.n_violations").cast("double") / F.col("n_rows"), rate_dp
            ).alias("violation_rate"),
            (F.col("r.n_violations") == 0).alias("passed"),
        )
    )


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    block_col: str,
    left_text: str,
    right_text: str,
    max_distance: int = 2,
) -> DataFrame:
    """Candidate pairs from an equi-join on ``block_col``, scored with
    exact Levenshtein and filtered to ``distance <= max_distance``.
    Output: all left columns, all right columns, ``lev_distance``.
    Identical-text pairs score 0 and are kept — filter upstream if only
    corrections are wanted."""
    j = left.alias("l").join(
        right.alias("r"), on=F.col(f"l.{block_col}") == F.col(f"r.{block_col}")
    )
    dist = F.levenshtein(F.col(f"l.{left_text}"), F.col(f"r.{right_text}"))
    return j.withColumn("lev_distance", dist).filter(
        F.col("lev_distance") <= max_distance
    )
