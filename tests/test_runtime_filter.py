"""Bloom runtime-filter semi-join (operators/runtime_filter.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.operators.runtime_filter import (
    bloom_build,
    bloom_prefilter,
    bloom_semi_join,
)
from personal_health_etl_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    build = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return li, build


def test_equals_plain_semi_join(tables):
    li, build = tables
    bloomed = bloom_semi_join(li, build, key="l_orderkey")
    plain = li.join(build.distinct(), on="l_orderkey", how="left_semi")
    assert bloomed.count() == plain.count()
    assert bloomed.exceptAll(plain).count() == 0
    assert plain.exceptAll(bloomed).count() == 0


def test_prefilter_is_superset_with_low_fpr(tables):
    li, build = tables
    bloom = bloom_build(build, "l_orderkey")
    survivors = bloom_prefilter(li, "l_orderkey", bloom)
    true_matches = li.join(build.distinct(), on="l_orderkey", how="left_semi")
    n_probe, n_surv, n_true = li.count(), survivors.count(), true_matches.count()
    # no false negatives
    assert true_matches.exceptAll(survivors).count() == 0
    # false-positive rate over the non-matching probe rows stays small
    fpr = (n_surv - n_true) / max(1, n_probe - n_true)
    assert fpr < 0.05, f"fpr={fpr:.4f}"


def test_bit_array_is_bounded(tables):
    _, build = tables
    [row] = bloom_build(build, "l_orderkey", m_bits=1 << 16).collect()
    assert len(row.words) == (1 << 16) // 64


def test_prefilter_plan_is_map_side(tables):
    """The probe reaches the bloom test without any Exchange: the only
    join above the probe scan is the 1-row broadcast of the bit array."""
    li, build = tables
    bloom = bloom_build(build, "l_orderkey")
    plan = bloom_prefilter(li, "l_orderkey", bloom)._jdf.queryExecution().toString()
    pre, _, _ = plan.partition("BroadcastNestedLoopJoin")
    assert "BroadcastNestedLoopJoin" in plan
    # Everything above the BNLJ (the probe-side pipeline to the output)
    # must be exchange-free; the build side below it aggregates 1024
    # words and may exchange freely.
    assert "Exchange" not in pre, pre
