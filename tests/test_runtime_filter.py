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


def test_build_params_travel_with_bloom_and_mismatch_is_rejected(tables):
    """ADVICE-r9: the bit array records its build parameters as column
    metadata; probing defaults to them, and an explicit contradiction
    (which would silently produce false negatives) is a hard error."""
    import pytest

    li, build = tables
    bloom = bloom_build(build, "l_orderkey", m_bits=1 << 12, k=2,
                        hash_family="md5")
    meta = bloom.schema["words"].metadata
    assert meta == {"m_bits": 1 << 12, "k": 2, "hash_family": "md5"}

    # defaults read from metadata: identical survivors to explicit args
    implicit = bloom_prefilter(li, "l_orderkey", bloom)
    explicit = bloom_prefilter(li, "l_orderkey", bloom, m_bits=1 << 12,
                               k=2, hash_family="md5")
    assert implicit.exceptAll(explicit).count() == 0
    assert explicit.exceptAll(implicit).count() == 0

    # zero false negatives even at non-default params via the implicit
    # path — the guarantee the metadata plumbing exists to protect
    true_keys = build.select("l_orderkey").distinct()
    missed = true_keys.join(implicit.select("l_orderkey").distinct(),
                            "l_orderkey", "left_anti")
    li_keys = li.select("l_orderkey").distinct()
    assert missed.join(li_keys, "l_orderkey", "left_semi").count() == 0

    with pytest.raises(ValueError, match="hash_family.*contradicts"):
        bloom_prefilter(li, "l_orderkey", bloom, hash_family="xxhash64")
    with pytest.raises(ValueError, match="m_bits.*contradicts"):
        bloom_prefilter(li, "l_orderkey", bloom, m_bits=1 << 16)


def test_metadataless_bloom_requires_explicit_params(tables):
    """ADVICE-r10: a bit array persisted through a metadata-dropping
    sink must be probed with EXPLICIT m_bits/k/hash_family — silently
    defaulting would produce false negatives for any non-default build,
    so the metadata-less implicit path is a hard error, and the fully
    explicit probe of the same stripped array stays exact."""
    li, build = tables
    bloom = bloom_build(build, "l_orderkey", m_bits=1 << 12, k=2,
                        hash_family="md5")
    stripped = bloom.withMetadata("words", {})
    assert dict(stripped.schema["words"].metadata or {}) == {}

    with pytest.raises(ValueError, match="no recorded m_bits"):
        bloom_prefilter(li, "l_orderkey", stripped)
    # partial args don't rescue it: the remaining params still raise
    with pytest.raises(ValueError, match="no recorded k"):
        bloom_prefilter(li, "l_orderkey", stripped, m_bits=1 << 12)

    explicit = bloom_prefilter(li, "l_orderkey", stripped, m_bits=1 << 12,
                               k=2, hash_family="md5")
    true_matches = li.join(build.distinct(), "l_orderkey", "left_semi")
    assert true_matches.exceptAll(explicit).count() == 0
