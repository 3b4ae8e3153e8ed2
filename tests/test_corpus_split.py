"""Leakage-safe splitting and temperature mixing (llm_surface /
llm_surface2 curation extensions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.plans.llm_surface import (
    corpus_split_groupsafe,
)
from personal_health_etl_pipeline_spark.plans.llm_surface2 import (
    MIX_TARGET,
    corpus_mix_temperature,
)


class TestGroupSafeSplit:
    def test_near_dups_never_straddle_splits(self, spark, sf_dir):
        """THE property: every doc of one split_unit lands in one split."""
        out = corpus_split_groupsafe(spark, sf_dir)
        leaky = (
            out.groupBy("split_unit")
            .agg(F.countDistinct("split").alias("n_splits"))
            .filter(F.col("n_splits") > 1)
        )
        assert leaky.count() == 0

    def test_total_coverage_and_rough_proportions(self, spark, sf_dir):
        out = corpus_split_groupsafe(spark, sf_dir).cache()
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        assert out.count() == docs.count()  # every doc assigned exactly once
        frac = {
            r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        n = sum(frac.values())
        # hash binning is uniform-ish; wide tolerance at tiny SF
        assert frac.get("train", 0) / n > 0.6
        assert frac.get("train", 0) / n < 0.95
        out.unpersist()


class TestTemperatureMixing:
    def test_quota_math_and_selection(self, spark, sf_dir):
        out = corpus_mix_temperature(spark, sf_dir).cache()
        # each lang contributes exactly its quota (quota <= lang size by
        # construction at alpha=0.5 and target << corpus)
        per = out.groupBy("lang").agg(
            F.count("*").alias("n_sel"), F.max("quota").alias("quota")
        )
        assert per.filter(F.col("n_sel") != F.col("quota")).count() == 0
        # integer flooring keeps the total at or under the target
        assert out.count() <= MIX_TARGET
        out.unpersist()

    def test_flattens_relative_to_proportional(self, spark, sf_dir):
        """Temperature 0.5 must give low-resource langs a LARGER share
        than proportional sampling and high-resource langs a smaller
        one (the whole point of the operator)."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        corpus = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        out = corpus_mix_temperature(spark, sf_dir)
        sel = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        n_corpus, n_sel = sum(corpus.values()), sum(sel.values())
        top = max(corpus, key=corpus.get)
        low = min(corpus, key=corpus.get)
        assert sel[top] / n_sel < corpus[top] / n_corpus
        assert sel[low] / n_sel > corpus[low] / n_corpus

    def test_deterministic(self, spark, sf_dir):
        a = sorted(map(tuple, corpus_mix_temperature(spark, sf_dir).collect()))
        b = sorted(map(tuple, corpus_mix_temperature(spark, sf_dir).collect()))
        assert a == b
