"""Distributed covariance + PCA (operators/linalg.py)."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from personal_health_etl_pipeline_spark.operators.linalg import (
    covariance_matrix,
    pca_components,
    pca_project,
)


@pytest.fixture(scope="module")
def aniso(spark):
    """200 vectors in R^6 with variance concentrated on axis 0 then 1."""
    rng = random.Random(7)
    rows = []
    for i in range(200):
        v = [
            rng.gauss(0, 10.0),
            rng.gauss(0, 3.0),
            rng.gauss(0, 1.0),
            rng.gauss(0, 0.5),
            rng.gauss(0, 0.25),
            rng.gauss(0, 0.1),
        ]
        rows.append((i, [float(x) for x in v]))
    schema = StructType(
        [StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
    )
    df = spark.createDataFrame(rows, schema)
    X = np.array([r[1] for r in rows], dtype=np.float64)
    return df, X


def test_covariance_matches_numpy(spark, aniso):
    df, X = aniso
    got = {(r.i, r.j): r.cov for r in covariance_matrix(df).collect()}
    # numpy population covariance on the same micro-quantized grid
    Q = np.round(X * 1_000_000)
    C = (Q.T @ Q / len(Q) - np.outer(Q.mean(0), Q.mean(0))) / 1e12
    assert len(got) == 36
    for (i, j), v in got.items():
        assert v == pytest.approx(C[i][j], abs=2e-6)


def test_covariance_is_symmetric(spark, aniso):
    df, _ = aniso
    got = {(r.i, r.j): r.cov for r in covariance_matrix(df).collect()}
    for (i, j), v in got.items():
        assert v == got[(j, i)]


def test_pca_axes_and_eigenvalue_order(spark, aniso):
    df, X = aniso
    comps, vals = pca_components(df, k=3)
    assert vals == sorted(vals, reverse=True)
    # dominant axis is e0, second is e1 (up to sign, which is pinned)
    assert abs(comps[0][0]) > 0.99
    assert abs(comps[1][1]) > 0.99
    # unit norm
    for c in comps:
        assert math.fsum(x * x for x in c) == pytest.approx(1.0, abs=1e-9)


def test_projection_matches_numpy_and_stays_jvm(spark, aniso):
    df, X = aniso
    comps, _ = pca_components(df, k=2)
    proj = df.select("vec_id", pca_project(df, comps).alias("p")).orderBy("vec_id")
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan and "EvalPython" not in plan
    got = np.array([r.p for r in proj.collect()])
    want = X @ np.array(comps).T
    # float32 storage of the vectors dominates the tolerance
    assert np.abs(got - want).max() < 1e-2


def test_projection_variance_tracks_eigenvalues(spark, aniso):
    df, _ = aniso
    comps, vals = pca_components(df, k=3)
    proj = df.select(pca_project(df, comps).alias("p"))
    P = np.array([r.p for r in proj.collect()])
    variances = P.var(axis=0)
    assert variances[0] > variances[1] > variances[2]
    for v, lam in zip(variances, vals):
        assert v == pytest.approx(lam, rel=0.05)


def test_covariance_scans_source_once(spark, sf_dir):
    """The merged partials are persisted and eagerly materialized, so
    the three consumers (gram / marginals / count) must all read the
    CACHE: every leaf of the executed final plan is an in-memory scan —
    the parquet source was touched exactly once, by the materializing
    count() (the k-means-class rescan flaw from the round-3 review,
    fixed here by construction)."""
    from personal_health_etl_pipeline_spark.plans.sketches import emb_covariance

    df = emb_covariance(spark, sf_dir)
    df.collect()

    kinds: list[str] = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if "QueryStage" in name:  # AQE stage wrappers delegate to .plan()
            walk(node.plan())
            return
        ch = node.children()
        if ch.size() == 0:
            kinds.append(name)
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    assert kinds, "no leaves?"
    assert any("InMemory" in k for k in kinds), kinds
    assert not any("FileSourceScan" in k or "FileScan" in k for k in kinds), kinds
