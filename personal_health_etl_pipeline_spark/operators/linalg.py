"""Distributed dense linear algebra over embedding columns: covariance
matrix and PCA projection.

The scale shape is the MLlib RowMatrix one: each partition reduces its
rows to a d×d partial Gram matrix (an Arrow-batched ``mapInPandas`` —
numpy int64 matmul per batch, the only place Python touches data), then
the partials — O(partitions · d²) rows, corpus-size-INDEPENDENT — meet
in one tiny groupBy. No row ever leaves its partition; the shuffle
carries ~4096 longs per partition regardless of corpus size.

Exactness: embeddings are micro-quantized to integer units first
(``operators/similarity.quantize``), so every Gram/marginal sum is an
exact int64 and DuckDB reproduces it bit-for-bit; doubles enter only in
the final covariance division, written with identical cast placement in
both engines. Overflow envelope: |qv| ≤ ~1e6 micro-units ⇒ partial
products ≤ 1e12/row, safe to ~9e6 rows per PARTITION; the global merged
sum is safe to ~9e6 total rows at the 1e6 worst case and ~1e8 at
realistic unit-scale vectors — past that, switch the accumulator dtype
to float64 (partials stay per-partition-exact) or re-scale the grid.

PCA: the d×d covariance is driver-bounded (64×64 here — the same
bounded-ferry contract as the k-means centroid collect,
``operators/clustering.py``), so the eigendecomposition runs in numpy
on the driver and the top-k components broadcast back as literal
arrays; the projection is then a pure JVM map (zip_with dot products),
no UDF in the projection path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from personal_health_etl_pipeline_spark.operators.similarity import (
    QUANT_SCALE,
    quantize,
)

PARTIAL_SCHEMA = StructType(
    [
        StructField("i", IntegerType()),
        StructField("j", IntegerType()),
        StructField("v", LongType()),
    ]
)

# sentinel indices in the partial stream
_COUNT = -1  # (i=-1, j=-1) -> row count


def _gram_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        if pdf.empty:
            continue
        X = np.stack(pdf["qv"].to_numpy()).astype(np.int64)  # (n, d)
        n, d = X.shape
        gram = X.T @ X  # exact int64
        sums = X.sum(axis=0)
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        out = pd.DataFrame(
            {
                "i": np.concatenate(([_COUNT], np.arange(d), ii.ravel())),
                "j": np.concatenate(([_COUNT], np.full(d, _COUNT), jj.ravel())),
                "v": np.concatenate(([n], sums, gram.ravel())),
            }
        )
        out["i"] = out["i"].astype("int32")
        out["j"] = out["j"].astype("int32")
        out["v"] = out["v"].astype("int64")
        yield out


def covariance_matrix(
    df: DataFrame, vec_col: str = "embedding", persist: bool = True
) -> DataFrame:
    """Population covariance of the vector column: rows ``(i, j, cov)``.

    cov[i,j] = (Σxᵢxⱼ − ΣxᵢΣxⱼ/n)/n over the micro-quantized grid,
    rescaled to the original units.

    The merged partial table (≤ (d+1)² rows, KBs) feeds three consumers
    (gram, marginals, count); with ``persist=True`` (default) it is
    cached and eagerly materialized so the source scan + Arrow partials
    run ONCE — without it, Spark re-executes the whole lineage per
    consumer (4 scans; the k-means-class flaw from the round-3 review).
    The cache is a few KB regardless of corpus size and Spark's
    ContextCleaner reclaims it when the result's lineage is released;
    callers wanting deterministic release can ``collect()`` the result
    and drop the reference.
    """
    partials = (
        df.select(quantize(F.col(vec_col)).alias("qv"))
        .mapInPandas(_gram_partials, PARTIAL_SCHEMA)
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
    )
    if persist:
        partials = partials.persist()
        partials.count()  # materialize: every consumer below reads cache
    n = partials.filter((F.col("i") == _COUNT) & (F.col("j") == _COUNT)).select(
        F.col("v").alias("n_rows")
    )
    marg = partials.filter((F.col("i") != _COUNT) & (F.col("j") == _COUNT)).select(
        F.col("i").alias("k"), F.col("v").alias("s")
    )
    gram = partials.filter(F.col("j") != _COUNT)
    si = marg.select(F.col("k").alias("i"), F.col("s").alias("s_i"))
    sj = marg.select(F.col("k").alias("j"), F.col("s").alias("s_j"))
    nd = F.col("n_rows").cast("double")
    cov = (
        F.col("v").cast("double")
        - F.col("s_i").cast("double") * F.col("s_j").cast("double") / nd
    ) / nd / float(QUANT_SCALE) ** 2
    return (
        gram.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(n))
        .select("i", "j", F.round(cov, 8).alias("cov"))
    )


def pca_components(df: DataFrame, vec_col: str = "embedding", k: int = 8):
    """Top-``k`` principal axes (numpy eigh on the driver-bounded d×d
    covariance). Returns ``(components, eigenvalues)``: ``components``
    is a k×d list of unit vectors with a deterministic sign convention
    (largest-|coordinate| entry positive)."""
    import numpy as np

    rows = covariance_matrix(df, vec_col).collect()  # bounded: d² rows
    d = max(r.i for r in rows) + 1
    C = np.zeros((d, d))
    for r in rows:
        C[r.i][r.j] = r.cov
    vals, vecs = np.linalg.eigh(C)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        pivot = np.argmax(np.abs(v))
        if v[pivot] < 0:
            v = -v
        comps.append(v.tolist())
    return comps, [float(vals[i]) for i in order]


def pca_project(
    df: DataFrame, components: list[list[float]], vec_col: str = "embedding"
) -> Column:
    """JVM-side projection onto precomputed axes: for each component, a
    zip_with dot product against a literal array — map-only, no UDF."""
    dots = [
        F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                F.array(*[F.lit(float(x)) for x in comp]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for comp in components
    ]
    return F.array(*dots)
