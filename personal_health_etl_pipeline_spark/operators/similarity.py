"""Similarity search over embedding columns (array<float>).

Two paths, both UDF-free (array-lambda expressions on the JVM):

* **brute-force top-k** — the correctness baseline: broadcast the query
  set, score every (query, candidate) pair, per-query row_number <= k.
  O(Q x N); right answer, fine when Q is small.
* **hyperplane-LSH top-k** — the scale path: sign-random-projection
  bucketing (signs derived from md5, so fully deterministic and
  oracle-reproducible); candidates share the query's bucket, scoring is
  O(Q x N/2^planes) expected. Recall < 1 by construction; the tests
  measure it against brute force.

Determinism contract: embeddings are quantized to integer grids
(round(x * 1e6)) before any arithmetic, so dot products and norms are
*exact integers* — order-independent, hence identical in Spark's
partitioned execution and the serial DuckDB oracle. The final cosine is
one double division of exact ints (IEEE-deterministic).
"""

from __future__ import annotations

import hashlib

from personal_health_etl_pipeline_spark.operators.partitioning import spread

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT_SCALE = 1_000_000


def quantize(col: Column) -> Column:
    """array<float> -> array<bigint> on a 1e-6 grid (exact arithmetic)."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * QUANT_SCALE, 0).cast("bigint")
    )


def dot_int(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def norm2_int(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def cosine(a_q: Column, b_q: Column, round_to: int = 6) -> Column:
    """Cosine over quantized vectors; exact-int inputs -> deterministic."""
    return F.round(
        dot_int(a_q, b_q).cast("double")
        / (F.sqrt(norm2_int(a_q).cast("double")) * F.sqrt(norm2_int(b_q).cast("double"))),
        round_to,
    )


def cosine_pre(a_q: Column, b_q: Column, a_n2: Column, b_n2: Column,
               round_to: int = 6) -> Column:
    """Cosine with precomputed squared norms.

    ``norm2_int`` is O(dims) per evaluation; inside a pairwise join it
    would run once per *pair*. Computing it once per vector and joining
    it along turns the per-pair cost into a single dot product — same
    exact-integer math, same result, ~3x less array work in the hot
    join."""
    return F.round(
        dot_int(a_q, b_q).cast("double")
        / (F.sqrt(a_n2.cast("double")) * F.sqrt(b_n2.cast("double"))),
        round_to,
    )


def brute_force_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    query_mod: int = 50,
) -> DataFrame:
    """Exact top-k cosine neighbors for the query subset
    (id % query_mod == 0) against the full table.

    The query side is broadcast; the big side streams — no shuffle of
    the candidate table. Rank ties break on neighbor id (total order).
    """
    base = (
        spread(embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col)))
        .select("_id", quantize(F.col(vec_col)).alias("_q"))
        .withColumn("_n2", norm2_int(F.col("_q")))
    )
    queries = base.where(F.col("_id") % query_mod == 0).select(
        F.col("_id").alias("query_id"),
        F.col("_q").alias("_qq"),
        F.col("_n2").alias("_qn2"),
    )
    sim = cosine_pre(F.col("_qq"), F.col("_q"), F.col("_qn2"), F.col("_n2"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        base.join(F.broadcast(queries), F.col("_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("_id").alias("neighbor_id"),
            sim.alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


# --- hyperplane LSH -------------------------------------------------------

def hyperplane_signs(n_planes: int, dims: int, table: int = 0) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix derived from md5 — identical
    in any engine/language, so the oracle can embed it as literals.
    ``table`` seeds independent hash tables for multi-table LSH."""
    signs = []
    for p in range(n_planes):
        row = []
        for d in range(dims):
            digest = hashlib.md5(f"plane|{table}|{p}|{d}".encode()).hexdigest()
            row.append(1 if int(digest[:2], 16) % 2 == 0 else -1)
        signs.append(row)
    return signs


def lsh_bucket(q_vec: Column, signs: list[list[int]]) -> Column:
    """Bucket id: one sign bit per hyperplane (exact int projections)."""
    bucket = F.lit(0).cast("bigint")
    for p, row in enumerate(signs):
        proj = F.aggregate(
            F.zip_with(
                q_vec,
                F.array(*[F.lit(s).cast("bigint") for s in row]),
                lambda x, s: x * s,
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2**p).cast("bigint")).otherwise(0)
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    query_mod: int = 50,
    n_planes: int = 4,
    n_tables: int = 4,
    dims: int = 64,
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH.

    ``n_tables`` independent hash tables of ``n_planes`` sign bits; a
    candidate is scored iff it shares a bucket with the query in at
    least one table (standard k/L LSH: L tables boost recall, k planes
    keep per-bucket candidate counts ~N/2^k). The bucket match is a
    plain equi-join on (table, bucket) — hash-partitionable; expected
    scored pairs ~= Q x N x (1 - (1-2^-k)^L) instead of Q x N.
    """
    base = (
        spread(embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col)))
        .select("_id", quantize(F.col(vec_col)).alias("_q"))
        .withColumn("_n2", norm2_int(F.col("_q")))
    )
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket(F.col("_q"), hyperplane_signs(n_planes, dims, t)).alias(
                    "bucket"
                ),
            )
            for t in range(n_tables)
        ]
    )
    banded = base.select("_id", F.explode(buckets).alias("bk")).select(
        "_id", "bk.tbl", "bk.bucket"
    )
    qbanded = banded.where(F.col("_id") % query_mod == 0).select(
        F.col("_id").alias("query_id"),
        F.col("tbl").alias("qtbl"),
        F.col("bucket").alias("qbucket"),
    )
    candidates = (
        banded.join(
            F.broadcast(qbanded),
            (F.col("tbl") == F.col("qtbl"))
            & (F.col("bucket") == F.col("qbucket"))
            & (F.col("_id") != F.col("query_id")),
        )
        .select("query_id", F.col("_id").alias("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    queries_v = base.select(
        F.col("_id").alias("query_id"),
        F.col("_q").alias("_qq"),
        F.col("_n2").alias("_qn2"),
    )
    scored = (
        candidates.join(base, candidates.neighbor_id == base._id)
        .join(F.broadcast(queries_v), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_pre(
                F.col("_qq"), F.col("_q"), F.col("_qn2"), F.col("_n2")
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_planes: int = 6,
    n_tables: int = 2,
    dims: int = 64,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine — the fifth member of
    the dedup family (exact / minhash / simhash / ngram / embedding).

    Candidates share a hyperplane-LSH bucket in >= 1 of ``n_tables``
    tables (grouped-bucket generation — sketches computed once, no
    self-join), then exact quantized cosine filters at ``threshold``.
    Returns (id_a, id_b, sim) with id_a < id_b.
    """
    base = (
        spread(embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col)))
        .select("_id", quantize(F.col(vec_col)).alias("_q"))
        .withColumn("_n2", norm2_int(F.col("_q")))
    )
    buckets_col = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket(F.col("_q"), hyperplane_signs(n_planes, dims, t)).alias(
                    "bucket"
                ),
            )
            for t in range(n_tables)
        ]
    )
    banded = base.select("_id", F.explode(buckets_col).alias("bk")).select(
        "_id", "bk.tbl", "bk.bucket"
    )
    grouped = (
        banded.groupBy("tbl", "bucket")
        .agg(F.array_sort(F.collect_list("_id")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    pairs = (
        grouped.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "y -> struct(x AS id_a, y AS id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.join(
            base.select(
                F.col("_id").alias("id_a"),
                F.col("_q").alias("qa"),
                F.col("_n2").alias("na"),
            ),
            "id_a",
        )
        .join(
            base.select(
                F.col("_id").alias("id_b"),
                F.col("_q").alias("qb"),
                F.col("_n2").alias("nb"),
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            cosine_pre(F.col("qa"), F.col("qb"), F.col("na"), F.col("nb")).alias(
                "sim"
            ),
        )
        .where(F.col("sim") >= threshold)
    )


# --- IVF (inverted-file) ANN ---------------------------------------------

def quantized_centroids(base: DataFrame, label_col: str = "label") -> DataFrame:
    """Coarse-quantizer centroids on the integer grid.

    ``round(sum_i / count)`` per dimension, computed from exact integer
    sums — the rounded centroid is again an exact integer vector, so
    every later distance comparison is overflow-free integer math,
    order-independent and bit-identical in any engine.
    """
    exploded = base.select(
        F.col(label_col).alias("cid"), F.posexplode("_q").alias("dim", "qv")
    )
    per_dim = exploded.groupBy("cid", "dim").agg(
        F.round(F.sum("qv").cast("double") / F.count(F.lit(1)), 0)
        .cast("bigint")
        .alias("cv")
    )
    return per_dim.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cv"))), lambda s: s["cv"]
        ).alias("cvec")
    )


def dist2_int(a: Column, b: Column) -> Column:
    """Exact squared L2 distance between integer-grid vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def ivf_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 10,
    query_mod: int = 50,
    nprobe: int = 2,
) -> DataFrame:
    """IVF approximate top-k: the scale path for ANN.

    Build: vectors are assigned to their nearest coarse centroid (one
    small broadcast join — the inverted file). Search: each query scores
    only the lists of its ``nprobe`` nearest centroids, cutting scored
    pairs by ~n_lists/nprobe vs brute force. All distances are exact
    integer math on the quantized grid; ties break on centroid id /
    neighbor id, so results are total-ordered and oracle-reproducible.
    """
    base = (
        spread(
            embeddings.select(
                F.col(id_col).alias("_id"), F.col(label_col), F.col(vec_col)
            )
        )
        .select("_id", F.col(label_col), quantize(F.col(vec_col)).alias("_q"))
        .withColumn("_n2", norm2_int(F.col("_q")))
    )
    cents = quantized_centroids(base, label_col)

    scored_c = base.crossJoin(F.broadcast(cents)).select(
        "_id", "_q", "_n2", "cid", dist2_int(F.col("_q"), F.col("cvec")).alias("d2")
    )
    w_assign = Window.partitionBy("_id").orderBy("d2", "cid")
    assigned = (
        scored_c.withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("_id", F.col("cid").alias("list_id"), "_q", "_n2")
    )
    probes = (
        scored_c.where(F.col("_id") % query_mod == 0)
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") <= nprobe)
        .select(F.col("_id").alias("query_id"), F.col("cid").alias("list_id"),
                F.col("_q").alias("_qq"), F.col("_n2").alias("_qn2"))
    )
    scored = (
        assigned.join(F.broadcast(probes), "list_id")
        .where(F.col("_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("_id").alias("neighbor_id"),
            cosine_pre(
                F.col("_qq"), F.col("_q"), F.col("_qn2"), F.col("_n2")
            ).alias("sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def centroids_per_label(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Per-label centroid, one row per (label, dim): exact integer sums
    per dimension / count. posexplode + two-key groupBy — at scale this
    is a single shuffle keyed (label, dim), perfectly balanced."""
    q = quantize(F.col(vec_col))
    exploded = embeddings.select(
        F.col(label_col).alias("label"), F.posexplode(q).alias("dim", "qv")
    )
    return (
        exploded.groupBy("label", "dim")
        .agg(
            F.round(
                F.sum("qv").cast("double") / (F.count(F.lit(1)) * QUANT_SCALE),
                round_to,
            ).alias("centroid")
        )
    )
