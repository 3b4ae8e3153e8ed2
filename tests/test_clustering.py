"""K-means / semantic-dedup tests: determinism, Lloyd's improvement,
cluster recovery on separated data, and the pair contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.operators.clustering import (
    kmeans_assign,
    kmeans_assignments,
    kmeans_centroids,
    semantic_near_dup_pairs,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def separated(spark):
    """3 well-separated blobs of 30 vectors each (dim 8): blob g sits
    at 10*g on every axis with a tiny per-vector deterministic wiggle.

    Ids are INTERLEAVED across blobs (vec_id % 3 = blob) because init
    takes the k smallest ids: k-means recovery from clumped init is not
    guaranteed by Lloyd's — the operator documents that id order drives
    init quality."""
    rows = []
    for g in range(3):
        for i in range(30):
            vid = g + 3 * i
            vec = [
                1.0 + float(10 * g) + ((vid * (d + 3)) % 7) * 0.01
                for d in range(8)
            ]
            rows.append((vid, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestKMeans:
    def test_deterministic(self, emb):
        a = sorted(map(tuple, kmeans_assign(emb, k=8).collect()))
        b = sorted(map(tuple, kmeans_assign(emb, k=8).collect()))
        assert a == b

    def test_every_vector_assigned_once(self, emb):
        out = kmeans_assign(emb, k=8)
        n = emb.count()
        assert out.count() == n
        assert out.select("vec_id").distinct().count() == n
        cids = [r.cluster_id for r in out.select("cluster_id").distinct().collect()]
        assert all(0 <= c < 8 for c in cids)

    def test_updates_do_not_worsen_inertia(self, emb):
        i0 = kmeans_assign(emb, k=8, n_updates=0).agg(F.sum("d2")).first()[0]
        i2 = kmeans_assign(emb, k=8, n_updates=2).agg(F.sum("d2")).first()[0]
        assert i2 <= i0

    def test_recovers_separated_blobs(self, separated):
        out = kmeans_assign(separated, k=3, n_updates=3).collect()
        by_blob = {}
        for r in out:
            by_blob.setdefault(r.vec_id % 3, set()).add(r.cluster_id)
        # each blob maps to exactly one cluster, and the three differ
        assert all(len(cids) == 1 for cids in by_blob.values())
        assert len({next(iter(c)) for c in by_blob.values()}) == 3

    def test_persist_path_matches(self, emb):
        a = sorted(map(tuple, kmeans_assign(emb, k=4).collect()))
        assigned = kmeans_assignments(emb, k=4, persist=True)
        b = sorted(
            (r._id, r.cid, r.d2)
            for r in assigned.select("_id", "cid", "d2").collect()
        )
        assert a == b

    def test_persist_training_reads_cache_not_parquet(self, emb):
        """With the base persisted, every Lloyd-iteration plan (the
        assign+update aggregation `_centroids_from` runs per round)
        must read the in-memory relation — the source parquet is
        scanned once to fill the cache, never per iteration."""
        from personal_health_etl_pipeline_spark.operators.clustering import (
            _assign_lit,
            _quantized_base,
        )
        from personal_health_etl_pipeline_spark.operators.similarity import (
            quantized_centroids,
        )

        base = _quantized_base(emb, "vec_id", "embedding").persist()
        try:
            init = base.select("_id", "_q").orderBy("_id").limit(4).collect()
            cents = [(i, list(r._q)) for i, r in enumerate(init)]
            update = quantized_centroids(_assign_lit(base, cents), "cid")
            # every physical leaf must be the cache scan, not a file scan
            # (the InMemoryRelation's description embeds its cached child
            # plan text, so leaf node names are the reliable signal)
            leaves = update._jdf.queryExecution().sparkPlan().collectLeaves()
            names = [
                leaves.apply(i).nodeName() for i in range(leaves.size())
            ]
            assert names, "expected at least one leaf scan"
            assert all("InMemoryTableScan" in n for n in names), names
        finally:
            base.unpersist()

    def test_persist_releases_all_cached_storage(self, spark, emb):
        """The persist=True paths must not leak executor storage: the
        cache lives only across the training collects and is released
        before the result frame is returned (its execution recomputes
        from source — it never pins the cache).

        Asserted as a set-difference of persisted RDD ids (only ids
        CREATED by the calls under test may not survive them) — a plain
        before/after size equality flakes when the ContextCleaner
        releases an unrelated RDD persisted by an earlier test on the
        shared session mid-assertion."""
        jsc = spark.sparkContext._jsc

        def persisted_ids():
            return {k for k in jsc.getPersistentRDDs().keySet().toArray()}

        before = persisted_ids()
        kmeans_assign(emb, k=4, persist=True).collect()
        kmeans_centroids(emb, k=4, n_updates=1, persist=True).collect()
        semantic_near_dup_pairs(emb, k=4, persist=True).collect()
        leaked = persisted_ids() - before
        assert not leaked, f"persist paths leaked cached RDD ids: {sorted(leaked)}"


class TestKMeansIVF:
    def test_recall_floor_vs_brute_force(self, spark, sf_dir):
        """IVF over a LEARNED k-means quantizer must still find real
        neighbors: deterministic recall@10 vs exact brute force is
        0.83 at sf0.001 / 0.71 at sf0.01 with two Lloyd updates and
        nprobe=4 of 8 lists (the catalog configuration); gate at 0.7
        (all inputs fixed — no flake margin needed)."""
        from personal_health_etl_pipeline_spark.operators.similarity import (
            brute_force_topk,
            ivf_topk,
        )
        from personal_health_etl_pipeline_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        cents = kmeans_centroids(emb, k=8, n_updates=2, persist=True)
        bf = brute_force_topk(emb, k=10).select("query_id", "neighbor_id")
        iv = ivf_topk(emb, k=10, nprobe=4, centroids=cents).select(
            "query_id", "neighbor_id"
        )
        total = bf.count()
        hit = bf.intersect(iv).count()
        assert total > 0
        assert hit / total >= 0.7, f"IVF-kmeans recall too low: {hit}/{total}"


class TestSemanticDedup:
    def test_pair_contract(self, emb):
        pairs = semantic_near_dup_pairs(emb, k=8, threshold=0.4).collect()
        assert all(r.id_a < r.id_b for r in pairs)
        assert all(r.sim >= 0.4 for r in pairs)

    def test_pairs_share_a_cluster(self, emb):
        assigned = {
            r.vec_id: r.cluster_id for r in kmeans_assign(emb, k=8).collect()
        }
        pairs = semantic_near_dup_pairs(emb, k=8, threshold=0.4).collect()
        assert pairs, "expected at least one semantic near-dup pair"
        assert all(assigned[r.id_a] == assigned[r.id_b] for r in pairs)

    def test_finds_planted_near_dup(self, spark, separated):
        # plant an exact duplicate of vector 0 with a far-away id
        dup = separated.where(F.col("vec_id") == 0).select(
            F.lit(9999).cast("long").alias("vec_id"), "embedding"
        )
        pairs = semantic_near_dup_pairs(
            separated.unionByName(dup), k=3, n_updates=3, threshold=0.999
        ).collect()
        assert any(r.id_a == 0 and r.id_b == 9999 for r in pairs)

    def test_zero_vector_clusters_but_never_pairs(self, spark, separated):
        withz = separated.unionByName(
            spark.createDataFrame(
                [(5000, [0.0] * 8)], "vec_id long, embedding array<float>"
            )
        )
        assert kmeans_assign(withz, k=3).count() == separated.count() + 1
        pairs = semantic_near_dup_pairs(withz, k=3, threshold=0.0).collect()
        assert all(5000 not in (r.id_a, r.id_b) for r in pairs)

    def test_cluster_cap_bounds_degenerate_blob(self, spark):
        # 300 identical vectors -> one cluster; cap=16 must emit a chain
        # (O(N) pairs), never the all-pairs explosion
        same = spark.createDataFrame(
            [(i, [1.0] * 8) for i in range(300)],
            "vec_id long, embedding array<float>",
        )
        pairs = semantic_near_dup_pairs(
            same, k=2, n_updates=1, threshold=0.9, cluster_cap=16
        ).collect()
        assert len(pairs) < 300 * 2  # chain-ish, not ~300^2/2
        # connectivity preserved: the chain touches every vector
        touched = {r.id_a for r in pairs} | {r.id_b for r in pairs}
        assert len(touched) == 300
