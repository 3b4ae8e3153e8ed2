"""Connected-components / dedup-group resolution tests.

The iterative operator the dedup pipeline ends with: pair graph ->
component labels -> keeper per group. Pointer jumping must keep round
counts logarithmic even on path graphs (the shape capped LSH buckets
emit, dedup.pair_gen_sql).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.operators.graph import (
    ConvergenceError,
    connected_components,
    dedup_groups,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


class TestConnectedComponents:
    def test_two_components_and_singleton_absence(self, spark):
        # {1,2,3} via 1-2, 2-3; {10,11}; node 99 appears nowhere
        comp = {
            r.node: r.component
            for r in connected_components(
                _pairs(spark, [(1, 2), (2, 3), (10, 11)])
            ).collect()
        }
        assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_path_graph_converges_logarithmically(self, spark):
        # a 512-node chain: hash-min alone needs ~512 rounds; with
        # pointer jumping ~log2(512) + slack must suffice
        n = 512
        chain = _pairs(spark, [(i, i + 1) for i in range(n - 1)])
        comp = connected_components(chain, max_rounds=14, driver_cap=0).collect()
        assert len(comp) == n
        assert {r.component for r in comp} == {0}

    def test_100k_chain_logarithmic_rounds(self, spark):
        """The capped-LSH worst case at scale: a 100k-node path graph.
        Pointer jumping must resolve it within ~log2(n) + slack rounds
        (hash-min alone would need ~100k); built with spark.range so
        the driver never materializes the edge list."""
        from pyspark.sql import functions as F

        n = 100_000
        chain = spark.range(n - 1).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
        # log2(100k) ~ 17; +5 slack for propagate/jump interleave
        comp = connected_components(chain, max_rounds=22)
        agg = comp.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("component").alias("k"),
        ).first()
        assert agg.n == n and agg.k == 1

    def test_round_budget_raises(self, spark):
        chain = _pairs(spark, [(i, i + 1) for i in range(63)])
        with pytest.raises(ConvergenceError):
            connected_components(chain, max_rounds=1, driver_cap=0)

    def test_empty_pairs(self, spark):
        assert connected_components(_pairs(spark, [])).collect() == []

    def test_reliable_checkpoint_dir(self, spark, tmp_path):
        """With ``checkpoint_dir`` set, rounds truncate lineage via
        RELIABLE checkpoints (files under the dir) instead of
        localCheckpoint — the cluster-safe mode (executor loss cannot
        drop local-checkpoint blocks it depends on)."""
        ckpt = str(tmp_path / "ckpt")
        comp = {
            r.node: r.component
            for r in connected_components(
                _pairs(spark, [(1, 2), (2, 3), (10, 11)]),
                checkpoint_dir=ckpt,
                driver_cap=0,
            ).collect()
        }
        assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
        import glob as _glob

        assert _glob.glob(f"{ckpt}/**/rdd-*", recursive=True), (
            "no reliable checkpoint files written under checkpoint_dir"
        )

    def test_checkpoint_dir_restored_and_rounds_cleaned(self, spark, tmp_path):
        """setCheckpointDir is process-global: the operator must restore
        the prior location on return, and superseded per-round label
        checkpoints must be deleted as the loop advances — what survives
        is exactly the edge snapshot + final labels (which the returned
        frame reads), not one rdd dir per round."""
        import glob as _glob

        sc = spark.sparkContext
        prior = sc._jsc.sc().getCheckpointDir()
        ckpt = str(tmp_path / "ckpt")
        # a 64-node chain forces several pointer-jump rounds
        comp = connected_components(
            _pairs(spark, [(i, i + 1) for i in range(63)]),
            checkpoint_dir=ckpt,
            driver_cap=0,
        )
        after = sc._jsc.sc().getCheckpointDir()
        assert after.isDefined() == prior.isDefined()
        if prior.isDefined():
            assert after.get() == prior.get()
        # edges + final labels remain; per-round checkpoints are gone
        rdd_dirs = _glob.glob(f"{ckpt}/**/rdd-*", recursive=True)
        assert len(rdd_dirs) == 2, rdd_dirs
        # ...and the returned frame still materializes from them
        assert {r.component for r in comp.collect()} == {0}

    def test_driver_gate_matches_distributed_loop(self, spark):
        """The measured-size-gated driver union-find must label exactly
        like the iterative loop: same (node, min-id component) rows on a
        graph with chains, a cycle, self-loops, duplicate and reversed
        edges, and multiple components."""
        edges = (
            [(i, i + 1) for i in range(40)]          # chain
            + [(100, 101), (101, 102), (102, 100)]   # cycle
            + [(200, 200), (300, 301), (301, 300)]   # self-loop, reversed
            + [(7, 3), (3, 7), (500, 400)]           # dup directions
        )
        frame = _pairs(spark, edges)
        gated = sorted(
            map(tuple, connected_components(frame).collect())
        )
        loop = sorted(
            map(tuple, connected_components(frame, driver_cap=0).collect())
        )
        assert gated == loop

    def test_direction_and_order_invariance(self, spark):
        a = connected_components(_pairs(spark, [(5, 9), (2, 9), (7, 2)]))
        b = connected_components(_pairs(spark, [(9, 5), (7, 2), (9, 2)]))
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_null_endpoints_take_the_loop_not_a_driver_crash(self, spark):
        """Parquet-sourced id columns are nullable even when clean; a
        DATA null must not TypeError inside the driver union-find's
        Python comparisons — the gate routes dirty edge lists to the
        distributed loop, which degrades gracefully (ADVICE-r15)."""
        frame = spark.createDataFrame(
            [(1, 2), (2, 3), (None, 5), (6, None)],
            "id_a long, id_b long",
        )
        gated = connected_components(frame)  # default cap: gate eligible
        loop = connected_components(frame, driver_cap=0)
        assert sorted(map(tuple, gated.collect())) == sorted(
            map(tuple, loop.collect())
        )


class TestDedupGroups:
    def test_keeper_and_sizes(self, spark):
        out = {
            r.doc_id: r
            for r in dedup_groups(
                _pairs(spark, [(4, 2), (2, 8), (30, 31)])
            ).collect()
        }
        assert len(out) == 5
        assert out[2].group_id == 2 and out[2].is_keeper
        assert out[4].group_id == 2 and not out[4].is_keeper
        assert out[8].group_size == 3
        assert out[30].is_keeper and out[31].group_size == 2

    def test_checkpoint_dir_forwarded(self, spark, tmp_path):
        """dedup_groups must run with reliable checkpoints without the
        caller dropping to the raw connected_components operator."""
        import glob as _glob

        ckpt = str(tmp_path / "ckpt")
        out = {
            r.doc_id: r
            for r in dedup_groups(
                _pairs(spark, [(4, 2), (2, 8), (30, 31)]),
                checkpoint_dir=ckpt,
            ).collect()
        }
        assert out[2].is_keeper and out[8].group_size == 3
        assert _glob.glob(f"{ckpt}/**/rdd-*", recursive=True)

    def test_degenerate_chain_resolves_to_one_group(self, spark):
        """The capped-LSH chain output for 2000 identical docs must
        resolve to a single keep-one group."""
        from personal_health_etl_pipeline_spark.operators.dedup import (
            minhash_lsh_pairs,
        )

        docs = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            F.lit("the same exact document body repeated everywhere").alias(
                "text"
            ),
        )
        pairs = minhash_lsh_pairs(docs, "doc_id", "text", bucket_cap=64)
        groups = dedup_groups(pairs).collect()
        assert len(groups) == 2000
        assert all(r.group_id == 0 for r in groups)
        assert sum(r.is_keeper for r in groups) == 1
        assert groups[0].group_size == 2000


class TestTriangleCounts:
    def test_k4_every_node_in_three_triangles(self, spark):
        from personal_health_etl_pipeline_spark.operators.graph import (
            triangle_counts,
        )

        k4 = _pairs(
            spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
        )
        got = {r.node: r.n_triangles for r in triangle_counts(k4).collect()}
        # K4 has C(4,3)=4 triangles; each node sits in C(3,2)=3 of them
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_triangle_free_graph_is_empty(self, spark):
        from personal_health_etl_pipeline_spark.operators.graph import (
            triangle_counts,
        )

        path = _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
        assert triangle_counts(path).count() == 0
        star = _pairs(spark, [(0, i) for i in range(1, 6)])
        assert triangle_counts(star).count() == 0

    def test_direction_and_duplicate_invariance(self, spark):
        from personal_health_etl_pipeline_spark.operators.graph import (
            triangle_counts,
        )

        a = triangle_counts(_pairs(spark, [(1, 2), (2, 3), (1, 3)]))
        b = triangle_counts(
            _pairs(spark, [(2, 1), (3, 2), (1, 3), (1, 2), (3, 1)])
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        assert a.count() == 3  # one triangle, three corners

    def test_hub_skew_wedges_come_from_oriented_outlist(self, spark):
        """The orientation property on a skewed graph: a hub joined to
        every spoke plus one spoke-spoke edge — triangles found, and
        the plan contains only equi-joins (no cartesian/BNLJ)."""
        from personal_health_etl_pipeline_spark.operators.graph import (
            triangle_counts,
        )

        hub = _pairs(
            spark, [(0, i) for i in range(1, 30)] + [(1, 2), (5, 6)]
        )
        df = triangle_counts(hub)
        got = {r.node: r.n_triangles for r in df.collect()}
        assert got == {0: 2, 1: 1, 2: 1, 5: 1, 6: 1}
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestBfsHops:
    def test_min_distance_and_unreached_excluded(self, spark):
        from personal_health_etl_pipeline_spark.operators.graph import bfs_hops

        # directed: 1->2->3->4->5 chain plus shortcut 1->4; island 99
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4), (98, 99)],
            "src long, dst long",
        )
        seeds = spark.createDataFrame([(1,)], "node long")
        got = {
            r.node: r.dist
            for r in bfs_hops(edges, seeds, max_hops=3).collect()
        }
        # 4 is reached at dist 1 via the shortcut, NOT dist 3; 5 at 2;
        # the island never appears
        assert got == {1: 0, 2: 1, 3: 2, 4: 1, 5: 2}

    def test_frontier_short_circuits_on_saturation(self, spark):
        from personal_health_etl_pipeline_spark.operators.graph import bfs_hops

        edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
        seeds = spark.createDataFrame([(1,)], "node long")
        # max_hops far beyond the graph diameter: loop must stop early
        got = {
            r.node: r.dist
            for r in bfs_hops(edges, seeds, max_hops=50).collect()
        }
        assert got == {1: 0, 2: 1}


class TestSsspBounded:
    def test_cheaper_long_path_beats_short_expensive_edge(self, spark):
        from personal_health_etl_pipeline_spark.operators.graph import (
            sssp_bounded,
        )

        # 1->4 direct costs 10; 1->2->3->4 costs 3. Within 3 rounds the
        # long cheap path must win; within 1 round only the direct edge
        # exists.
        edges = spark.createDataFrame(
            [(1, 2, 1), (2, 3, 1), (3, 4, 1), (1, 4, 10), (98, 99, 1)],
            "src long, dst long, w long",
        )
        seeds = spark.createDataFrame([(1,)], "node long")
        got3 = {
            r.node: r.dist
            for r in sssp_bounded(edges, seeds, max_rounds=3).collect()
        }
        assert got3 == {1: 0, 2: 1, 3: 2, 4: 3}
        got1 = {
            r.node: r.dist
            for r in sssp_bounded(edges, seeds, max_rounds=1).collect()
        }
        assert got1 == {1: 0, 2: 1, 4: 10}

    def test_matches_python_bellman_ford(self, spark):
        """Deterministic pseudo-random graph vs a reference Python
        Bellman-Ford bounded at the same number of rounds."""
        from personal_health_etl_pipeline_spark.operators.graph import (
            sssp_bounded,
        )

        n, rounds = 40, 3
        es = []
        for i in range(n):
            for j in ((i * 7 + 3) % n, (i * 13 + 5) % n):
                if i != j:
                    es.append((i, j, (i + j) % 5 + 1))
        seeds_py = [0, 17]
        dist = {s: 0 for s in seeds_py}
        for _ in range(rounds):
            new = dict(dist)
            for s, d, w in es:
                if s in dist and dist[s] + w < new.get(d, float("inf")):
                    new[d] = min(new.get(d, float("inf")), dist[s] + w)
            dist = new
        edges = spark.createDataFrame(es, "src long, dst long, w long")
        seeds = spark.createDataFrame(
            [(s,) for s in seeds_py], "node long"
        )
        got = {
            r.node: r.dist
            for r in sssp_bounded(edges, seeds, max_rounds=rounds).collect()
        }
        assert got == dist


class TestLabelPropagationSync:
    def test_two_rounds_match_hand_computation(self, spark):
        """Two triangles bridged by one edge; the synchronous rounds
        with min-label tie-break are hand-computed. Round 1: 1->2,
        2->1, 3->1, 4->3, 5->4, 6->4. Round 2: 1->1, 2->1, 3->1,
        4->4, 5->3, 6->3 — determinism of the tie order IS the
        assertion."""
        from personal_health_etl_pipeline_spark.operators.graph import (
            label_propagation_sync,
        )

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
            "src long, dst long",
        )
        got1 = {
            r.node: r.label
            for r in label_propagation_sync(edges, n_rounds=1).collect()
        }
        assert got1 == {1: 2, 2: 1, 3: 1, 4: 3, 5: 4, 6: 4}
        got2 = {
            r.node: r.label
            for r in label_propagation_sync(edges, n_rounds=2).collect()
        }
        assert got2 == {1: 1, 2: 1, 3: 1, 4: 4, 5: 3, 6: 3}
