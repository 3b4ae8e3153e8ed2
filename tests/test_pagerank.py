"""Integer-grid PageRank (operators/pagerank.py): hand-computed
updates, dangling-mass redistribution, mass conservation, and
structural sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.operators.pagerank import (
    PAGERANK_MICRO,
    pagerank,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


class TestPagerankSemantics:
    def test_one_update_matches_hand_computation(self, spark):
        # 1->2, 2->1, 3->{2,4}; node 4 is DANGLING (donates its whole
        # rank to the uniform pool). N=4, all start at 1_000_000.
        e = _edges(spark, [(1, 2), (2, 1), (3, 2), (3, 4)])
        got = {r.node: r.rank_micro for r in pagerank(e, n_iters=1).collect()}
        # dang = 1e6, dang div 4 = 250_000
        # new = (15e6 + 85 * (inflow + 250_000)) div 100
        assert got == {
            1: 1_212_500,  # inflow 1_000_000 (from 2)
            2: 1_637_500,  # inflow 1_500_000 (from 1, half of 3)
            3: 362_500,    # inflow 0
            4: 787_500,    # inflow 500_000 (half of 3)
        }
        # integer rounding lost nothing here: mass exactly conserved
        assert sum(got.values()) == 4 * PAGERANK_MICRO

    def test_mass_approximately_conserved_over_iterations(self, spark):
        e = _edges(
            spark,
            [(i, (i * 7) % 23) for i in range(23)] + [(5, 22), (9, 3)],
        )
        total_nodes = (
            e.select(F.col("src").alias("n"))
            .union(e.select(F.col("dst").alias("n")))
            .distinct()
            .count()
        )
        got = pagerank(e, n_iters=4).agg(F.sum("rank_micro")).collect()[0][0]
        # each hop truncates < 1 micro per (edge + node); 4 hops stay
        # within a loose absolute band of the invariant total
        assert abs(got - total_nodes * PAGERANK_MICRO) < 500 * 4

    def test_hub_outranks_spokes(self, spark):
        # star: 10 spokes -> hub, hub -> spoke 0 (no dangling hub)
        e = _edges(spark, [(i, 100) for i in range(10)] + [(100, 0)])
        got = {r.node: r.rank_micro for r in pagerank(e, n_iters=3).collect()}
        hub = got.pop(100)
        assert all(hub > v for v in got.values())

    def test_symmetric_cycle_is_uniform(self, spark):
        # a directed 4-cycle: perfect symmetry, every rank identical
        e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
        vals = {r.rank_micro for r in pagerank(e, n_iters=3).collect()}
        assert vals == {PAGERANK_MICRO}

    def test_symmetric_prepare_matches_general_path(self, spark):
        """``prepare_graph(symmetric=True)`` on a both-directions edge
        list must yield ranks bit-identical to the general path: the
        node set collapses to distinct(src) and the dangling structures
        are skipped, never computed — pure shuffle removal."""
        from personal_health_etl_pipeline_spark.operators.pagerank import (
            prepare_graph,
        )

        pairs = [(1, 2), (2, 3), (3, 4), (1, 4), (5, 2)]
        both = pairs + [(b, a) for a, b in pairs]
        e = _edges(spark, both)
        general = prepare_graph(e, dedup_edges=False)
        sym = prepare_graph(e, dedup_edges=False, symmetric=True)
        assert sym.n_nodes == general.n_nodes
        assert not sym.has_dangling and not general.has_dangling
        assert sym.dangling.count() == 0
        assert {r.node for r in sym.nodes.collect()} == {
            r.node for r in general.nodes.collect()
        }
        r_gen = {
            r.node: r.rank_micro
            for r in pagerank(
                e, n_iters=3, dedup_edges=False, prepared=general
            ).collect()
        }
        r_sym = {
            r.node: r.rank_micro
            for r in pagerank(
                e, n_iters=3, dedup_edges=False, prepared=sym
            ).collect()
        }
        assert r_sym == r_gen

    def test_no_cartesian_in_plan(self, spark, sf_dir):
        from personal_health_etl_pipeline_spark.plans.graph_surface import (
            graph_pagerank,
        )

        plan = (
            graph_pagerank(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the only nested-loop joins allowed are the 1-row broadcast
        # scalar ferries (dangling mass, node count)
        assert "CartesianProduct" not in plan

    def test_reliable_checkpoint_dir(self, spark, tmp_path):
        """With ``checkpoint_dir`` set, rounds truncate lineage via
        RELIABLE checkpoints (files under the dir) instead of
        localCheckpoint — the cluster-safe mode (executor loss cannot
        drop local-checkpoint blocks it depends on). Ranks must be
        bit-identical to the local mode, the process-global checkpoint
        location must be restored, and superseded per-round rank
        checkpoints must be deleted as the loop advances."""
        import glob as _glob

        sc = spark.sparkContext
        prior = sc._jsc.sc().getCheckpointDir()
        ckpt = str(tmp_path / "ckpt")
        e = _edges(spark, [(1, 2), (2, 1), (3, 2), (3, 4)])
        local = {r.node: r.rank_micro for r in pagerank(e, n_iters=3).collect()}
        reliable_df = pagerank(e, n_iters=3, checkpoint_dir=ckpt)
        reliable = {r.node: r.rank_micro for r in reliable_df.collect()}
        assert reliable == local
        rdd_dirs = _glob.glob(f"{ckpt}/**/rdd-*", recursive=True)
        assert rdd_dirs, "no reliable checkpoint files under checkpoint_dir"
        # graph structure (edges, outdeg, nodes, dangling) + final ranks
        # remain; the 2 superseded per-round rank checkpoints are gone
        assert len(rdd_dirs) == 5, rdd_dirs
        after = sc._jsc.sc().getCheckpointDir()
        assert after.isDefined() == prior.isDefined()
        if prior.isDefined():
            assert after.get() == prior.get()
        # the returned frame still materializes from what remains
        assert {
            r.node: r.rank_micro for r in reliable_df.collect()
        } == local
