"""Physical-plan quality gates: the 100 TB contract, asserted.

Correctness tests prove the operators compute the right rows; these
prove Catalyst is *executing them the way the scale design requires* —
filters reaching the scan, projections pruned, bounded dims broadcast,
bucketed joins exchange-free, salted joins scattering hot keys.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.operators.skew import salted_join
from personal_health_etl_pipeline_spark.plans.temporal_surface import (
    j4_asof_last_click,
    j5_views_before_purchase,
)
from personal_health_etl_pipeline_spark.plans.tpch import (
    q5_region_volume,
    q6_revenue_delta,
)
from personal_health_etl_pipeline_spark.plans.tpch2 import (
    q11_important_parts,
    q19_disjunctive_revenue,
)
from personal_health_etl_pipeline_spark.sources.bucketed import (
    read_table,
    write_bucketed,
)


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return df._jdf.queryExecution().explainString(mode.fromString("formatted"))


class TestPushdownAndPruning:
    def test_q6_filters_reach_scan_and_schema_pruned(self, spark, sf_dir):
        plan = _formatted(q6_revenue_delta(spark, sf_dir))
        assert "PushedFilters: [" in plan
        assert "GreaterThanOrEqual(l_shipdate" in plan
        # 11-column table, 4-column query: the scan must not read the rest
        read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
        assert read_schema.count(":") - 1 <= 5  # schema has <= 4 fields

    def test_broadcast_hint_survives_to_physical_plan(self, spark, sf_dir):
        plan = _executed_plan(q5_region_volume(spark, sf_dir))
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


class TestScalarSubqueryAndDisjunction:
    def test_q11_threshold_is_broadcast_not_shuffled(self, spark, sf_dir):
        # the 1-row global total must cross in as a broadcast; the
        # per-part aggregate must NOT re-shuffle against it
        plan = _executed_plan(q11_important_parts(spark, sf_dir))
        assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan

    def test_q19_shared_conjuncts_pushed_to_scans(self, spark, sf_dir):
        plan = _formatted(q19_disjunctive_revenue(spark, sf_dir))
        # quantity window prunes the lineitem scan, size window the part scan
        assert "GreaterThanOrEqual(l_quantity,1" in plan
        assert "LessThanOrEqual(l_quantity,30" in plan
        assert "GreaterThanOrEqual(p_size,1" in plan


class TestTemporalJoinPlans:
    def test_asof_join_is_single_shuffle_no_nlj(self, spark, sf_dir):
        plan = _executed_plan(j4_asof_last_click(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        # union + keyed window: the only wide op is hash partitioning
        # on the join key (plus the final presentation sort)
        assert plan.count("Exchange hashpartitioning") <= 1
        assert "Window" in plan

    def test_range_join_is_equi_join_no_nlj(self, spark, sf_dir):
        plan = _executed_plan(j5_views_before_purchase(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        # the band predicate must have become an equi-join (hash or
        # sort-merge) on (user_id, bucket)
        assert (
            "BroadcastHashJoin" in plan
            or "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan
        )


class TestBucketedJoin:
    def test_bucketed_equi_join_has_no_exchange(self, spark, sf_dir):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4)
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem",
            "o_orderkey",
            n_buckets=4,
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = read_table(spark, "b_orders").join(
                read_table(spark, "b_lineitem"), "o_orderkey"
            )
            joined.collect()
            plan = _executed_plan(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # co-located: zero shuffles
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_bucketed_roundtrip_values(self, spark, sf_dir):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        write_bucketed(orders, "b_orders_rt", "o_orderkey", n_buckets=4)
        back = read_table(spark, "b_orders_rt")
        assert back.count() == orders.count()
        assert back.agg(F.sum("o_orderkey")).first()[0] == orders.agg(
            F.sum("o_orderkey")
        ).first()[0]


class TestSaltedJoin:
    @pytest.fixture()
    def skewed(self, spark):
        # 90% of fact rows share key 0 — the classic hot key
        fact = spark.range(0, 10_000).select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(0, 1_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("dim_val")
        )
        return fact, dim

    def test_matches_plain_join(self, spark, skewed):
        fact, dim = skewed
        plain = fact.join(dim, "k").groupBy("k").count()
        salted = salted_join(fact, dim, "k").groupBy("k").count()
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, plain.collect())
        )

    def test_hot_key_scatters_across_salt_buckets(self, spark, skewed):
        fact, _ = skewed
        from personal_health_etl_pipeline_spark.operators.skew import SALT_COL

        salted = fact.withColumn(
            SALT_COL, F.pmod(F.xxhash64(*fact.columns), F.lit(8)).cast("int")
        )
        spread_counts = (
            salted.where(F.col("k") == 0)
            .groupBy(SALT_COL)
            .count()
            .collect()
        )
        assert len(spread_counts) == 8  # hot key occupies every bucket
        sizes = [r["count"] for r in spread_counts]
        assert max(sizes) < sum(sizes) * 0.5  # no single-bucket collapse

    def test_left_join_preserves_unmatched(self, spark, skewed):
        fact, dim = skewed
        only_small_dim = dim.where(F.col("k") < 5)
        out = salted_join(fact, only_small_dim, "k", how="left_outer")
        assert out.count() == fact.count()
        assert out.where(F.col("dim_val").isNull()).count() > 0


class TestCurationPlanShape:
    """Plan gates for the corpus-curation / sketch / streaming-enrich
    operators: the joins that must broadcast do, and the single-scan
    ops stay single-scan."""

    def test_decontaminate_broadcasts_eval_side(self, spark, sf_dir):
        from personal_health_etl_pipeline_spark.plans.llm_surface2 import (
            decontaminate_ngram,
        )

        plan = _executed_plan(decontaminate_ngram(spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan  # corpus side must never shuffle-join

    def test_enrich_static_is_broadcast_no_state(self, spark, sf_dir):
        from personal_health_etl_pipeline_spark.plans.streaming_surface import (
            st_enrich_static,
        )

        plan = _executed_plan(st_enrich_static(spark, sf_dir))
        assert "BroadcastHashJoin" in plan

    def test_sample_and_shard_are_single_scan_partial_agg(self, spark, sf_dir):
        from personal_health_etl_pipeline_spark.plans.llm_surface2 import (
            corpus_sample_stratified,
            corpus_shard_plan,
        )

        for fn in (corpus_sample_stratified, corpus_shard_plan):
            plan = _executed_plan(fn(spark, sf_dir))
            # one scan, no join, and a partial aggregate before the exchange
            assert plan.count("FileScan parquet") == 1, fn.__name__
            assert "Join" not in plan, fn.__name__
            assert "partial" in plan.lower(), fn.__name__

    def test_random_projection_is_pure_map(self, spark, sf_dir):
        from personal_health_etl_pipeline_spark.plans.sketches import (
            emb_random_projection,
        )

        plan = _executed_plan(
            emb_random_projection(spark, sf_dir).drop("projected").limit(1)
        )
        assert "Join" not in plan

    def test_lsh_single_shuffle_before_topk(self, spark, sf_dir):
        """The carry-payload LSH pipelines: no join back to the vector
        table — bucket groupBy is the only wide transform before the
        per-query window."""
        from personal_health_etl_pipeline_spark.operators.similarity import (
            embedding_near_dup_pairs,
        )
        from personal_health_etl_pipeline_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        plan = _executed_plan(embedding_near_dup_pairs(emb))
        assert "Join" not in plan  # pairs are scored inline from bucket lists


class TestStreamingSinkProbe:
    def test_conflict_probe_broadcasts_batch_not_sink(self, spark, sf_dir):
        """The sink side grows without bound, so the batch keys must be
        the broadcast (build) side of the existing-vs-batch semi-join."""
        from personal_health_etl_pipeline_spark.streaming.sink import clash_probe
        from personal_health_etl_pipeline_spark.sources.tables import load_table

        existing = load_table(spark, sf_dir, "events")
        batch = existing.limit(10)
        plan = _executed_plan(clash_probe(existing, batch, "event_id"))
        assert "BroadcastHashJoin" in plan
        # LeftSemi with BuildRight: the right (batch-keys) side is built
        assert "BuildRight" in plan
        # tree prints left subtree first: the sink FileScan must appear
        # before the BroadcastExchange that wraps the batch keys
        assert plan.index("FileScan") < plan.index("BroadcastExchange")


class TestCappedDedupPlans:
    def test_minhash_capped_path_no_blowup_joins(self, spark, sf_dir):
        """The capped pair path must stay grouped-bucket shaped: no
        nested-loop/cartesian join anywhere, and the only joins are the
        two broadcast verification probes."""
        from personal_health_etl_pipeline_spark.operators.dedup import (
            minhash_lsh_pairs,
        )
        from personal_health_etl_pipeline_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        plan = _executed_plan(minhash_lsh_pairs(docs, "doc_id", "text"))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert plan.count("SortMergeJoin") == 0  # verify joins broadcast
    def test_ngram_capped_hot_list_broadcasts(self, spark, sf_dir):
        from personal_health_etl_pipeline_spark.operators.dedup import (
            ngram_jaccard_pairs,
        )
        from personal_health_etl_pipeline_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        # max_broadcast_rows=None keeps the candidate lineage in ONE
        # plan (the gated default localCheckpoints the candidates, so
        # their pipeline executes eagerly and leaves the returned plan)
        plan = _executed_plan(
            ngram_jaccard_pairs(
                docs, "doc_id", "text", max_df=50, max_broadcast_rows=None
            )
        )
        # the hot-shingle drop list rides in as a broadcast anti-join
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
        assert "CartesianProduct" not in plan

    def test_verify_broadcast_gate_both_sides(self, spark):
        """VERDICT-r10 item 3: the verify-join broadcast is gated on
        the MEASURED candidate count. On a planted extreme-dup-rate
        corpus (every doc in one of many near-identical clusters) the
        same pipeline must (a) broadcast when the gate admits the
        candidates, (b) degrade to shuffle joins when it does not, and
        (c) return identical pairs either way."""
        from personal_health_etl_pipeline_spark.operators.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
        )

        # 120 clusters x 3 near-identical members -> every doc pairs
        # with its cluster twins: a high-dup-rate corpus in miniature
        docs = spark.range(360).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("cluster "),
                (F.col("id") / 3).cast("int").cast("string"),
                F.lit(" shared body of text repeated across the"
                      " cluster members with tail "),
                (F.col("id") / 3).cast("int").cast("string"),
            ).alias("text"),
        )
        # threshold -1 for BOTH runs isolates the HINT (the sql7 gate-3
        # principle: a broadcast hint survives a disabled threshold, a
        # size-based choice does not) — otherwise the planner broadcasts
        # this tiny planted corpus on its own merits either way
        old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            for fn, kw in (
                (minhash_lsh_pairs, {}),
                (ngram_jaccard_pairs, {"max_df": 64}),
            ):
                hinted = fn(
                    docs, "doc_id", "text", threshold=0.5,
                    max_broadcast_rows=1_000_000, **kw
                )
                gated_off = fn(
                    docs, "doc_id", "text", threshold=0.5,
                    max_broadcast_rows=0, **kw
                )
                p_on = _executed_plan(hinted)
                p_off = _executed_plan(gated_off)
                assert "BroadcastHashJoin" in p_on, p_on
                assert "BroadcastHashJoin" not in p_off, p_off
                assert (
                    "SortMergeJoin" in p_off or "ShuffledHashJoin" in p_off
                ), p_off
                rows_on = {
                    (r.id_a, r.id_b, r.jaccard_sim)
                    for r in hinted.collect()
                }
                rows_off = {
                    (r.id_a, r.id_b, r.jaccard_sim)
                    for r in gated_off.collect()
                }
                assert rows_on == rows_off and rows_on, fn.__name__
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)


class TestPQJoinShapes:
    """The no-BNLJ gates above deliberately EXEMPT pq_topk: its ADC
    scan is a broadcast non-equi join (codes x queries) by design —
    O(N x Q), acceptable only with a bounded external query table
    (`queries=` parameter) or at correctness-baseline scale. IVF-PQ is
    the scale path and must stay equi-join shaped."""

    def test_pq_adc_scan_is_the_documented_bnlj(self, spark, sf_dir):
        from personal_health_etl_pipeline_spark.operators.similarity import (
            pq_topk,
        )
        from personal_health_etl_pipeline_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        plan = _executed_plan(pq_topk(emb, k=5))
        # the exemption made explicit: if this ever stops being a BNLJ
        # the docstring + this test should change together
        assert "BroadcastNestedLoopJoin" in plan

    def test_pq_external_broadcast_side_is_the_bounded_frame(
        self, spark, sf_dir
    ):
        """The certified production entry (r6: probes the session-
        persisted index): the ADC scan's broadcast build side must BE
        the bounded query frame, not anything that grows with the
        corpus. The probe eagerly checkpoints the PQ_EXT_QUERIES-row
        frame before the join, so in the executed plan the broadcast
        input is a checkpoint scan — bounded by construction — and the
        output must contain at most that many distinct queries."""
        from personal_health_etl_pipeline_spark.plans.llm_surface import (
            PQ_EXT_QUERIES,
            ann_pq_external_topk,
        )

        df = ann_pq_external_topk(spark, sf_dir)
        rows = df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        # the ADC BNLJ itself ran behind the shortlist checkpoint (its
        # shape is gated on pq_topk in test_pq_adc_scan_is_the_
        # documented_bnlj); what the final phase must prove is the
        # survivor fetch: the bounded shortlist/query frames broadcast
        # against the vectors table — the corpus side never shuffles
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        # checkpointed bounded frames are the broadcast inputs
        assert "Scan ExistingRDD" in plan, plan
        assert len({r.query_id for r in rows}) <= PQ_EXT_QUERIES

    def test_ivfpq_probe_join_is_equi_no_bnlj(self, spark, sf_dir):
        """IVF-PQ's only BNLJs are the 1-row scalar crossJoins that
        attach the collected centroid/codebook arrays (corpus-size-
        independent build side); the candidate-generating probe join
        itself must be a hash equi-join on list_id."""
        from personal_health_etl_pipeline_spark.operators.similarity import (
            ivfpq_topk,
        )
        from personal_health_etl_pipeline_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        plan = _executed_plan(ivfpq_topk(emb, k=5))
        assert "CartesianProduct" not in plan
        # the probe equi-join survives to the physical plan
        assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or (
            "ShuffledHashJoin" in plan
        )
        # only 1-row array attachments may be BNLJ: the coarse-centroid
        # set and the sampled residual codebook (each on both the data
        # and the query side) — all corpus-size-independent build
        # sides. The printed tree duplicates the shared 1-row codebook
        # lineage under each consumer, so the textual count exceeds
        # the number of distinct attachments.
        assert plan.count("BroadcastNestedLoopJoin") <= 8


class TestChunkingPlanShape:
    def test_chunking_is_map_only_no_exchange(self, spark, sf_dir):
        """Chunking must stay scan -> project -> generate: per-doc
        windows need no co-location, so ANY exchange in this plan is a
        regression (the spread() no-op at this input size included)."""
        from personal_health_etl_pipeline_spark.plans.llm_surface2 import (
            corpus_chunk_documents,
        )

        df = corpus_chunk_documents(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "Exchange" not in plan, plan
        assert "Generate explode" in plan  # the window-start explode


class TestRound4BatchPlanShapes:
    """Physical-plan gates for the round-4 second-half operators."""

    def test_scd2_merge_reuses_one_key_partitioning(self, spark, sf_dir):
        """All scd2 joins key on cust_id; with AQE the small update batch
        broadcasts, so the dimension itself is never exchanged more than
        once per consumed branch and never nested-loop joined."""
        from personal_health_etl_pipeline_spark.plans.cdc_surface import (
            m1_scd2_merge,
        )

        plan = _executed_plan(m1_scd2_merge(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_pit_join_is_single_equi_join(self, spark, sf_dir):
        """The interval predicate must ride the cust_id equi-join as a
        post-join filter or join condition — no range-join explosion,
        no BNLJ."""
        from personal_health_etl_pipeline_spark.plans.cdc_surface import (
            j11_pit_feature_join,
        )

        plan = _executed_plan(j11_pit_feature_join(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_decile_assignment_is_map_side(self, spark, sf_dir):
        """Bucket assignment = scan -> broadcast-attach cuts -> project;
        the only exchange above the orders scan is the final bucket
        groupBy. The cuts subtree (1024-row sample) may exchange."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            a14_decile_buckets,
        )

        plan = _executed_plan(a14_decile_buckets(spark, sf_dir))
        # one BNLJ: the 1-row cuts array attachment — same exemption
        # class as the centroid/codebook attachments
        assert plan.count("BroadcastNestedLoopJoin") <= 1
        assert "CartesianProduct" not in plan

    def test_gap_fill_join_and_window_share_partitioning(self, spark, sf_dir):
        """ts1: the calendar left-join on (user_id, day) and the fill
        window on user_id must not stack redundant exchanges — at most
        the daily agg, the per-user span agg, the join alignment and
        AQE reads."""
        from personal_health_etl_pipeline_spark.plans.temporal_surface import (
            ts1_gap_fill_ffill,
        )

        plan = _executed_plan(ts1_gap_fill_ffill(spark, sf_dir))
        import re

        n_ex = len(re.findall(r"\bExchange hashpartitioning", plan))
        assert n_ex <= 4, f"{n_ex} hash exchanges:\n{plan}"

    def test_covariance_partials_shuffle_is_bounded(self, spark, sf_dir):
        """emb_covariance: the only wide shuffle merges (i, j, v)
        partials — corpus-size-independent. The embeddings scan itself
        must not be exchanged before mapInPandas."""
        from personal_health_etl_pipeline_spark.plans.sketches import (
            emb_covariance,
        )

        df = emb_covariance(spark, sf_dir)
        plan = _executed_plan(df)
        # the cached partial lineage: scan -> project -> Arrow partials
        # -> partial/final HashAggregate; rows reach MapInPandas without
        # a shuffle (each MapInPandas is fed directly by its scan)
        assert "MapInPandas" in plan
        assert "HashAggregate" in plan
        for seg in plan.split("MapInPandas")[1:]:
            below = seg.split("InMemoryRelation")[0]
            assert "Exchange hashpartitioning" not in below.split("+- FileScan")[0], below
        # the strong scans-once property is asserted in
        # tests/test_linalg.py::test_covariance_scans_source_once


class TestRound5PlanShapes:
    """Physical-plan gates for the round-5 additions."""

    def test_substring_cut_no_pair_or_nested_loop_joins(self, spark, sf_dir):
        """The apply path (windows -> keeper -> cut positions -> token
        anti-join -> reassembly) must stay equi-join shaped: no
        cartesian, no BNLJ — boilerplate skew degrades linearly."""
        from personal_health_etl_pipeline_spark.plans.llm_surface3 import (
            dedup_substring_cut,
        )

        plan = _executed_plan(dedup_substring_cut(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_bpe_apply_join_is_equi_shaped(self, spark, sf_dir):
        """Corpus explode joined against the vocabulary-sized segment
        table: an equi-join (AQE may broadcast the vocab side), never a
        nested loop."""
        from personal_health_etl_pipeline_spark.plans.llm_surface3 import (
            text_bpe_apply_corpus,
        )

        plan = _executed_plan(text_bpe_apply_corpus(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_zorder_audit_z_is_pure_map_over_readback(self, spark, sf_dir):
        """The read-back audit recomputes z as a projection: the only
        exchange above the bucket scan is the per-bucket groupBy (plus
        the final sort) — the z interleave itself must not shuffle."""
        import re

        from personal_health_etl_pipeline_spark.plans.audit_surface import (
            layout_zorder_audit,
        )

        plan = _executed_plan(layout_zorder_audit(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # 2 = the per-bucket groupBy's two phases (countDistinct(_file)
        # expands to a (bucket, file) pre-aggregate); the z interleave
        # itself rides the scan projection
        n_ex = len(re.findall(r"\bExchange hashpartitioning", plan))
        assert n_ex <= 2, f"{n_ex} hash exchanges:\n{plan}"

    def test_scd2_upsert_final_state_reads_plain_parquet(self, spark, sf_dir):
        """The returned history is the committed current version: a
        plain parquet scan + sort, no residual streaming nodes or
        joins (the merge work happened inside the micro-batches)."""
        from personal_health_etl_pipeline_spark.plans.audit_surface import (
            st_scd2_upsert_state,
        )

        plan = _executed_plan(st_scd2_upsert_state(spark, sf_dir))
        assert "FileScan parquet" in plan
        for node in ("CartesianProduct", "BroadcastNestedLoopJoin", "Join"):
            assert node not in plan

    def test_ivf_external_probe_prunes_index_partitions(self, spark, sf_dir):
        """The persisted-index probe must reach the scan as a partition
        filter on list_id (only probed lists read) with the bounded
        query frame on the broadcast side — no cartesian/BNLJ."""
        from personal_health_etl_pipeline_spark.plans.llm_surface import (
            ann_ivf_external_lookup,
        )

        plan = _executed_plan(ann_ivf_external_lookup(spark, sf_dir))
        assert "CartesianProduct" not in plan
        seg = plan.split("PartitionFilters", 1)
        assert len(seg) == 2 and "list_id" in seg[1][:160], plan
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    def test_pq_persisted_probe_reads_codes_only_then_pruned_vectors(
        self, spark, sf_dir
    ):
        """ann_pq_persisted_probe: the ADC scan can only ever read the
        8-byte code column because the persisted codes table PHYSICALLY
        carries nothing else (never the 64-dim vectors — that asymmetry
        is PQ's entire memory story), and the exact re-rank's vectors
        read must reach the scan as a bucket partition filter. No
        cartesian product (the non-equi ADC join rides a bounded
        broadcast). The ADC phase itself runs eagerly inside the entry
        (the shortlist is checkpointed for the bucket prune), so the
        returned frame's plan is the re-rank read."""
        import os

        from personal_health_etl_pipeline_spark.plans.llm_surface import (
            _pq_index_root,
            ann_pq_persisted_probe,
        )

        plan = _executed_plan(ann_pq_persisted_probe(spark, sf_dir))
        assert "CartesianProduct" not in plan
        seg = plan.split("PartitionFilters", 1)
        assert len(seg) == 2 and "bucket" in seg[1][:160], plan
        # structural codes-only guarantee: the ADC-scanned table holds
        # exactly (_id, codes)
        root, _ = _pq_index_root(spark, sf_dir)
        codes_cols = spark.read.parquet(os.path.join(root, "codes")).columns
        assert codes_cols == ["_id", "codes"], codes_cols


class TestRound5SecondHalfPlanShapes:
    def test_association_rules_no_nested_loop(self, spark, sf_dir):
        """Basket pair explode is a self-equi-join on the order key +
        bounded count joins — never a cartesian/BNLJ."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            a17_association_rules,
        )

        plan = _executed_plan(a17_association_rules(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # top-k by lift must be a bounded heap, not a global sort
        assert "TakeOrderedAndProject" in plan

    def test_referential_integrity_joins_distinct_keys_only(
        self, spark, sf_dir
    ):
        """dq5: fact tables must aggregate to distinct-key frames BEFORE
        any parent join — the scan side of every join is an aggregate,
        and nothing nested-loops."""
        from personal_health_etl_pipeline_spark.plans.quality_surface import (
            dq5_referential_integrity,
        )

        plan = _executed_plan(dq5_referential_integrity(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_triangles_all_equi_joins(self, spark, sf_dir):
        from personal_health_etl_pipeline_spark.plans.graph_surface import (
            graph_triangles,
        )

        plan = _executed_plan(graph_triangles(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_aqe_skew_join_splits_hot_partition(self, spark):
        """The engine's third skew tool (after salting and capped
        buckets): AQE's runtime skew-join split. A 'skew=true' marker
        on the sort-merge join proves the session config actually
        engages — the hot key's oversized shuffle partition is split
        into parallel sub-reads instead of serializing on one task."""
        from pyspark.sql import functions as F

        conf = {
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
        }
        old = {k: spark.conf.get(k, None) for k in conf}
        try:
            for k, v in conf.items():
                spark.conf.set(k, v)
            # 95% of fact rows share key 0; dim is uniform
            fact = spark.range(0, 200_000).select(
                F.when(F.col("id") % 20 != 0, 0)
                .otherwise(F.col("id"))
                .alias("k"),
                F.concat(F.lit("p" * 40), F.col("id").cast("string")).alias(
                    "payload"
                ),
            )
            dim = spark.range(0, 20_000).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            )
            # global aggregate on purpose: a groupBy on the join key
            # would REQUIRE the join's hash partitioning downstream,
            # and AQE (correctly) refuses to split a skewed partition
            # when that would force an extra shuffle
            joined = fact.join(dim, "k").agg(F.count(F.lit(1)))
            joined.collect()
            plan = joined._jdf.queryExecution().executedPlan().toString()
            final = plan.split("== Initial Plan ==")[0]
            assert "skew=true" in final, final
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


class TestRound6PlanShapes:
    def test_bm25_broadcasts_query_terms_no_cartesian(self, spark, sf_dir):
        """BM25's scored stream must be the postings of the broadcast
        query-term table — an equi-join, never a cartesian of corpus x
        queries."""
        from personal_health_etl_pipeline_spark.plans.llm_surface3 import (
            text_bm25_topk,
        )

        plan = _executed_plan(text_bm25_topk(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    def test_a19_grouped_apply_is_one_arrow_stage(self, spark, sf_dir):
        """The grouped applyInPandas must appear as a single
        FlatMapGroupsInPandas over one hash partitioning by the group
        key — no extra shuffle, no row-at-a-time Python."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            a19_grouped_apply_center,
        )

        plan = _executed_plan(a19_grouped_apply_center(spark, sf_dir))
        assert plan.count("FlatMapGroupsInPandas") == 1
        assert "BatchEvalPython" not in plan  # never row-at-a-time

    def test_j15_wide_combine_stays_equi_joins(self, spark, sf_dir):
        """The 6-way full-width combine must be outer EQUI-joins on
        day — no cartesian/BNLJ anywhere in the 66-column plan."""
        from personal_health_etl_pipeline_spark.plans.oura_wide import (
            j15_oura_day_full_width,
        )

        plan = _executed_plan(j15_oura_day_full_width(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_setsim_candidate_join_is_equi(self, spark, sf_dir):
        from personal_health_etl_pipeline_spark.plans.llm_surface import (
            dedup_setsim_prefix,
        )

        plan = _executed_plan(dedup_setsim_prefix(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestRound6TailPlanShapes:
    def test_ewma_is_single_hash_shuffle(self, spark, sf_dir):
        """ts5: one hashpartitioning exchange (user_id for the window);
        the only other exchange is the certified slice's bounded
        single-partition delivery sort (repartition(1) over ~1/7 of the
        output — see the entry docstring's floor decomposition). No
        join, no extra agg shuffle, and crucially NO range-sort over
        the full output (its sampling pass re-evaluated the window)."""
        from personal_health_etl_pipeline_spark.plans.temporal_surface import (
            ts5_ewma_halflife,
        )

        df = ts5_ewma_halflife(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Exchange rangepartitioning" not in plan, plan
        assert "Join" not in plan

    def test_kmv_set_ops_broadcasts_pairs_fans_in_partial(self, spark, sf_dir):
        """The tiny type-pair table broadcasts into both expansion
        joins; the per-(pair, hash) dedup agg is partial (map-side
        combine before the wide shuffle)."""
        from personal_health_etl_pipeline_spark.plans.sketches import (
            sketch_kmv_set_ops,
        )

        df = sketch_kmv_set_ops(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "BroadcastHashJoin" in plan
        assert "partial_max" in plan  # map-side combine on the dedup agg
        assert "SortMergeJoin" not in plan, plan

    def test_audio_energy_filters_before_python(self, spark, sf_dir):
        """The audio predicate and the (media_id, content) projection
        must sit BELOW MapInPandas: non-audio rows and the meta column
        never cross the Arrow boundary."""
        from personal_health_etl_pipeline_spark.plans.llm_surface import (
            mm_audio_energy,
        )

        df = mm_audio_energy(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        lines = plan.splitlines()
        i_map = next(i for i, l in enumerate(lines) if "MapInPandas" in l)
        i_filter = next(
            i for i, l in enumerate(lines) if "media_type = audio" in l
        )
        assert i_map < i_filter  # child (filter) prints below the UDF node
        assert "meta" not in lines[i_map]  # pruned before the transfer

    def test_token_budget_cumsum_is_bucket_partitioned(self, spark, sf_dir):
        """The global running total must come from the two-phase shape:
        the corpus-side window partitions by the quality bucket (the
        only unpartitioned window may be the 10-row offset frame), and
        the offsets ride in as a broadcast."""
        from personal_health_etl_pipeline_spark.plans.llm_surface2 import (
            corpus_token_budget,
        )

        df = corpus_token_budget(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        corpus_windows = [
            l for l in plan.splitlines()
            if "windowspecdefinition" in l and "n_tok" in l
        ]
        assert corpus_windows, plan
        assert all("bkt" in l for l in corpus_windows), corpus_windows
        assert "BroadcastHashJoin" in plan

    def test_asof_forward_tolerance_single_shuffle(self, spark, sf_dir):
        """j19's forward+tolerance mode must keep j4's plan shape: one
        union + keyed window, no BNLJ/cartesian, at most one hash
        exchange (the tolerance is a post-window projection, not a
        join)."""
        from personal_health_etl_pipeline_spark.plans.temporal_surface import (
            j19_asof_forward_tolerance,
        )

        plan = _executed_plan(j19_asof_forward_tolerance(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert plan.count("Exchange hashpartitioning") <= 1
        assert "Window" in plan

    def test_interval_concurrency_one_scan_one_hash_shuffle(
        self, spark, sf_dir
    ):
        """w9's sweep-line must be ONE fact scan (boundary structs are
        an inline array explode, not a 4-branch union) and one day
        hashpartitioning that both the running-sum window and the
        per-day max reuse. No join anywhere."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            w9_interval_concurrency,
        )

        df = w9_interval_concurrency(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        assert plan.count("Scan parquet") == 1, plan
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Join" not in plan
        assert "Union" not in plan

    def test_event_transitions_no_second_window_pass(self, spark, sf_dir):
        """a21's row totals come from a window over the bounded cell
        table, not a groupBy+join back through the lead() window: one
        fact scan, no join, and exactly one window over event_type
        cells plus the user_id lead window."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            a21_event_transitions,
        )

        df = a21_event_transitions(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        assert plan.count("Scan parquet") == 1, plan
        assert "Join" not in plan

    def test_cusum_single_user_shuffle_then_hash_agg(self, spark, sf_dir):
        """ts7: the running sum, the full-partition N/T frames and the
        row_number all share ONE user_id exchange; the argmax is a hash
        aggregate (min(struct)) with a map-side partial, not a second
        window sort."""
        from personal_health_etl_pipeline_spark.plans.temporal_surface import (
            ts7_cusum_changepoint,
        )

        df = ts7_cusum_changepoint(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "partial_min" in plan, plan
        assert "Join" not in plan

    def test_ohlc_is_one_hash_aggregate(self, spark, sf_dir):
        """ts8: min_by/max_by keep OHLC a pure hash aggregate — the
        purchase filter reaches the scan, there is no window sort of
        the tick stream, and the agg has a map-side partial."""
        from personal_health_etl_pipeline_spark.plans.temporal_surface import (
            ts8_ohlc_bars,
        )

        df = ts8_ohlc_bars(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "Window" not in plan, plan
        assert "partial_min_by" in plan or "partial_min" in plan, plan
        assert "PushedFilters" in _formatted(df)

    def test_jaccard_wedges_are_generated_not_self_joined(
        self, spark, sf_dir
    ):
        """graph_jaccard_similarity must count common neighbors via the
        basket shape (explode of inline neighbor pairs — a Generate
        node), never an adjacency self-join; the only joins are the two
        bounded degree lookups, and nothing degenerates to a nested
        loop."""
        from personal_health_etl_pipeline_spark.plans.graph_surface import (
            graph_jaccard_similarity,
        )

        df = graph_jaccard_similarity(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "Generate explode" in plan, plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        n_joins = sum(
            plan.count(j)
            for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
        )
        assert n_joins <= 2, plan

    def test_nullsafe_join_key_stays_equi(self, spark, sf_dir):
        """j21: an eqNullSafe join key must compile to a hash/sort-merge
        equi-join — never BroadcastNestedLoopJoin, which is what a
        naive `ON a = b OR (a IS NULL AND b IS NULL)` predicate
        produces."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            j21_nullsafe_join,
        )

        df = j21_nullsafe_join(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan
        assert any(
            j in plan
            for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
        ), plan

    def test_correlated_subqueries_are_decorrelated(self, spark, sf_dir):
        """sql2: Catalyst must rewrite the correlated scalar subqueries
        to aggregate+join and the correlated EXISTS to a left-semi —
        no nested-loop artifact may survive decorrelation."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            sql2_correlated_subqueries,
        )

        df = sql2_correlated_subqueries(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan
        assert "LeftSemi" in plan, plan  # the EXISTS rewrite

    def test_pivot_is_single_aggregate_no_distinct_job(self, spark, sf_dir):
        """sql4: PIVOT with a declared IN list must lower to the
        two-phase (cohort, type) aggregate + pivotfirst pair — and
        nothing else: no third shuffle for a distinct-values
        discovery pass (the implicit-pivot cost), no Expand, no
        join."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            sql4_pivot_wide,
        )

        df = sql4_pivot_wide(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "pivotfirst" in plan, plan
        # (cohort, type) pre-agg + cohort pivotfirst = exactly two hash
        # exchanges (plus the presentation sort's range exchange); a
        # third would be the distinct-values job the IN list avoids
        assert plan.count("Exchange hashpartitioning") == 2, plan
        assert "CartesianProduct" not in plan
        assert "Expand" not in plan

    def test_unpivot_is_expand_not_union_of_scans(self, spark, sf_dir):
        """f21: DataFrame.unpivot must compile to a single scan feeding
        an Expand generator — four projections UNIONed would re-scan
        lineitem four times."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            f21_unpivot_melt,
        )

        df = f21_unpivot_melt(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "Expand" in plan, plan
        assert plan.count("Scan parquet") == 1, plan

    def test_streaks_two_hash_shuffles_no_join(self, spark, sf_dir):
        """w11: the anchor-date rewrite must stay join-free — distinct
        days, one window, the island group-by, all hash-partitioned by
        user; a day+1 self-join or iterative probe is the shape this
        entry exists to avoid."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            w11_streaks,
        )

        df = w11_streaks(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        for join in ("SortMergeJoin", "BroadcastHashJoin",
                     "ShuffledHashJoin", "BroadcastNestedLoopJoin",
                     "CartesianProduct"):
            assert join not in plan, plan
        assert "Window" in plan, plan

    def test_twa_window_and_agg_share_one_partitioning(self, spark, sf_dir):
        """ts10: the lead() window and the (type, day) aggregate use
        the same keys, so the whole query runs on ONE hash exchange
        (plus the presentation sort)."""
        from personal_health_etl_pipeline_spark.plans.temporal_surface import (
            ts10_time_weighted_avg,
        )

        df = ts10_time_weighted_avg(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Window" in plan, plan

    def test_keyless_range_join_buckets_not_bnlj(self, spark, sf_dir):
        """j27: with NO equality key the banded rewrite must still
        produce a hash/sort-merge equi-join on the epoch bucket — the
        naive plan for a pure inequality predicate is a
        BroadcastNestedLoopJoin over the full cross space."""
        from personal_health_etl_pipeline_spark.plans.temporal_surface import (
            j27_global_range_join,
        )

        df = j27_global_range_join(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert any(
            j in plan
            for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
        ), plan

    def test_calendar_rollup_one_fact_scan(self, spark, sf_dir):
        """ts11: the week/month grains must re-aggregate the day-level
        partials — one parquet scan total, the grain Expand riding the
        SMALL day frame (Generate after the first aggregate), and two
        hash exchanges (fact->day, day->grain)."""
        from personal_health_etl_pipeline_spark.plans.temporal_surface import (
            ts11_calendar_rollup,
        )

        df = ts11_calendar_rollup(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        assert plan.count("Scan parquet") == 1, plan
        assert plan.count("Exchange hashpartitioning") == 2, plan
        assert "Generate" in plan, plan

    def test_incremental_agg_merge_is_union_reagg(self, spark, sf_dir):
        """m4: merge(base, delta) must stay a union of two keyed
        partial aggregates folded by one more keyed aggregate — no
        join of base against delta, which would be the wrong (and
        non-algebraic) maintenance shape."""
        from personal_health_etl_pipeline_spark.plans.cdc_surface import (
            m4_incremental_agg_merge,
        )

        df = m4_incremental_agg_merge(spark, sf_dir)
        df.collect()
        plan = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "Union" in plan, plan
        for join in ("SortMergeJoin", "BroadcastHashJoin",
                     "ShuffledHashJoin", "BroadcastNestedLoopJoin",
                     "CartesianProduct"):
            assert join not in plan, plan


class TestR7LateBatchPlanShapes:
    def test_ols_fit_is_one_pruned_aggregate(self, spark, sf_dir):
        """a29: regression-as-an-aggregate must be scan -> partial agg
        -> one hash exchange -> final agg; the scan reads only the 4
        referenced columns of the 11-column table."""
        from personal_health_etl_pipeline_spark.plans.stats_surface import (
            a29_ols_slope,
        )

        df = a29_ols_slope(spark, sf_dir)
        plan = _formatted(df)
        read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
        assert read_schema.count(":") - 1 <= 5, read_schema
        df.collect()
        ex = _executed_plan(df).split("== Initial Plan ==")[0]
        assert ex.count("Exchange hashpartitioning") == 1, ex
        for join in ("SortMergeJoin", "BroadcastHashJoin",
                     "ShuffledHashJoin", "CartesianProduct"):
            assert join not in ex, ex

    def test_chisq_marginals_ride_the_cell_frame(self, spark, sf_dir):
        """a27: one fact aggregation, then window marginals over the
        40-cell frame — no second fact scan, no join."""
        from personal_health_etl_pipeline_spark.plans.stats_surface import (
            a27_chisq_independence,
        )

        df = a27_chisq_independence(spark, sf_dir)
        df.collect()
        ex = _executed_plan(df).split("== Initial Plan ==")[0]
        assert ex.count("Scan parquet") == 1, ex
        assert "CartesianProduct" not in ex, ex
        for join in ("SortMergeJoin", "ShuffledHashJoin"):
            assert join not in ex, ex

    def test_first_touch_window_then_equi_joinback(self, spark, sf_dir):
        """j29: the attribution window must be a value-RANGE frame on
        one user_id partitioning, and the id recovery a plain equi
        join — never a time-band nested loop."""
        from personal_health_etl_pipeline_spark.plans.temporal_surface import (
            j29_first_touch_attribution,
        )

        df = j29_first_touch_attribution(spark, sf_dir)
        df.collect()
        ex = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "Window" in ex, ex
        assert "BroadcastNestedLoopJoin" not in ex, ex
        assert "CartesianProduct" not in ex, ex
        assert any(
            j in ex
            for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
        ), ex

    def test_interpolation_single_series_partitioning(self, spark, sf_dir):
        """ts12: knot thinning + calendar explode + two window passes —
        no self-join of the series against itself (the naive
        interpolation shape), one parquet scan."""
        from personal_health_etl_pipeline_spark.plans.temporal_surface import (
            ts12_linear_interpolate,
        )

        df = ts12_linear_interpolate(spark, sf_dir)
        df.collect()
        ex = _executed_plan(df).split("== Initial Plan ==")[0]
        assert ex.count("Scan parquet") <= 2, ex  # knots + grid bounds
        assert "CartesianProduct" not in ex, ex
        assert "Generate" in ex, ex  # the calendar explode
        assert "Window" in ex, ex

    def test_variant_shred_is_narrow_projection(self, spark, sf_dir):
        """f22: parse_json/variant_get shredding must stay a pure
        narrow projection — zero hash exchanges, zero joins, zero
        Python workers (BatchEvalPython/ArrowEvalPython absent)."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            f22_variant_shred,
        )

        df = f22_variant_shred(spark, sf_dir)
        df.collect()
        ex = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "Exchange hashpartitioning" not in ex, ex
        assert "EvalPython" not in ex, ex
        for join in ("SortMergeJoin", "BroadcastHashJoin",
                     "ShuffledHashJoin", "CartesianProduct"):
            assert join not in ex, ex

    def test_lm_dirichlet_broadcasts_bounded_query_frame(self, spark, sf_dir):
        """text_lm_dirichlet_topk: the 8-row query-term frame must
        cross in as a broadcast against the TF artifact postings —
        the scored stream is postings-of-8-terms, never corpus-wide."""
        from personal_health_etl_pipeline_spark.plans.llm_surface3 import (
            text_lm_dirichlet_topk,
        )

        df = text_lm_dirichlet_topk(spark, sf_dir)
        df.collect()
        ex = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "BroadcastExchange" in ex, ex
        assert "CartesianProduct" not in ex, ex

    def test_from_csv_roundtrip_is_narrow_projection(self, spark, sf_dir):
        """f23: the to_csv/from_csv codec must stay a pure narrow
        projection up to the final sort — zero hash exchanges, zero
        joins, zero Python workers."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            f23_from_csv_parse,
        )

        df = f23_from_csv_parse(spark, sf_dir)
        df.collect()
        ex = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "Exchange hashpartitioning" not in ex, ex
        assert "EvalPython" not in ex, ex
        for join in ("SortMergeJoin", "BroadcastHashJoin",
                     "ShuffledHashJoin", "CartesianProduct"):
            assert join not in ex, ex

    def test_observe_metrics_fold_inside_the_write_job(self, spark, sf_dir):
        """dq8: CollectMetrics must ride the production action — the
        observed plan carries a CollectMetrics node and the clean-rows
        filter, with no extra exchange introduced by the metrics; the
        entry itself then returns a 1-row local frame (no second scan
        of events)."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F
        from personal_health_etl_pipeline_spark.sources.tables import load_table

        ev = load_table(spark, sf_dir, "events")
        obs = Observation()
        observed = ev.where(F.col("event_type") != "error").observe(
            obs, F.count(F.lit(1)).alias("n")
        )
        plan = observed._jdf.queryExecution().optimizedPlan().toString()
        assert "CollectMetrics" in plan, plan
        ex = _executed_plan(observed.select("event_id"))
        assert "Exchange hashpartitioning" not in ex, ex


class TestRound8EntryPlanShapes:
    def test_ks_and_mwu_single_scan_no_join(self, spark, sf_dir):
        """a30/a31: ONE fact scan into the conditional hash-aggregate,
        a per-cohort window over the bounded distinct-cents frame, no
        joins anywhere."""
        from personal_health_etl_pipeline_spark.plans.stats_surface import (
            a30_ks_statistic,
            a31_mannwhitney_u,
        )

        for fn in (a30_ks_statistic, a31_mannwhitney_u):
            df = fn(spark, sf_dir)
            df.collect()
            ex = _executed_plan(df).split("== Initial Plan ==")[0]
            assert ex.count("Scan parquet") == 1, ex
            assert "Join" not in ex, ex
            assert "CartesianProduct" not in ex, ex

    def test_cogroup_asof_is_one_copartitioned_shuffle_pair(
        self, spark, sf_dir
    ):
        """j31: the merged frame is FlatMapCoGroupsInPandas fed by
        exactly one hash exchange per side (bucket), no joins, no
        extra aggs — the same shuffle count as the window-based
        as-of. The public entry checkpoints that frame before the
        display sort (r15: orderBy's range-partitioner sampling
        re-executed the whole Python pass), so its own executed plan
        must show the checkpoint scan and NO Python re-evaluation."""
        from personal_health_etl_pipeline_spark.plans.temporal_surface import (
            j31_cogroup_pandas_asof,
            j31_merged_frame,
        )

        inner = j31_merged_frame(spark, sf_dir)
        inner.write.format("noop").mode("overwrite").save()
        ex = _executed_plan(inner).split("== Initial Plan ==")[0]
        assert "FlatMapCoGroupsInPandas" in ex, ex
        assert ex.count("Exchange hashpartitioning") == 2, ex
        for join in ("SortMergeJoin", "BroadcastHashJoin",
                     "ShuffledHashJoin", "CartesianProduct"):
            assert join not in ex, ex

        df = j31_cogroup_pandas_asof(spark, sf_dir)
        df.collect()
        ex = _executed_plan(df).split("== Initial Plan ==")[0]
        # the sort runs over the checkpointed rows: one RDD scan, one
        # range exchange, and crucially zero Python nodes — the
        # sampler must not re-run the cogroup pass
        assert "Scan ExistingRDD" in ex, ex
        assert "FlatMapCoGroupsInPandas" not in ex, ex
        assert ex.count("Exchange") == 1, ex

    def test_perplexity_filter_rides_the_model_artifact(self, spark, sf_dir):
        """corpus_perplexity_filter: the LM model join must come from
        the checkpointed session artifact (an RDD scan, not a third
        parquet scan); parquet scans are the bigram stream + the
        pruned doc->lang map only."""
        from personal_health_etl_pipeline_spark.plans.llm_surface2 import (
            corpus_perplexity_filter,
        )

        df = corpus_perplexity_filter(spark, sf_dir)
        df.collect()
        ex = _executed_plan(df).split("== Initial Plan ==")[0]
        assert ex.count("Scan parquet") <= 2, ex
        assert "Scan ExistingRDD" in ex, ex  # the checkpointed model
        assert "CartesianProduct" not in ex, ex

    def test_scalar_udf_modes_fuse_mapside(self, spark, sf_dir):
        """f25: all three scalar UDF modes evaluate as vectorized
        Arrow projections behind the scan — no shuffle other than the
        display sort, and NO row-at-a-time BatchEvalPython."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            f25_scalar_udf_modes,
        )

        df = f25_scalar_udf_modes(spark, sf_dir)
        df.collect()
        ex = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "ArrowEvalPython" in ex, ex
        assert "BatchEvalPython" not in ex, ex  # the banned per-row path
        assert "Exchange hashpartitioning" not in ex, ex
        assert "Join" not in ex, ex

    def test_funnel_is_one_scan_one_shuffle(self, spark, sf_dir):
        """w12: the chained conditional mins ride stacked windows over
        ONE user-keyed exchange; the final per-user agg reuses that
        partitioning — one parquet scan, no join."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            w12_funnel_steps,
        )

        df = w12_funnel_steps(spark, sf_dir)
        df.collect()
        ex = _executed_plan(df).split("== Initial Plan ==")[0]
        assert ex.count("Scan parquet") == 1, ex
        assert ex.count("Exchange hashpartitioning") == 1, ex
        assert "Join" not in ex, ex

    def test_map_in_arrow_is_exchange_free_arrow_stage(self, spark, sf_dir):
        """f26: scan -> MapInArrow -> sort; no pandas path, no
        row-at-a-time Python, no exchange before the Python stage."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            f26_map_in_arrow,
        )

        df = f26_map_in_arrow(spark, sf_dir)
        df.collect()
        ex = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "MapInArrow" in ex, ex
        assert "BatchEvalPython" not in ex, ex
        assert "Exchange hashpartitioning" not in ex, ex

    def test_approx_percentile_window_single_hash_shuffle(
        self, spark, sf_dir
    ):
        """a33: one hashpartitioning exchange (user_id) feeding the
        frame-bounded GK window; delivery is the bounded-slice single-
        partition sort (no full-output range sort), no join."""
        from personal_health_etl_pipeline_spark.plans.stats_surface import (
            a33_approx_percentile_window,
        )

        df = a33_approx_percentile_window(spark, sf_dir)
        df.collect()
        ex = _executed_plan(df).split("== Initial Plan ==")[0]
        assert ex.count("Exchange hashpartitioning") == 1, ex
        assert "Exchange rangepartitioning" not in ex, ex
        assert "Join" not in ex, ex

    def test_lateral_topk_decorrelates_to_window(self, spark, sf_dir):
        """sql6: the correlated LATERAL LIMIT must decorrelate into a
        relational window top-k joined hash-wise — never a per-outer-
        row re-execution (BNLJ/cartesian), which would be quadratic at
        scale."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            sql6_lateral_topk,
        )

        df = sql6_lateral_topk(spark, sf_dir)
        df.collect()
        ex = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "Window" in ex, ex
        assert "BroadcastNestedLoopJoin" not in ex, ex
        assert "CartesianProduct" not in ex, ex

    def test_sessionized_funnel_one_fact_shuffle(self, spark, sf_dir):
        """w13: sessionize window (user_id), the (user_id, session_seq)
        funnel windows AND the per-session aggregate all ride the ONE
        hashpartitioning(user_id) exchange (sub-keyed clustered
        distribution); the only other hash exchange is the 3-row
        stage_reached rollup. One scan, no join."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            w13_sessionized_funnel,
        )

        df = w13_sessionized_funnel(spark, sf_dir)
        df.collect()
        ex = _executed_plan(df).split("== Initial Plan ==")[0]
        assert ex.count("Scan parquet") == 1, ex
        assert ex.count("Exchange hashpartitioning") == 2, ex
        assert "Join" not in ex, ex

    def test_cohort_retention_single_scan_broadcast_denominator(
        self, spark, sf_dir
    ):
        """a32: one fact scan; the cohort-size denominator joins
        broadcast (tiny frame) — no shuffled join, no cartesian."""
        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            a32_cohort_retention,
        )

        df = a32_cohort_retention(spark, sf_dir)
        df.collect()
        ex = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "BroadcastHashJoin" in ex, ex
        for join in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
            assert join not in ex, ex

    def test_polymorphic_udtf_is_mapside(self, spark, sf_dir):
        """udtf_ngram_grid: the UDTF evaluates map-side (a Python UDTF
        generator node, no shuffle feeding it); the only exchange is
        the display sort's range partition."""
        from personal_health_etl_pipeline_spark.plans.reference_surface import (
            udtf_ngram_grid,
        )

        df = udtf_ngram_grid(spark, sf_dir)
        df.collect()
        ex = _executed_plan(df).split("== Initial Plan ==")[0]
        assert "PythonUDTF" in ex or "Generate" in ex, ex
        assert "Exchange hashpartitioning" not in ex, ex
        assert "Join" not in ex, ex


class TestDataSourceWriter:
    def test_manifest_two_phase_commit_and_orphan_invisibility(
        self, spark, sf_dir
    ):
        """The writer publishes ONLY via the manifest: a stray part
        file dropped next to the committed ones (a failed/speculative
        task's orphan) must not be read by a manifest-honoring
        consumer, and manifest total_rows equals the written count."""
        import json
        import os
        import tempfile

        from personal_health_etl_pipeline_spark.sources.datasource import (
            register_writer,
        )
        from personal_health_etl_pipeline_spark.sources.tables import (
            load_table,
        )

        register_writer(spark)
        out = os.path.join(tempfile.mkdtemp(prefix="dsw_"), "t")
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type"
        ).limit(500)
        n = ev.count()
        ev.repartition(3, "event_id").write.format("jsonl_lines").option(
            "path", out
        ).mode("append").save()

        with open(os.path.join(out, "_MANIFEST.json")) as fh:
            manifest = json.load(fh)
        assert manifest["total_rows"] == n
        assert sum(f["rows"] for f in manifest["files"]) == n
        listed = {f["name"] for f in manifest["files"]}
        on_disk = {
            f for f in os.listdir(out) if f.startswith("part-")
        }
        assert listed == on_disk  # clean commit: no orphans yet

        # drop an orphan; the manifest-honoring read must not see it
        with open(os.path.join(out, "part-orphan.jsonl"), "w") as fh:
            fh.write('{"event_id": -1, "event_type": "GHOST"}\n')
        files = [os.path.join(out, f["name"]) for f in manifest["files"]]
        back = spark.read.schema("event_id long, event_type string").json(
            files
        )
        assert back.count() == n
        assert back.where("event_type = 'GHOST'").count() == 0

    def test_second_append_merges_manifest(self, spark, sf_dir):
        """ADVICE r8: a second append-mode save to the same path must
        MERGE with the published manifest — the first commit's rows
        stay visible to manifest-honoring readers (append-only
        contract), not silently unpublished by an overwrite."""
        import json
        import os
        import tempfile

        from personal_health_etl_pipeline_spark.sources.datasource import (
            register_writer,
        )

        register_writer(spark)
        out = os.path.join(tempfile.mkdtemp(prefix="dsw_"), "t")
        df1 = spark.range(7).selectExpr("id AS event_id")
        df2 = spark.range(100, 105).selectExpr("id AS event_id")
        df1.coalesce(1).write.format("jsonl_lines").option(
            "path", out
        ).mode("append").save()
        df2.coalesce(1).write.format("jsonl_lines").option(
            "path", out
        ).mode("append").save()

        with open(os.path.join(out, "_MANIFEST.json")) as fh:
            manifest = json.load(fh)
        assert manifest["total_rows"] == 12  # 7 + 5, both commits live
        files = [os.path.join(out, f["name"]) for f in manifest["files"]]
        back = spark.read.schema("event_id long").json(files)
        assert back.count() == 12
        assert back.where("event_id >= 100").count() == 5

    def test_overwrite_mode_is_refused(self, spark, sf_dir):
        import os
        import tempfile

        import pytest

        from personal_health_etl_pipeline_spark.sources.datasource import (
            register_writer,
        )

        register_writer(spark)
        out = os.path.join(tempfile.mkdtemp(prefix="dsw_"), "t")
        df = spark.range(5).selectExpr("id AS event_id")
        with pytest.raises(Exception, match="append only|Overwrite"):
            df.write.format("jsonl_lines").option("path", out).mode(
                "overwrite"
            ).save()


class TestBpeBatchedRounds:
    def test_catalog_entry_trains_in_two_rounds(self, spark, sf_dir):
        """The batched entry's point is the round count: 8 merges at
        batch_k=4 must take exactly 2 count rounds on the real corpus
        (pair space is rich enough that no round comes up short)."""
        from pyspark.sql import functions as F
        from personal_health_etl_pipeline_spark.plans.llm_surface3 import (
            BPE_BATCH_K,
            BPE_BATCH_MERGES,
            _doc_tokens,
            bpe_train_merges,
        )
        from personal_health_etl_pipeline_spark.sources.tables import (
            load_table,
        )

        words = (
            _doc_tokens(load_table(spark, sf_dir, "documents"))
            .groupBy(F.col("term").alias("word"))
            .agg(F.count(F.lit(1)).alias("wc"))
        )
        merges, rounds = bpe_train_merges(
            words, BPE_BATCH_MERGES, batch_k=BPE_BATCH_K
        )
        assert len(merges) == BPE_BATCH_MERGES
        assert rounds == BPE_BATCH_MERGES // BPE_BATCH_K
        # symbol-disjointness within each accepted batch
        for r in range(rounds):
            batch = merges[r * BPE_BATCH_K : (r + 1) * BPE_BATCH_K]
            syms = [s for p in batch for s in p]
            assert len(syms) == len(set(syms)), batch


class TestCboStatisticsDrivenBroadcast:
    """sql7's four causal gates, exercised as localized tests (the
    entry itself raises if any gate fails — these pin each gate's
    failure to a named test instead of one opaque AssertionError)."""

    def test_entry_passes_all_gates_and_stats_rowcount_is_true_count(
        self, spark, sf_dir
    ):
        from personal_health_etl_pipeline_spark.plans.audit_surface import (
            sql7_cbo_broadcast_audit,
        )

        out = sql7_cbo_broadcast_audit(spark, sf_dir).collect()
        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        true_rows = nation.count()
        assert out, "audit returned no rows"
        assert all(r.dim_rows_stat == true_rows for r in out), (
            "ANALYZE's rowCount statistic disagrees with COUNT(*)"
        )
        # conf hygiene: the entry restored what it touched
        assert spark.conf.get("spark.sql.cbo.enabled") == "false"
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1"

    def test_no_stats_means_no_rowcount(self, spark, sf_dir):
        """Counter-factual for gate 1: an UNanalyzed external table has
        no rowCount in its optimized-plan stats, so a defined rowCount
        is proof ANALYZE ran (file-size fallback gives bytes only)."""
        db = "sql7_gate_test"
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        spark.sql(f"DROP TABLE IF EXISTS {db}.nation_nostats")
        spark.sql(
            f"CREATE TABLE {db}.nation_nostats USING parquet "
            f"LOCATION '{sf_dir}/nation.parquet'"
        )
        old = spark.conf.get("spark.sql.cbo.enabled")
        try:
            spark.conf.set("spark.sql.cbo.enabled", "true")
            stats = (
                spark.table(f"{db}.nation_nostats")
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
            )
            assert not stats.rowCount().isDefined()
        finally:
            spark.conf.set("spark.sql.cbo.enabled", old)
            spark.sql(f"DROP TABLE IF EXISTS {db}.nation_nostats")

    def test_sql8_skew_split_audit_gates_and_conf_hygiene(
        self, spark, sf_dir
    ):
        """sql8's gates run inside the entry (skew marker present with
        the optimization on, absent with it off, rows equal); this
        pins conf restoration and the fact-conservation invariant —
        every fact row joins exactly one dim key, so the group counts
        must sum to the full lineitem row count."""
        from personal_health_etl_pipeline_spark.plans.audit_surface import (
            sql8_aqe_skew_split_audit,
        )
        from personal_health_etl_pipeline_spark.sources.tables import (
            load_table,
        )

        before = {
            k: spark.conf.get(k, None)
            for k in (
                "spark.sql.adaptive.skewJoin.enabled",
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            )
        }
        out = sql8_aqe_skew_split_audit(spark, sf_dir).collect()
        assert out and all(r.n_rows > 0 for r in out)
        n_li = load_table(spark, sf_dir, "lineitem").count()
        assert sum(r.n_rows for r in out) == n_li
        after = {k: spark.conf.get(k, None) for k in before}
        assert after == before

    def test_gate4_analyze_not_filesize_licenses_the_broadcast(
        self, spark, sf_dir
    ):
        """Gate 4 in isolation (ADVICE-r10): the tiny dim's raw bytes
        are under the default threshold, so gates 2-3 alone can't tell
        catalog statistics from file-size luck. With the file-size
        estimate inflated to terabytes, the ANALYZEd table must still
        broadcast (catalog stats bypass the file-size path) while an
        identical unanalyzed shell over the same parquet must plan
        SortMergeJoin — the only delta between the plans is ANALYZE."""
        db = "sql7_gate4_test"
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        for t in ("nation_an", "nation_no", "customer"):
            spark.sql(f"DROP TABLE IF EXISTS {db}.{t}")
        for t, loc in (
            ("nation_an", "nation"),
            ("nation_no", "nation"),
            ("customer", "customer"),
        ):
            spark.sql(
                f"CREATE TABLE {db}.{t} USING parquet "
                f"LOCATION '{sf_dir}/{loc}.parquet'"
            )
        spark.sql(
            f"ANALYZE TABLE {db}.nation_an COMPUTE STATISTICS "
            "FOR ALL COLUMNS"
        )
        old_cbo = spark.conf.get("spark.sql.cbo.enabled")
        old_ccf = spark.conf.get("spark.sql.sources.fileCompressionFactor")
        try:
            spark.conf.set("spark.sql.cbo.enabled", "true")
            spark.conf.set(
                "spark.sql.sources.fileCompressionFactor", "1000000000"
            )
            for t in ("nation_an", "nation_no", "customer"):
                spark.catalog.refreshTable(f"{db}.{t}")

            def _plan(dim: str) -> str:
                j = spark.table(f"{db}.customer").join(
                    spark.table(f"{db}.{dim}"),
                    F.col("c_nationkey") == F.col("n_nationkey"),
                )
                return j._jdf.queryExecution().executedPlan().toString()

            analyzed, nostats = _plan("nation_an"), _plan("nation_no")
            assert "BroadcastHashJoin" in analyzed, analyzed
            assert "BroadcastHashJoin" not in nostats, nostats
            assert "SortMergeJoin" in nostats, nostats
        finally:
            spark.conf.set("spark.sql.cbo.enabled", old_cbo)
            spark.conf.set(
                "spark.sql.sources.fileCompressionFactor", old_ccf
            )
            for t in ("nation_an", "nation_no", "customer"):
                spark.sql(f"DROP TABLE IF EXISTS {db}.{t}")


class TestDynamicPartitionPruning:
    def test_sql9_dpp_audit_gates_and_conf_hygiene(self, spark, sf_dir):
        """sql9's plan gates run inside the entry (dynamicpruning
        marker present with DPP on, absent with it off, rows equal);
        this pins conf restoration and the month invariant — the
        quarter-2 dimension filter admits exactly months 4-6, and the
        group counts must sum to the orders rows in those months."""
        from personal_health_etl_pipeline_spark.plans.audit_surface import (
            sql9_dpp_audit,
        )
        from personal_health_etl_pipeline_spark.sources.tables import (
            load_table,
        )

        keys = (
            "spark.sql.optimizer.dynamicPartitionPruning.enabled",
            "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        )
        before = {k: spark.conf.get(k, None) for k in keys}
        out = sql9_dpp_audit(spark, sf_dir).collect()
        assert sorted(r.omonth for r in out) == [4, 5, 6]
        expected = (
            load_table(spark, sf_dir, "orders")
            .where(F.month("o_orderdate").isin(4, 5, 6))
            .count()
        )
        assert sum(r.n_orders for r in out) == expected
        after = {k: spark.conf.get(k, None) for k in keys}
        assert after == before

    def test_dpp_prunes_the_fact_scan_files(self, spark, sf_dir):
        """Beyond the marker: the pruned run must TOUCH fewer fact
        files than the unpruned control — read both executed plans'
        scan metrics ("number of files read") and require exactly the
        quarter-2 partition-directory file count vs the full layout's
        (derived from the written layout, not hard-coded — ADVICE-r12;
        on the shipped corpora that is 3 vs 12). This is the physical
        effect the marker promises."""
        import os
        import shutil
        import tempfile

        from personal_health_etl_pipeline_spark.sources.tables import (
            load_table,
        )

        root = tempfile.mkdtemp(prefix="dpp_files_test_")
        try:
            (
                load_table(spark, sf_dir, "orders")
                .select(
                    "o_orderkey", F.month("o_orderdate").alias("omonth")
                )
                .repartition("omonth")
                .write.partitionBy("omonth")
                .parquet(os.path.join(root, "fact"))
            )
            fact = spark.read.parquet(os.path.join(root, "fact"))
            dim = spark.range(1, 13).select(
                F.col("id").cast("int").alias("omonth"),
                ((F.col("id") - 1) / 3 + 1).cast("int").alias("quarter"),
            )

            def _files_read(enabled: str) -> int:
                old = spark.conf.get(
                    "spark.sql.optimizer.dynamicPartitionPruning.enabled"
                )
                try:
                    spark.conf.set(
                        "spark.sql.optimizer."
                        "dynamicPartitionPruning.enabled",
                        enabled,
                    )
                    df = fact.join(
                        dim.where(F.col("quarter") == 2), "omonth"
                    ).agg(F.count(F.lit(1)).alias("n"))
                    df.collect()

                    # walk the FINAL adaptive plan to the fact
                    # FileSourceScanExec and read its "number of files
                    # read" metric (py4j traversal: AQE/QueryStage
                    # wrappers hide their subtree behind executedPlan()
                    # / plan(), not children())
                    def _num_files(jnode):
                        name = jnode.getClass().getSimpleName()
                        if name.startswith("AdaptiveSparkPlan"):
                            return _num_files(jnode.executedPlan())
                        if "QueryStage" in name:
                            return _num_files(jnode.plan())
                        if name.startswith("FileSourceScan"):
                            return int(
                                jnode.metrics().apply("numFiles").value()
                            )
                        ch = jnode.children()
                        for i in range(ch.length()):
                            r = _num_files(ch.apply(i))
                            if r is not None:
                                return r
                        return None

                    n = _num_files(df._jdf.queryExecution().executedPlan())
                    assert n is not None, "no FileSourceScan found"
                    return n
                finally:
                    spark.conf.set(
                        "spark.sql.optimizer."
                        "dynamicPartitionPruning.enabled",
                        old,
                    )

            # expected counts come from the layout actually written:
            # data files under omonth=4..6 dirs for the pruned run,
            # every partition dir's data files for the control
            fact_root = os.path.join(root, "fact")
            part_dirs = {
                d: [
                    f
                    for f in os.listdir(os.path.join(fact_root, d))
                    if f.endswith(".parquet")
                ]
                for d in os.listdir(fact_root)
                if d.startswith("omonth=")
            }
            q2_files = sum(
                len(fs)
                for d, fs in part_dirs.items()
                if int(d.split("=")[1]) in (4, 5, 6)
            )
            all_files = sum(len(fs) for fs in part_dirs.values())
            assert q2_files and all_files > q2_files, part_dirs
            assert _files_read("true") == q2_files
            assert _files_read("false") == all_files
        finally:
            shutil.rmtree(root, ignore_errors=True)

    def test_partitioned_layout_roundtrips_for_duckdb(self, spark, sf_dir):
        """sql9's oracle computes from the UNPARTITIONED source (the
        sql7/sql8 convention); that shortcut is sound only if the
        partitioned write/read round-trips values exactly for BOTH
        engines. Write the same layout, read it back with DuckDB's
        hive partitioning, and compare the full row multiset against
        Spark's read of the same directories."""
        import os
        import shutil
        import tempfile

        import duckdb

        from personal_health_etl_pipeline_spark.sources.tables import (
            load_table,
        )

        root = tempfile.mkdtemp(prefix="dpp_roundtrip_test_")
        try:
            (
                load_table(spark, sf_dir, "orders")
                .select(
                    "o_orderkey",
                    F.expr(
                        "CAST(round(o_totalprice * 100) AS BIGINT)"
                    ).alias("cents"),
                    F.month("o_orderdate").alias("omonth"),
                )
                .repartition("omonth")
                .write.partitionBy("omonth")
                .parquet(os.path.join(root, "fact"))
            )
            s_rows = sorted(
                (r.o_orderkey, r.cents, int(r.omonth))
                for r in spark.read.parquet(
                    os.path.join(root, "fact")
                ).collect()
            )
            d_rows = sorted(
                (int(k), int(c), int(m))
                for k, c, m in duckdb.sql(
                    f"SELECT o_orderkey, cents, omonth FROM read_parquet("
                    f"'{root}/fact/*/*.parquet', hive_partitioning=1)"
                ).fetchall()
            )
            assert s_rows == d_rows and len(s_rows) > 0
        finally:
            shutil.rmtree(root, ignore_errors=True)
