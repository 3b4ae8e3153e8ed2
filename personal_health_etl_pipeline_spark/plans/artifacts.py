"""Registry of session-memoized corpus artifacts (VERDICT-r11 item 2).

Several plan modules memoize a corpus-static structure per
``(applicationId, sf_dir)`` — graph edge lists, the minhash band
index, the near-dup group table, the TF/NB/BPE/bigram text models,
k-means centroids, the persisted PQ index. Whichever query first
touches one pays its whole build, so per-query wall-clock attribution
depends on run order: the r11 driver bench charged ``graph_kcore``
24.0 s and ``corpus_split_groupsafe`` 14.1 s for builds the local twin
charged elsewhere (1.15 s / 0.18 s), which blinds any per-query
regression gate.

This registry names every such artifact with a forcing callable so a
harness (``bench.py``) can build each one BEFORE its per-query loop
and report the builds as their own line items. Forcing functions take
``(spark, sf_dir)`` and populate the owning module's memo as a side
effect; every builder materializes eagerly in-call (eager
``localCheckpoint`` / driver-side collect / parquet write), so calling
it IS the build. Where the builder is inlined in a public entry, the
entry itself is the cheapest forcing path (noted per line) — the extra
consume it performs is trivial next to the build.

``tests/test_artifact_registry.py`` asserts the registry stays
complete: every module-level ``_*_MEMO`` dict under ``plans/`` must be
either covered here or listed in :data:`EXEMPT` with a reason.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession

# artifact name -> forcing callable (spark, sf_dir) -> None
SESSION_ARTIFACTS: dict[str, Callable[[SparkSession, str], None]] = {}

# (module, memo name) -> why no forcing entry is needed
EXEMPT: dict[tuple[str, str], str] = {
    (
        "personal_health_etl_pipeline_spark.plans.analytics_surface",
        "_SQL3_SEQ_MEMO",
    ): "temp-view registration guard, not a data build (no job runs)",
}


def _register(name: str, covers: tuple[str, ...]):
    def deco(fn):
        fn.covers = covers
        SESSION_ARTIFACTS[name] = fn
        return fn

    return deco


@_register(
    "graph.txn_edges",
    ("personal_health_etl_pipeline_spark.plans.graph_surface:_TXN_EDGES_MEMO",),
)
def _f_txn_edges(spark, sf_dir):
    from personal_health_etl_pipeline_spark.plans import graph_surface as g

    g._txn_edges(spark, sf_dir)


@_register(
    "graph.cooc_edges",
    ("personal_health_etl_pipeline_spark.plans.graph_surface:_COOC_EDGES_MEMO",),
)
def _f_cooc_edges(spark, sf_dir):
    from personal_health_etl_pipeline_spark.plans import graph_surface as g

    g._cooc_edges(spark, sf_dir)


@_register(
    "graph.weighted_edges",
    (
        "personal_health_etl_pipeline_spark.plans.graph_surface:"
        "_WEIGHTED_EDGES_MEMO",
    ),
)
def _f_weighted_edges(spark, sf_dir):
    from personal_health_etl_pipeline_spark.plans import graph_surface as g

    g._weighted_edges(spark, sf_dir)


@_register(
    "graph.pagerank_structure",
    ("personal_health_etl_pipeline_spark.plans.graph_surface:_PR_GRAPH_MEMO",),
)
def _f_pr_graph(spark, sf_dir):
    # builder is inlined in graph_pagerank; the 3 PR iterations the
    # entry runs on top are small next to the prepare_graph checkpoints.
    # Memo-presence guard: re-touches must be free (the collect is not)
    from personal_health_etl_pipeline_spark.plans import graph_surface as g

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in g._PR_GRAPH_MEMO:
        g.graph_pagerank(spark, sf_dir).collect()


@_register(
    "llm.neardup_groups",
    ("personal_health_etl_pipeline_spark.plans.llm_surface:_GROUPS_MEMO",),
)
def _f_neardup_groups(spark, sf_dir):
    from personal_health_etl_pipeline_spark.plans import llm_surface as l

    l._neardup_groups(spark, sf_dir)


@_register(
    "llm.minhash_band_index",
    ("personal_health_etl_pipeline_spark.plans.llm_surface:_BAND_INDEX_MEMO",),
)
def _f_band_index(spark, sf_dir):
    # builder is inlined in dedup_incremental_lookup; the index build
    # (eager checkpoint) happens during the CALL, the returned probe
    # frame stays lazy — no collect needed
    from personal_health_etl_pipeline_spark.plans import llm_surface as l

    if (spark.sparkContext.applicationId, sf_dir) not in l._BAND_INDEX_MEMO:
        l.dedup_incremental_lookup(spark, sf_dir)


@_register(
    "llm.pq_index",
    ("personal_health_etl_pipeline_spark.plans.llm_surface:_PQ_INDEX_MEMO",),
)
def _f_pq_index(spark, sf_dir):
    from personal_health_etl_pipeline_spark.plans import llm_surface as l

    l._pq_index_root(spark, sf_dir)


@_register(
    "llm.pq_probe_batch",
    ("personal_health_etl_pipeline_spark.plans.llm_surface:_PQ_PROBE_MEMO",),
)
def _f_pq_probe(spark, sf_dir):
    # both query batches the catalog probes with: the persisted-probe
    # entry (seed 13) and the external-top-k entry (seed 7) — the
    # headline-coverage test in tests/test_artifact_registry.py caught
    # the second one missing on this registry's first round
    from personal_health_etl_pipeline_spark.plans import llm_surface as l

    l._pq_probe_artifact(spark, sf_dir, l.PQ_PERS_SEED, l.PQ_PERS_QUERIES)
    l._pq_probe_artifact(spark, sf_dir, l.PQ_EXT_SEED, l.PQ_EXT_QUERIES)


@_register(
    "clustering.kmeans_centroids",
    (
        "personal_health_etl_pipeline_spark.plans.clustering_surface:"
        "_CENTROID_MEMO",
    ),
)
def _f_centroids(spark, sf_dir):
    from personal_health_etl_pipeline_spark.plans import (
        clustering_surface as c,
    )

    # both (k, n_updates) combinations the catalog entries use
    c._trained_centroids(spark, sf_dir, c.KMEANS_K, c.KMEANS_UPDATES)
    c._trained_centroids(spark, sf_dir, c.IVFK_LISTS, c.IVFK_UPDATES)


@_register(
    "clustering.semantic_pairs",
    (
        "personal_health_etl_pipeline_spark.plans.clustering_surface:"
        "_SEMANTIC_PAIRS_MEMO",
    ),
)
def _f_semantic_pairs(spark, sf_dir):
    # the entry's return value IS the memoized artifact (eager ckpt)
    from personal_health_etl_pipeline_spark.plans import (
        clustering_surface as c,
    )

    c.dedup_semantic(spark, sf_dir)


@_register(
    "text.tf_table",
    ("personal_health_etl_pipeline_spark.plans.llm_surface3:_TF_MEMO",),
)
def _f_tf_table(spark, sf_dir):
    from personal_health_etl_pipeline_spark.plans import llm_surface3 as l3

    l3._corpus_tf(spark, sf_dir)


@_register(
    "text.nb_model",
    ("personal_health_etl_pipeline_spark.plans.llm_surface3:_NB_MODEL_MEMO",),
)
def _f_nb_model(spark, sf_dir):
    # builder inlined in text_nb_langid; model checkpoints are eager
    # in-call, the returned score frame stays lazy
    from personal_health_etl_pipeline_spark.plans import llm_surface3 as l3

    if (spark.sparkContext.applicationId, sf_dir) not in l3._NB_MODEL_MEMO:
        l3.text_nb_langid(spark, sf_dir)


@_register(
    "text.bpe_segments",
    ("personal_health_etl_pipeline_spark.plans.llm_surface3:_BPE_SEG_MEMO",),
)
def _f_bpe_segments(spark, sf_dir):
    # builder inlined in text_bpe_apply_corpus (vocabulary-sized eager
    # checkpoint built in-call)
    from personal_health_etl_pipeline_spark.plans import llm_surface3 as l3

    key = (spark.sparkContext.applicationId, sf_dir, l3.BPE_MERGES)
    if key not in l3._BPE_SEG_MEMO:
        l3.text_bpe_apply_corpus(spark, sf_dir)


@_register(
    "text.substring_windows",
    ("personal_health_etl_pipeline_spark.plans.llm_surface3:_SUBSTR_MEMO",),
)
def _f_substr(spark, sf_dir):
    from personal_health_etl_pipeline_spark.plans import llm_surface3 as l3

    l3._substr_artifacts(spark, sf_dir)


@_register(
    "text.bigram_model",
    (
        "personal_health_etl_pipeline_spark.plans.llm_surface2:"
        "_BIGRAM_MODEL_MEMO",
    ),
)
def _f_bigram_model(spark, sf_dir):
    # builder inlined in text_bigram_logprob (eager ckpt in-call)
    from personal_health_etl_pipeline_spark.plans import llm_surface2 as l2

    if (spark.sparkContext.applicationId, sf_dir) not in l2._BIGRAM_MODEL_MEMO:
        l2.text_bigram_logprob(spark, sf_dir)


def force_all(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Build every registered session artifact, returning per-artifact
    build seconds (0.0-ish when the memo already holds)."""
    import time

    out: dict[str, float] = {}
    for name, fn in SESSION_ARTIFACTS.items():
        start = time.perf_counter()
        fn(spark, sf_dir)
        out[name] = round(time.perf_counter() - start, 3)
    return out
