"""PageRank on the integer grid — iterative graph analytics beyond
connected components (``operators/graph.py``).

A training-data pipeline ranks entities all the time: which domains
anchor the link graph (quality priors for crawl filtering), which
suppliers/customers anchor a transaction graph. PageRank is the
canonical iterative job, and its distributed shape — edge join +
groupBy per iteration — is exactly what a 1000-executor cluster is
for. The reference repo has no iterative operator (its analytics stop
at two BigQuery probes, `composer_dags/dags/utils/data_sources/oura/
etl/load.py:220-247`); this extends the engine's graph family.

Determinism contract: float PageRank is NOT reproducible across
engines (distributed sums reorder, doubles drift), so ranks live in
integer MICRO-UNITS — every node starts at 1,000,000; contributions
are integer divisions (``rank div out_degree``); the damping update is
``(15 * 1_000_000 + 85 * inflow) div 100``. Integer addition is
associative, so Spark's unordered partial aggregation is bit-identical
to a serial SQL oracle. Rounding loses < 1e-6 of relative mass per
hop — irrelevant for ranking, essential for certifiability.

Scale design:

* Per iteration: ONE equi-join of ranks against the edge list (hash
  partitioned by src — reused every round), ONE groupBy(dst) with
  map-side partial sums, and a 1-row dangling-mass aggregate that
  rides a broadcast. No driver-side per-node state ever.
* Ranks are checkpointed each round (same recipe as
  ``connected_components``): the next iteration references the rank
  frame three times (inflow, dangling, carry), so without
  materialization the plan tree grows 3^k. ``localCheckpoint`` by
  default; pass a reliable ``checkpoint_dir`` on a cluster where
  executor loss matters (e.g. a 50-iteration run).
* Edge skew (a node with millions of in-edges) lands in the groupBy's
  partial aggregation — combiner-friendly, no pair explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.operators.graph import (
    _checkpoint_rdd_dirs,
    _delete_checkpoint_rdd_dirs,
)

PAGERANK_MICRO = 1_000_000
DAMPING_PCT = 85  # 0.85, in integer percent


class PreparedGraph:
    """Checkpointed graph STRUCTURE (edges, out-degrees, node set,
    node count, dangling set) — the per-corpus artifact iterations
    probe. Build once with :func:`prepare_graph`, run many
    :func:`pagerank` calls (or other traversals) against it; the
    structure never changes between runs, only the rank state does."""

    def __init__(self, e, outdeg, nodes, n_nodes, dangling, has_dangling):
        self.e = e
        self.outdeg = outdeg
        self.nodes = nodes
        self.n_nodes = n_nodes
        self.dangling = dangling
        self.has_dangling = has_dangling


def prepare_graph(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    dedup_edges: bool = True,
    checkpoint_edges: bool = True,
    symmetric: bool = False,
) -> PreparedGraph:
    """Materialize the static graph structure with local checkpoints
    (session-lifetime artifact; for reliable-checkpoint deployments
    keep using :func:`pagerank`'s ``checkpoint_dir`` path, which
    builds and cleans its own structure).

    ``checkpoint_edges=False`` skips the edge-frame checkpoint for
    callers whose ``edges`` IS already a materialized artifact (e.g. a
    session-memoized checkpointed edge list): re-checkpointing one
    would run a full copy job just to duplicate the stored blocks.

    ``symmetric=True`` declares that every edge's reverse is also in
    the list (an undirected graph stored as both directions). Then the
    node set IS the distinct-src set — already computed by the
    out-degree aggregate — and the dangling set is empty by
    construction (every node has at least one out-edge), so the
    union+distinct node shuffle, the dangling anti-join checkpoint and
    its existence probe are all skipped. WARNING: the property is
    purely caller-asserted and nothing here measures it — a wrong
    assertion (dst-only nodes, dangling nodes) yields SILENTLY WRONG
    ranks: dst-only nodes get no rank row at all and dangling mass is
    never redistributed. Only pass True for graphs symmetric BY
    CONSTRUCTION (e.g. an edge artifact that emits both directions of
    every pair); results are identical to the general path when it
    holds, and the general path measures everything when in doubt."""
    _ckpt = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
    return _prepare(
        edges, src, dst, dedup_edges, _ckpt, ckpt_edges=checkpoint_edges,
        symmetric=symmetric,
    )


def _prepare(
    edges, src, dst, dedup_edges, _ckpt, ckpt_edges=True, symmetric=False
) -> PreparedGraph:
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if dedup_edges:
        # a repeated edge would double-count its contribution; callers
        # whose edge list is distinct BY CONSTRUCTION (e.g. a union of
        # disjoint projections of a deduped pair table) pass False and
        # save this full-width shuffle
        e = e.distinct()
    if ckpt_edges:
        e = _ckpt(e)
    outdeg = _ckpt(e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")))
    if symmetric:
        # both directions present => distinct(src) = distinct(src ∪ dst)
        # and no node lacks an out-edge. nodes is a map-only projection
        # over the outdeg checkpoint's stored blocks — no second
        # aggregation, no checkpoint copy, no dangling structures.
        nodes = outdeg.select(F.col("src").alias("node"))
        n_nodes = nodes.count()
        dangling = nodes.where(F.lit(False))
        return PreparedGraph(e, outdeg, nodes, n_nodes, dangling, False)
    nodes = _ckpt(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # N is ONE scalar — ferried by the driver like the k-means centroid
    # counts (bounded state, no arithmetic happens driver-side)
    n_nodes = nodes.count()
    # the dangling SET is static (graph structure); only its rank mass
    # changes per iteration. Graphs with no dangling nodes skip the
    # per-iteration mass aggregate (and its broadcast) entirely.
    dangling = _ckpt(
        nodes.join(outdeg, nodes["node"] == outdeg["src"], "left_anti")
    )
    has_dangling = dangling.limit(1).count() > 0
    return PreparedGraph(e, outdeg, nodes, n_nodes, dangling, has_dangling)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iters: int = 3,
    dedup_edges: bool = True,
    checkpoint_dir: str | None = None,
    prepared: PreparedGraph | None = None,
) -> DataFrame:
    """``n_iters`` synchronous PageRank updates over a directed edge
    list; returns ``(node, rank_micro)`` for every node that appears
    as an endpoint.

    Dangling nodes (no out-edges) donate their whole rank to the
    uniform pool each iteration: ``dang div N`` is added to every
    node's inflow before damping — the standard correction, kept in
    exact integer math (one 1-row broadcast per iteration).

    ``checkpoint_dir``: when set, per-round state is truncated with
    RELIABLE checkpoints written under this path (HDFS/object storage
    on a cluster) instead of ``localCheckpoint``. Local checkpoints
    live in executor block storage, so on a real cluster losing one
    executor mid-iteration kills the job; reliable checkpoints survive
    executor loss and are the right default for any long-running
    cluster deployment. Local mode / tests can keep the default.

    Checkpoint lifecycle: ``setCheckpointDir`` is a PROCESS-GLOBAL
    SparkContext mutation; this function restores the previous
    checkpoint location before returning, so other code's
    ``checkpoint()`` calls are unaffected. Superseded per-round
    checkpoints are deleted as the loop advances (Spark never cleans
    them itself — ``cleanCheckpoints`` defaults to false); what remains
    on return is exactly the graph-structure snapshots + the final
    ranks, which the RETURNED FRAME READS FROM — delete
    ``checkpoint_dir`` only after consuming the result.
    """
    spark = edges.sparkSession
    sc = spark.sparkContext
    if prepared is not None and checkpoint_dir is not None:
        raise ValueError(
            "prepared graphs use local checkpoints; pass checkpoint_dir "
            "without prepared for the reliable-checkpoint path"
        )
    if checkpoint_dir is not None:
        prior = sc._jsc.sc().getCheckpointDir()  # scala Option[String]
        sc.setCheckpointDir(checkpoint_dir)
        _ckpt = lambda df: df.checkpoint(eager=True)  # noqa: E731
    else:
        _ckpt = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
    try:
        return _pagerank_loop(
            spark, edges, src, dst, n_iters, dedup_edges, _ckpt,
            track_files=checkpoint_dir is not None,
            prepared=prepared,
        )
    finally:
        if checkpoint_dir is not None:
            # restore the exact prior location (possibly unset). A plain
            # setCheckpointDir(prior) would nest a fresh UUID dir under
            # it, so write the field back through the scala var setter.
            getattr(sc._jsc.sc(), "checkpointDir_$eq")(prior)


def _pagerank_loop(
    spark,
    edges: DataFrame,
    src: str,
    dst: str,
    n_iters: int,
    dedup_edges: bool,
    _ckpt,
    track_files: bool = False,
    prepared: PreparedGraph | None = None,
) -> DataFrame:
    seen_dirs = _checkpoint_rdd_dirs(spark) if track_files else set()
    g = prepared if prepared is not None else _prepare(
        edges, src, dst, dedup_edges, _ckpt
    )
    e, outdeg, nodes = g.e, g.outdeg, g.nodes
    n_nodes, dangling, has_dangling = g.n_nodes, g.dangling, g.has_dangling
    if track_files:
        # graph-structure snapshots stay protected for the whole loop
        seen_dirs |= _checkpoint_rdd_dirs(spark) - seen_dirs
    live_rank_dirs: set[str] = set()
    ranks = nodes.withColumn("r", F.lit(PAGERANK_MICRO).cast("bigint"))
    for _ in range(n_iters):
        ranks = _update(
            ranks, e, outdeg, nodes, n_nodes, dangling if has_dangling else None
        )
        if has_dangling:
            # the dangling branch references ranks a second time, so the
            # plan tree would grow 2^k without materialization. Dangling-
            # free graphs reference ranks exactly once per iteration —
            # lineage stays LINEAR and the whole loop executes as one
            # deferred plan (k chained join+agg rounds, zero extra jobs).
            ranks = _ckpt(ranks)
            if track_files:
                # the previous round's rank checkpoint is superseded the
                # moment this round has materialized — delete it (Spark
                # itself never does; cleanCheckpoints defaults false)
                new_dirs = _checkpoint_rdd_dirs(spark) - seen_dirs
                seen_dirs |= new_dirs
                _delete_checkpoint_rdd_dirs(spark, live_rank_dirs)
                live_rank_dirs = new_dirs
    return ranks.select("node", F.col("r").alias("rank_micro"))


def _update(ranks, e, outdeg, nodes, n_nodes, dangling) -> DataFrame:
    inflow = (
        e.join(ranks, ranks["node"] == e["src"])
        .join(outdeg, "src")
        .select("dst", F.expr("r div deg").alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("inflow"))
    )
    out = nodes.join(inflow, nodes["node"] == inflow["dst"], "left")
    if dangling is not None:
        dang = ranks.join(dangling, "node").agg(
            F.coalesce(F.sum("r"), F.lit(0)).cast("bigint").alias("dang")
        )
        out = out.crossJoin(F.broadcast(dang))
        pool = f"(dang div {n_nodes})"
    else:
        pool = "0"
    return out.select(
        "node",
        F.expr(
            f"(({100 - DAMPING_PCT}) * {PAGERANK_MICRO} + {DAMPING_PCT}"
            f" * (coalesce(inflow, 0) + {pool})) div 100"
        ).alias("r"),
    )
