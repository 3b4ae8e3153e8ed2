"""Connected components over near-duplicate pair graphs.

The dedup family (``operators/dedup.py``, ``operators/similarity.py``)
emits verified PAIRS; a training-data pipeline needs GROUPS — "these
17 documents are one duplicate cluster, keep exactly one". That is
connected components on the pair graph, the canonical iterative step
(the reference has no iterative operator at all; this is part of the
extended surface, not a port).

Algorithm: hash-min label propagation with pointer jumping.

* propagate: every node takes the min label in its closed neighborhood
  (one shuffle per round — a groupBy over the edge list),
* pointer-jump: every node replaces its label by its label's label
  (one self-join per round), which halves chain depth,

so convergence is O(log n) rounds even on a path graph — exactly the
shape the capped LSH buckets emit for degenerate corpora
(``dedup.pair_gen_sql``). Each round is pure DataFrame ops; the only
driver-side value per round is the single convergence count
(bounded, not per-row).

Scale notes: state is (node, label) — two long columns; rounds reuse
the same hash partitioning on ``node``. Checkpointing truncates the
growing lineage so round N doesn't replay rounds 1..N-1 — local
checkpoints by default (fast, fine for local mode), reliable
checkpoints to a caller-supplied ``checkpoint_dir`` for cluster
deployments where executor loss must not kill the iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ConvergenceError(RuntimeError):
    """Raised when label propagation exceeds the round budget."""


def _checkpoint_rdd_dirs(spark: SparkSession) -> set[str]:
    """Names of the ``rdd-*`` checkpoint dirs under the context's
    current checkpoint location (empty if unset/missing)."""
    sc = spark.sparkContext
    opt = sc._jsc.sc().getCheckpointDir()
    if not opt.isDefined():
        return set()
    jvm = sc._jvm
    path = jvm.org.apache.hadoop.fs.Path(opt.get())
    fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return set()
    return {
        st.getPath().getName()
        for st in fs.listStatus(path)
        if st.getPath().getName().startswith("rdd-")
    }


def _delete_checkpoint_rdd_dirs(spark: SparkSession, names: set[str]) -> None:
    sc = spark.sparkContext
    opt = sc._jsc.sc().getCheckpointDir()
    if not opt.isDefined() or not names:
        return
    jvm = sc._jvm
    base = jvm.org.apache.hadoop.fs.Path(opt.get())
    fs = base.getFileSystem(sc._jsc.hadoopConfiguration())
    for name in names:
        fs.delete(jvm.org.apache.hadoop.fs.Path(base, name), True)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
    checkpoint_dir: str | None = None,
    driver_cap: int = 65_536,
) -> DataFrame:
    """Resolve the undirected pair graph into components.

    Returns ``(node, component)`` where ``component`` is the minimum
    node id in the node's connected component — a deterministic group
    label AND the keep-one policy (keep ``node == component``) in one.

    ``max_rounds`` bounds the loop; with pointer jumping the round
    count is O(log n) in the largest component diameter, so 25 covers
    components of ~2^25 nodes even in the worst (path-graph) shape.

    ``driver_cap``: when the MEASURED distinct-edge count is at most
    this (and ids are integral), the components are resolved with a
    driver-side min-root union-find over the collected edge list
    instead of the iterative join loop — the same measured-size gate
    the dedup exact-verify uses for its broadcast. A verified near-dup
    pair set is tiny relative to its corpus (255 pairs at bench scale),
    and the loop's per-round join+jump+checkpoint+sum cadence is pure
    scheduling floor on it; at the default cap the collect is bounded
    at ~2 MB. Larger graphs, non-integral ids (whose Python vs SQL
    ordering could diverge) and edge lists with NULL endpoints take
    the distributed loop unchanged; pass ``0`` to force it. Both paths
    produce the identical (node, min-id component) labeling — equality
    is pinned by a test and the family's hypothesis property. NOTE:
    the driver path resolves exactly, so ``max_rounds`` does not apply
    to it — ``ConvergenceError`` can only fire on the loop path (gated
    graphs at the default cap are far too small to exhaust 25 rounds
    anyway); tests that exercise the round budget must pass
    ``driver_cap=0``.

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
    on return is exactly the edge snapshot + the final labels, which
    the RETURNED FRAME READS FROM — delete ``checkpoint_dir`` only
    after consuming the result.
    """
    spark = pairs.sparkSession
    sc = spark.sparkContext
    if checkpoint_dir is not None:
        prior = sc._jsc.sc().getCheckpointDir()  # scala Option[String]
        sc.setCheckpointDir(checkpoint_dir)
        _ckpt = lambda df: df.checkpoint(eager=True)  # noqa: E731
    else:
        _ckpt = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
    try:
        return _components_loop(spark, pairs, src, dst, max_rounds, _ckpt,
                                track_files=checkpoint_dir is not None,
                                driver_cap=driver_cap)
    finally:
        if checkpoint_dir is not None:
            # restore the exact prior location (possibly unset). A plain
            # setCheckpointDir(prior) would nest a fresh UUID dir under
            # it, so write the field back through the scala var setter.
            getattr(sc._jsc.sc(), "checkpointDir_$eq")(prior)


def _driver_union_find(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Min-root union-find with path compression over a collected
    (bounded, gate-checked) edge list — bit-identical to the loop's
    min-label fixpoint: ``component`` = min node id reachable from
    ``node``, for every node appearing in any edge."""
    rows = edges.collect()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = r[0], r[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra  # min-root union => root IS the min id
    out = sorted((n, find(n)) for n in parent)
    id_type = edges.schema[0].dataType
    schema = T.StructType(
        [
            T.StructField("node", id_type, False),
            T.StructField("component", id_type, False),
        ]
    )
    return spark.createDataFrame(out, schema)


_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _components_loop(
    spark: SparkSession,
    pairs: DataFrame,
    src: str,
    dst: str,
    max_rounds: int,
    _ckpt,
    track_files: bool = False,
    driver_cap: int = 0,
) -> DataFrame:
    # both directions via ONE explode, not a union of two projections:
    # plans are trees, so the union form evaluated the pairs lineage —
    # possibly a full LSH pipeline — once PER DIRECTION inside the edge
    # checkpoint job. Same row multiset into the distinct either way.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                    F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
    )
    # materialize once: the pair graph may hang off an expensive lineage
    # (a full LSH pipeline) and every round joins against it — without
    # the checkpoint each round would recompute that lineage.
    seen_dirs = _checkpoint_rdd_dirs(spark) if track_files else set()
    edges = _ckpt(edges)
    if (
        driver_cap > 0
        and isinstance(edges.schema["a"].dataType, _INTEGRAL_TYPES)
        and isinstance(edges.schema["b"].dataType, _INTEGRAL_TYPES)
    ):
        # one aggregate over the just-checkpointed blocks (a no-scan
        # gate job, same cost as the previous bare count): the size gate
        # plus a null-endpoint probe — parquet-sourced id columns are
        # nullable in schema even when clean, and a data null would
        # TypeError inside the driver union-find's Python comparisons,
        # so dirty edges take the distributed loop, which degrades
        # gracefully on them (ADVICE-r15).
        st = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.count("a").alias("na"),
            F.count("b").alias("nb"),
        ).collect()[0]
        if st["n"] <= 2 * driver_cap and st["na"] == st["n"] == st["nb"]:
            return _driver_union_find(spark, edges)
    # initial label = own id, for every node that appears in any pair
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    if track_files:
        protected = _checkpoint_rdd_dirs(spark) - seen_dirs  # edges
        seen_dirs |= protected
    labels = _ckpt(labels)
    if track_files:
        live_label_dirs = _checkpoint_rdd_dirs(spark) - seen_dirs
        seen_dirs |= live_label_dirs

    # Convergence is detected by the label-sum invariant, not a join:
    # labels are per-node MONOTONICALLY NON-INCREASING (propagate takes
    # least(own, nbr_min); the pointer jump reads label(label) <= label
    # because every label is <= its own node id), so ANY change strictly
    # decreases the exact sum of labels. One map-side aggregate over the
    # just-materialized checkpoint replaces the old per-round
    # jumped-vs-labels join (two shuffles of the full label table per
    # round at scale; one extra job at bench scale). decimal(38,0) keeps
    # the sum exact for any bigint ids at any node count.
    prev_sum = labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]
    for _ in range(max_rounds):
        # propagate: min label over the closed neighborhood
        nbr_min = (
            edges.join(labels, edges["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        propagated = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        # pointer jump: label <- label(label), halving chain depth
        l2 = propagated.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        jumped = (
            propagated.join(l2, propagated["label"] == l2["p_node"])
            .select("node", F.col("p_label").alias("label"))
        )
        jumped = _ckpt(jumped)
        new_sum = jumped.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        changed = 0 if new_sum == prev_sum else 1
        prev_sum = new_sum
        labels = jumped
        if track_files:
            # the previous round's label checkpoint is superseded the
            # moment `changed` has been computed against it — delete it
            # (Spark itself never does; cleanCheckpoints defaults false)
            new_dirs = _checkpoint_rdd_dirs(spark) - seen_dirs
            seen_dirs |= new_dirs
            _delete_checkpoint_rdd_dirs(spark, live_label_dirs)
            live_label_dirs = new_dirs
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise ConvergenceError(
        f"connected_components did not converge in {max_rounds} rounds"
    )


def dedup_groups(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Duplicate groups with keeper selection: one row per non-singleton
    node — ``(doc_id, group_id, is_keeper, group_size)`` where
    ``group_id`` is the component minimum (the kept document).

    ``checkpoint_dir`` is forwarded to :func:`connected_components`
    so cluster deployments get reliable per-round checkpoints without
    dropping to the raw operator."""
    comp = connected_components(
        pairs, src=src, dst=dst, checkpoint_dir=checkpoint_dir
    )
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("group_id"),
        (F.col("node") == F.col("component")).alias("is_keeper"),
        F.count(F.lit(1)).over(Window.partitionBy("component")).alias("group_size"),
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    materialize_edges: bool = True,
    checkpoint_every: int = 1,
    prune_visited: bool = True,
    broadcast_frontiers: bool = False,
) -> DataFrame:
    """Multi-source BFS: ``(node, dist)`` with the MINIMUM hop count
    from any seed, bounded at ``max_hops`` levels.

    Frontier-expansion shape (the Pregel iteration as DataFrame ops):
    each round equi-joins the CURRENT frontier to the edge list, strips
    already-visited nodes with an anti-join against the accumulated
    distance table, and periodically checkpoints the (bounded,
    shrinking) frontier so lineage stays linear — the same per-round
    materialization discipline as :func:`operators.pagerank.pagerank`.
    Work per round is one shuffle join on the edge key + one anti-join
    on node; the frontier monotonically shrinks once the reachable set
    saturates (an empty CHECKPOINTED frontier short-circuits the
    remaining rounds). Nothing driver-side but the loop counter and
    the periodic empty-check — distances never leave the cluster.

    ``checkpoint_every``: checkpoint + empty-check cadence. The
    default (1, every round) is right for deep traversals — lineage
    stays one join deep and saturation stops work immediately. For a
    SHALLOW bounded sweep (hop counts of 2-4, the blast-radius query
    shape), each eager checkpoint is a full scheduler roundtrip that
    costs more than it saves: ``checkpoint_every=2`` lets two rounds
    fuse into one job, and a lazy final round rides the consumer's
    job, cutting a 3-hop sweep from 5 driver-synchronized jobs to 2.
    Skipped rounds re-derive their (bounded) frontier inside the next
    materialization; the re-derived plan is at most ``checkpoint_every``
    joins deep, so the linear-lineage guarantee degrades only by that
    constant factor.

    ``prune_visited``: when True (default), each round anti-joins the
    reached set against the accumulated distance table — the right
    shape for DEEP traversals, where frontiers shrink to nothing after
    saturation and the anti-join is what stops work. When False, the
    traversal is the min-aggregate WALK shape instead: level set
    ``L_k`` = distinct neighbors of ``L_{k-1}`` with no visited
    pruning, and ``dist = min level per node`` over the union of all
    level sets (min walk length IS the BFS distance). That drops one
    anti-join shuffle per level — for a shallow blast-radius sweep
    (2-4 hops) the anti-joins are pure overhead because nothing has
    saturated yet (interleaved same-session A/B at sf0.1, 3 hops,
    median of 4: pruned 2.4s vs walk 1.6s). NOT for deep traversals:
    without pruning the level sets stay node-count-sized forever
    instead of emptying.

    ``broadcast_frontiers`` (walk shape only): a frontier is at most
    node-count-sized — when the caller knows that bound is broadcast-
    small (e.g. one side of a bipartite graph), broadcasting the
    frontier into each level's join removes the per-level SHUFFLE of
    the (much larger) edge list: the edge artifact is only ever
    re-SCANNED, never re-partitioned, and each level's distinct
    exchanges only frontier-sized data. Same-session interleaved A/B
    at sf0.1 (3 hops, 800k-edge transaction graph, 16k-node max
    frontier, 4 trials): shuffled-walk 1.47-1.64s vs broadcast-walk
    1.04-1.14s. Leave False when frontiers can grow beyond the
    broadcast threshold (deep traversals on non-bipartite graphs).
    """
    # every round's expansion scans the edge list — materialize the
    # (possibly expensive) upstream edge derivation once, or round k
    # recomputes it k times (measured 6.4s -> 3.2s at sf0.1 on the
    # transaction graph, whose edges are a join + distinct). Callers
    # that pass an already-materialized frame (a session-memoized edge
    # artifact) opt out via materialize_edges=False.
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if materialize_edges:
        e = e.localCheckpoint(eager=True)
    if not prune_visited:
        frontier = seeds.select(F.col(node).alias("_n")).distinct()
        levels = [frontier.withColumn("_dist", F.lit(0))]
        for level in range(1, max_hops + 1):
            probe = F.broadcast(frontier) if broadcast_frontiers else frontier
            reached = probe.join(e, frontier["_n"] == e["_s"]).select(
                F.col("_d").alias("_n")
            )
            if level < max_hops or broadcast_frontiers:
                # dedup bounds the next join's fan-out. The LAST level
                # strictly needs none (the final min-aggregate dedups
                # anyway), but under broadcast_frontiers the level-local
                # distinct collapses the final fan-out to frontier size
                # BEFORE the union feeds the aggregate — measured more
                # stable (1.04-1.14s vs 1.04-1.35s spread at sf0.1)
                reached = reached.distinct()
            levels.append(reached.withColumn("_dist", F.lit(level)))
            frontier = reached
        dist = levels[0]
        for lv in levels[1:]:
            dist = dist.unionByName(lv)
        return (
            dist.groupBy("_n")
            .agg(F.min("_dist").alias("dist"))
            .select(F.col("_n").alias(node), "dist")
        )
    frontier = seeds.select(F.col(node).alias("_n")).distinct()
    if checkpoint_every == 1:
        frontier = frontier.localCheckpoint(eager=True)
    dist = frontier.withColumn("_dist", F.lit(0))
    for level in range(1, max_hops + 1):
        reached = (
            frontier.join(e, frontier["_n"] == e["_s"])
            .select(F.col("_d").alias("_n"))
            .distinct()
        )
        fresh = reached.join(dist.select("_n"), "_n", "left_anti")
        # the empty-check is one extra tiny job per checkpoint; the
        # LAST round's result needs no check (the loop ends either way)
        if level < max_hops and level % checkpoint_every == 0:
            fresh = fresh.localCheckpoint(eager=True)
            if fresh.isEmpty():
                break
        dist = dist.unionByName(fresh.withColumn("_dist", F.lit(level)))
        frontier = fresh
    return dist.select(F.col("_n").alias(node), F.col("_dist").alias("dist"))


def label_propagation_sync(
    edges: DataFrame,
    n_rounds: int,
    src: str = "src",
    dst: str = "dst",
    materialize_edges: bool = True,
) -> DataFrame:
    """SYNCHRONOUS label propagation for community detection, made
    fully deterministic: every node starts labeled with its own id;
    each round every node simultaneously adopts the most frequent
    label among its neighbors, ties broken to the SMALLEST label
    (``min(struct(-count, label))`` — one hash aggregate, no window
    sort). Returns ``(node, label)`` after exactly ``n_rounds``.

    Classic async LPA is order-dependent (visit order changes the
    result); the synchronous variant with a total tie order is a pure
    function of the graph, which is what makes it certifiable against
    a relational oracle — and, at 100 TB, what makes a re-run
    reproducible. Each round is two shuffles (edge join + per-node
    argmax) with per-round checkpoints, the connected-components /
    pagerank iteration discipline. Input edges are canonical a<b
    pairs; both directions are derived internally."""
    e = edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
    adj = e.unionByName(
        e.select(F.col("_b").alias("_a"), F.col("_a").alias("_b"))
    ).select(F.col("_a").alias("_n"), F.col("_b").alias("_nbr"))
    if materialize_edges:
        adj = adj.localCheckpoint(eager=True)
    labels = (
        adj.select(F.col("_n")).distinct()
        .withColumn("_label", F.col("_n"))
        .localCheckpoint(eager=True)
    )
    for _ in range(n_rounds):
        nbr_labels = adj.join(
            labels.withColumnRenamed("_n", "_nbr"), "_nbr"
        ).select("_n", "_label")
        best = (
            nbr_labels.groupBy("_n", "_label")
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .groupBy("_n")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("_cnt")).alias("neg"),
                        F.col("_label").alias("label"),
                    )
                ).alias("_b")
            )
            .select("_n", F.col("_b.label").alias("_label"))
        )
        # isolated nodes (none here: every node has an edge) would keep
        # their old label via a left join; the closed-world adjacency
        # guarantees every node appears in nbr_labels each round
        labels = best.localCheckpoint(eager=True)
    return labels.select(
        F.col("_n").alias("node"), F.col("_label").alias("label")
    )


def sssp_bounded(
    edges: DataFrame,
    seeds: DataFrame,
    max_rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node: str = "node",
    materialize_edges: bool = True,
) -> DataFrame:
    """Bounded Bellman-Ford: ``(node, dist)`` with the MINIMUM total
    edge weight over any path of at most ``max_rounds`` edges from the
    seed set (integer weights; unreachable nodes absent).

    The weighted counterpart of :func:`bfs_hops`: each round relaxes
    every edge out of the current distance table (one equi-join on the
    edge key), then folds candidates into the table with one
    ``groupBy(node).min`` — the synchronous Bellman-Ford step as two
    shuffles. The table is checkpointed per round so lineage stays
    linear (the :func:`operators.pagerank.pagerank` discipline); no
    distance ever reaches the driver. Unlike BFS there is no shrinking
    frontier — a node's distance can improve in any round — so every
    round relaxes the full table; ``max_rounds`` is the hop budget and
    the work bound. At 100 TB this is edges-join-nodes per round,
    partitioned by the join key; weights and distances stay BIGINT.
    """
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), F.col(weight).alias("_w")
    )
    if materialize_edges:
        e = e.localCheckpoint(eager=True)
    dist = (
        seeds.select(F.col(node).alias("_n"))
        .distinct()
        .withColumn("_dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        cand = dist.join(e, dist["_n"] == e["_s"]).select(
            F.col("_d").alias("_n"), (F.col("_dist") + F.col("_w")).alias("_dist")
        )
        new_dist = (
            dist.unionByName(cand)
            .groupBy("_n")
            .agg(F.min("_dist").alias("_dist"))
            .localCheckpoint(eager=True)
        )
        # the superseded round's localCheckpoint blocks are released by
        # the ContextCleaner once this rebind drops the last reference
        # (bounded live set: at most two round tables at once)
        dist = new_dist
    return dist.select(F.col("_n").alias(node), F.col("_dist").alias("dist"))


def triangle_counts(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    assume_canonical: bool = False,
    materialize_edges: bool = True,
) -> DataFrame:
    """Per-node triangle participation over an undirected edge list:
    ``(node, n_triangles)`` for every node in >= 1 triangle.

    Algorithm: the degree-ordered orientation (the MapReduce-era
    standard, Suri & Vassilvitskii 2011) — direct every edge from its
    lower-(degree, id) endpoint to the higher, enumerate wedges from
    each source's out-neighborhood, and close them against the
    canonical edge set. Orientation is the whole scale story: a node's
    out-degree under it is O(sqrt(m)) no matter how big its real
    degree, so the wedge fan-out is bounded by O(m^1.5) TOTAL even on
    power-law graphs — a celebrity node with 10M followers generates
    wedges from its sqrt-bounded out-list, never its full neighborhood.
    Three equi-joins + one explode + one groupBy; no driver state.

    ``assume_canonical=True`` declares the input already deduplicated
    with ``src < dst`` per row (e.g. the output of a pair-grouping
    aggregation) and skips the canonicalize+distinct shuffle.
    """
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if not assume_canonical:
        e = (
            e.select(
                F.least("a", "b").alias("a"),
                F.greatest("a", "b").alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
    # consumed by the degree count, the orientation join and the
    # wedge-closing join — materialize once (tree-shaped plans
    # would recompute the upstream edge construction per branch);
    # callers holding an already-materialized edge artifact skip the
    # second copy via materialize_edges=False
    if materialize_edges:
        e = e.localCheckpoint(eager=True)
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("degb"))
    lower_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
        # BOTH sides of the wedge self-join scan this frame; without
        # materialization each side re-runs the two degree joins
        # (2x the orientation cost, observed as the r5 perf gap)
        .localCheckpoint(eager=True)
    )
    x, y = oriented.alias("x"), oriented.alias("y")
    wedges = x.join(y, (F.col("x.src") == F.col("y.src")) & (F.col("x.dst") < F.col("y.dst"))).select(
        F.col("x.src").alias("corner"),
        F.col("x.dst").alias("d1"),
        F.col("y.dst").alias("d2"),
    )
    tri = wedges.join(
        e,
        (F.least("d1", "d2") == F.col("a"))
        & (F.greatest("d1", "d2") == F.col("b")),
    ).select("corner", "d1", "d2")
    return (
        tri.select(
            F.explode(F.array("corner", "d1", "d2")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.col("n_triangles").desc(), "node")
    )


def kcore_bounded(
    pairs: DataFrame,
    k: int,
    rounds: int,
    src: str = "id_a",
    dst: str = "id_b",
    node: str = "node",
) -> DataFrame:
    """Bounded k-core peel over an undirected edge list: after
    ``rounds`` synchronous peel rounds (drop every node whose degree
    within the current survivor set is < ``k``), return ``(node, deg)``
    with each survivor's within-core degree. Parallel/duplicate input
    edges each count toward degree (the caller deduplicates if set
    semantics are wanted — the catalog's co-occurrence artifact is
    already canonical); self-loops contribute via both symmetrized
    directions, matching the SQL replay.

    Factored out of :func:`plans.graph_surface.graph_kcore` (r15) so
    the peel is property-testable against a direct Python replay on
    hypothesis graphs; the surface entry is now a thin wrapper and the
    plan is byte-identical to the inline original. Per round: two
    equi-joins of the (fixed) symmetrized edge frame against the
    shrinking survivor set + one map-side-combinable count — no node
    ever sees more than its neighborhood. Rounds 2/4/... checkpoint
    (the BFS cadence lesson: every-round eager checkpoints are
    scheduling floor, fully-lazy plans double the join depth).
    """
    e = pairs.select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
    und = e.select(
        F.col("_a").alias("n"), F.col("_b").alias("m")
    ).unionByName(e.select(F.col("_b").alias("n"), F.col("_a").alias("m")))
    surv = und.select(F.col("n").alias("node")).distinct()
    for i in range(rounds):
        deg = (
            und.join(surv.withColumnRenamed("node", "n"), "n")
            .join(surv.withColumnRenamed("node", "m"), "m")
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        surv = deg.where(F.col("deg") >= k).select(F.col("n").alias("node"))
        if i % 2 == 1:
            surv = surv.localCheckpoint(eager=True)
    final_deg = (
        und.join(surv.withColumnRenamed("node", "n"), "n")
        .join(surv.withColumnRenamed("node", "m"), "m")
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return final_deg.select(F.col("n").alias(node), "deg")
