"""Catalog entry for integer-grid PageRank over the customer-supplier
transaction graph, with a fully-unrolled DuckDB oracle.

Fixed-iteration PageRank on the integer grid is deterministic
(operators/pagerank.py), so the oracle is the same computation
unrolled: one (dangling, inflow, update) CTE triple per iteration —
the same recipe as the k-means oracle (plans/clustering_surface.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.operators.pagerank import (
    DAMPING_PCT,
    PAGERANK_MICRO,
    pagerank,
)
from personal_health_etl_pipeline_spark.sources.tables import load_table

PR_ITERS = 3

# node encoding: supplier = suppkey * 2, customer = custkey * 2 + 1 —
# one bigint key space, parity decodes the type
_EDGES_CTE = """
pairs AS (
  SELECT DISTINCT o.o_custkey * 2 + 1 AS c_node, l.l_suppkey * 2 AS s_node
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL
  SELECT s_node AS src, c_node AS dst FROM pairs
)
"""


def _pr_ctes(n_iters: int) -> str:
    parts = [
        "outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)",
        "nodes AS (SELECT DISTINCT node FROM ("
        "SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges))",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        f"r0 AS (SELECT node, CAST({PAGERANK_MICRO} AS BIGINT) AS r FROM nodes)",
    ]
    for i in range(n_iters):
        parts.append(
            f"d{i} AS (SELECT COALESCE(SUM(r.r), 0) AS dang FROM r{i} r "
            f"LEFT JOIN outdeg o ON o.src = r.node WHERE o.src IS NULL)"
        )
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, SUM(r.r // o.deg) AS inflow "
            f"FROM edges e JOIN r{i} r ON r.node = e.src "
            f"JOIN outdeg o ON o.src = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{i + 1} AS (SELECT n.node, "
            f"CAST((({100 - DAMPING_PCT}) * {PAGERANK_MICRO} + {DAMPING_PCT} * "
            f"(COALESCE(c.inflow, 0) + (SELECT dang FROM d{i}) "
            f"// (SELECT n FROM nn))) // 100 AS BIGINT) AS r "
            f"FROM nodes n LEFT JOIN c{i} c USING (node))"
        )
    return ",\n".join(parts)


_PR_GRAPH_MEMO: dict = {}


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite customer-supplier graph (an edge
    per distinct trading relationship, both directions): which
    entities anchor the transaction network. 3 synchronous iterations
    on the integer grid — see ``operators/pagerank.py`` for why
    integer micro-units make distributed PageRank oracle-certifiable
    at all."""
    # the SAME bipartite edge list as every other transaction-graph
    # entry — take the session-memoized checkpointed artifact instead
    # of re-deriving the lineitem-orders join + distinct (r15: the
    # duplicate build cost ~2.5 s of the pagerank-structure artifact;
    # edges are distinct by construction — `pairs` is deduped and the
    # two directions live in disjoint odd->even / even->odd key spaces)
    edges = _txn_edges(spark, sf_dir)
    # The graph STRUCTURE (edges/degrees/nodes/dangling) is the static
    # per-corpus artifact — memoized per session; iterations (the
    # actual computation) run per call against it.
    from personal_health_etl_pipeline_spark.operators.pagerank import (
        prepare_graph,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    g = _PR_GRAPH_MEMO.get(key)
    if g is None:
        # checkpoint_edges=False: the artifact frame IS a checkpoint.
        # symmetric=True: _txn_edges emits BOTH directions of every
        # distinct trading pair, so the node set equals distinct(src)
        # (already computed by the out-degree aggregate) and no node is
        # dangling — prepare skips the union+distinct node shuffle, the
        # dangling anti-join checkpoint and its probe count (r15: the
        # three together were ~40% of the pagerank-structure build).
        g = prepare_graph(
            edges, dedup_edges=False, checkpoint_edges=False, symmetric=True
        )
        _PR_GRAPH_MEMO[key] = g
    ranked = pagerank(edges, n_iters=PR_ITERS, dedup_edges=False, prepared=g)
    return ranked.select(
        F.when(F.col("node") % 2 == 0, F.lit("supplier"))
        .otherwise(F.lit("customer"))
        .alias("node_type"),
        F.expr("node div 2").alias("key"),
        "rank_micro",
    ).orderBy(F.col("rank_micro").desc(), "node_type", "key")


GRAPH_PAGERANK_ORACLE = rf"""
WITH {_EDGES_CTE},
{_pr_ctes(PR_ITERS)}
SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'customer' END AS node_type,
       node // 2 AS key,
       r AS rank_micro
FROM r{PR_ITERS}
ORDER BY rank_micro DESC, node_type, key
"""


# --- multi-source BFS over the transaction graph -----------------------

BFS_MAX_HOPS = 3
BFS_SEED_MOD = 25
BFS_SEED_RES = 3


_TXN_EDGES_MEMO: dict = {}


def _txn_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bipartite transaction edge list, materialized once per
    (session, corpus) — the same static-structure artifact discipline
    as ``_PR_GRAPH_MEMO``: graph STRUCTURE is built once, traversals
    run per call against it."""
    key = (spark.sparkContext.applicationId, sf_dir)
    memo = _TXN_EDGES_MEMO.get(key)
    if memo is not None:
        return memo
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2 + 1).alias("c_node"),
            (F.col("l_suppkey") * 2).alias("s_node"),
        )
        .distinct()
    )
    # both directions via ONE explode above the distinct, not a union of
    # two projections: Spark plans are trees, so the union form re-ran
    # the whole lineitem⋈orders join + distinct exchange once PER SIDE
    # (r15: 2 scans + 2 joins + 2 exchanges in the checkpoint job).
    # Same edge set, one pass; the fan-out sits above the shuffle.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("c_node").alias("src"),
                        F.col("s_node").alias("dst"),
                    ),
                    F.struct(
                        F.col("s_node").alias("src"),
                        F.col("c_node").alias("dst"),
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .localCheckpoint(eager=True)
    )
    _TXN_EDGES_MEMO[key] = edges
    return edges


def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest hop distance from a seed set of suppliers
    (``s_suppkey % 25 == 3``) to every node of the bipartite
    customer-supplier graph, bounded at 3 hops — the reachability /
    blast-radius primitive (``operators/graph.py:bfs_hops``). BFS
    level IS the minimum distance, so the oracle can recompute it as a
    depth-bounded recursive traversal and take MIN per node: hash
    equality certifies the frontier/anti-join bookkeeping loses no
    node and never revisits one at a longer distance. The edge list is
    the session-memoized structure artifact (:func:`_txn_edges`)."""
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    seeds = supp.where(
        F.col("s_suppkey") % BFS_SEED_MOD == BFS_SEED_RES
    ).select((F.col("s_suppkey") * 2).alias("node"))
    from personal_health_etl_pipeline_spark.operators.graph import bfs_hops

    d = bfs_hops(
        _txn_edges(spark, sf_dir),
        seeds,
        max_hops=BFS_MAX_HOPS,
        materialize_edges=False,
        # 3-hop sweep over the memoized edge artifact: per-round
        # checkpoints are pure scheduling floor here (see bfs_hops);
        # cadence >= max_hops fuses the whole sweep into ONE job
        # (A/B at sf0.1: 1.16s lazy vs 1.31s every-2 vs 1.95s every-1)
        checkpoint_every=BFS_MAX_HOPS,
        # shallow bounded sweep: the min-aggregate walk shape drops the
        # per-level visited anti-joins — exactly the oracle's UNION
        # recursion + MIN(dist) semantics (see bfs_hops docstring)
        prune_visited=False,
        # bipartite graph: every frontier is bounded by one side's node
        # count (~16k at sf0.1) — broadcast it so the 800k-edge
        # artifact is scanned, never shuffled, per level (r9 A/B:
        # 1.47-1.64s shuffled walk -> 1.04-1.14s broadcast walk)
        broadcast_frontiers=True,
    )
    return d.select(
        F.when(F.col("node") % 2 == 0, F.lit("supplier"))
        .otherwise(F.lit("customer"))
        .alias("node_type"),
        F.expr("node div 2").alias("key"),
        "dist",
    ).orderBy("dist", "node_type", "key")


# UNION (not UNION ALL) in the recursive CTE: DuckDB's recursive UNION
# feeds each iteration only the rows NOT seen before, so the working
# set is bounded by (nodes x levels) pairs, never path enumeration —
# the dense transaction graph would make UNION ALL combinatorial.
GRAPH_BFS_ORACLE = rf"""
WITH RECURSIVE {_EDGES_CTE},
walk(node, dist) AS (
  SELECT DISTINCT s_suppkey * 2 AS node, 0 AS dist
  FROM supplier WHERE s_suppkey % {BFS_SEED_MOD} = {BFS_SEED_RES}
  UNION
  SELECT e.dst AS node, w.dist + 1 AS dist
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.dist < {BFS_MAX_HOPS}
)
SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'customer' END AS node_type,
       node // 2 AS key,
       MIN(dist) AS dist
FROM walk GROUP BY node
ORDER BY dist, node_type, key
"""


# --- triangle counting over the part co-occurrence graph ---------------

TRI_MIN_ORDERS = 2


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle participation in the co-occurrence graph:
    parts are connected when they appear together in >= 2 orders
    (the support threshold keeps the graph at genuine-affinity edges
    instead of one-off baskets). Triangles are the smallest cohesion
    motif — the engine-side primitive behind clustering-coefficient /
    community features. Degree-ordered orientation bounds the wedge
    fan-out at O(m^1.5) regardless of skew (``operators/graph.py:
    triangle_counts``); the oracle certifies the counts via the
    id-canonical 3-way self-join, so the hash equality also proves the
    orientation trick loses/duplicates nothing."""
    from personal_health_etl_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    # the pair groupBy emits deduplicated id_a < id_b edges; the memo
    # frame is already a checkpoint, so the operator skips its own copy
    return triangle_counts(
        _cooc_edges(spark, sf_dir),
        assume_canonical=True,
        materialize_edges=False,
    )


_COOC_EDGES_MEMO: dict = {}


def _cooc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part co-occurrence edges (support >= TRI_MIN_ORDERS), built as a
    BASKET aggregation (r6; was a self-join on l_orderkey): collect
    each order's distinct sorted part set and emit its pairs inline —
    two shuffles (by order, then by pair) instead of
    distinct + self-join + groupBy, with fan-out bounded by basket size
    squared (TPC-H baskets are <= 7 lines; a retail basket is dozens —
    never the self-join's quadratic-in-matches shuffle). Semantics:
    DISTINCT parts per order, a < b pairs. Materialized once per
    (session, corpus) — graph STRUCTURE is the static artifact, the
    traversal runs per call (`_txn_edges` / `_PR_GRAPH_MEMO`
    discipline)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    memo = _COOC_EDGES_MEMO.get(key)
    if memo is not None:
        return memo
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .where(F.size("ps") > 1)
    )
    pair_expr = (
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps) - i - 1), "
        "y -> struct(x AS id_a, y AS id_b))))"
    )
    edges = (
        baskets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= TRI_MIN_ORDERS)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    _COOC_EDGES_MEMO[key] = edges
    return edges


GRAPH_TRIANGLES_ORACLE = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {TRI_MIN_ORDERS}
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM edges e1
  JOIN edges e2 ON e2.a = e1.b
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT node, COUNT(*) AS n_triangles
FROM corners GROUP BY node
ORDER BY n_triangles DESC, node
"""


# --- common-neighbor (Jaccard) node similarity --------------------------

JACC_MIN_COMMON = 1


def graph_jaccard_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node-pair similarity by shared neighborhood over the part
    co-occurrence graph: Jaccard(u, v) = |N(u) ∩ N(v)| / |N(u) ∪ N(v)|
    — the link-prediction / substitute-detection primitive next to
    ``graph_triangles``' cohesion motif. Reuses the memoized
    ``_cooc_edges`` artifact, then counts common neighbors with the
    same basket shape as the edge build itself: collect each center's
    sorted neighbor set, emit its (u < v) pairs inline, ONE pair
    groupBy — never an adjacency self-join whose shuffle is quadratic
    in matches. Hub fan-out is quadratic in degree, which is inherent
    to exact common-neighbor counting; the support threshold on the
    edge artifact is what bounds degrees here (a production corpus
    would raise it, not switch shapes). Every wedge pair is kept
    (min common = 1): the support-thresholded graph is sparse enough
    that the candidate set IS the wedge set, and at sf0.1 no pair
    reaches 2 shared neighbors — a higher floor would certify an
    empty frame. The Jaccard double is one IEEE division of two
    exact BIGINTs. Registered in the catalog TAIL (r7 certification
    window)."""
    edges = _cooc_edges(spark, sf_dir)
    adj = edges.select(
        F.col("id_a").alias("node"), F.col("id_b").alias("nbr")
    ).unionByName(
        edges.select(F.col("id_b").alias("node"), F.col("id_a").alias("nbr"))
    )
    nbr_sets = adj.groupBy("node").agg(
        F.array_sort(F.collect_list("nbr")).alias("ns")
    )
    pair_expr = (
        "flatten(transform(ns, (x, i) -> "
        "transform(slice(ns, i + 2, size(ns) - i - 1), "
        "y -> struct(x AS u, y AS v))))"
    )
    common = (
        nbr_sets.where(F.size("ns") > 1)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= JACC_MIN_COMMON)
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    return (
        common.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("deg", "deg_u")
        .join(deg.withColumnRenamed("node", "v"), "v")
        .withColumnRenamed("deg", "deg_v")
        .select(
            "u",
            "v",
            "n_common",
            "deg_u",
            "deg_v",
            (
                F.col("n_common").cast("double")
                / (
                    F.col("deg_u") + F.col("deg_v") - F.col("n_common")
                ).cast("double")
            ).alias("jaccard"),
        )
        .orderBy("u", "v")
    )


GRAPH_JACCARD_ORACLE = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {TRI_MIN_ORDERS}
),
adj AS (
  SELECT a AS node, b AS nbr FROM edges
  UNION ALL SELECT b, a FROM edges
),
common AS (
  SELECT x.nbr AS u, y.nbr AS v, COUNT(*) AS n_common
  FROM adj x JOIN adj y ON x.node = y.node AND x.nbr < y.nbr
  GROUP BY 1, 2 HAVING COUNT(*) >= {JACC_MIN_COMMON}
),
deg AS (SELECT node, COUNT(*) AS deg FROM adj GROUP BY 1)
SELECT c.u, c.v, c.n_common,
       du.deg AS deg_u, dv.deg AS deg_v,
       CAST(c.n_common AS DOUBLE)
         / CAST(du.deg + dv.deg - c.n_common AS DOUBLE) AS jaccard
FROM common c
JOIN deg du ON du.node = c.u
JOIN deg dv ON dv.node = c.v
ORDER BY c.u, c.v
"""


# --- bounded weighted shortest paths (Bellman-Ford) ---------------------

SSSP_ROUNDS = 3
_WEIGHTED_EDGES_MEMO: dict = {}


def _weighted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transaction edges with an integer COST per trading relationship:
    ``greatest(1, 4 - n_orders)`` — pairs that traded >= 3 orders cost
    1, two orders cost 2, one-off pairs cost 3 — so the shortest path
    prefers habitual relationships. Same session-memoized structure
    discipline as ``_txn_edges``; the weight derivation (count DISTINCT
    orders per pair) is part of the artifact."""
    key = (spark.sparkContext.applicationId, sf_dir)
    memo = _WEIGHTED_EDGES_MEMO.get(key)
    if memo is not None:
        return memo
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            (F.col("o_custkey") * 2 + 1).alias("c_node"),
            (F.col("l_suppkey") * 2).alias("s_node"),
        )
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
        .select(
            "c_node",
            "s_node",
            F.greatest(F.lit(1), F.lit(4) - F.col("n_orders")).alias("w"),
        )
    )
    # one explode, not a union of two projections — the union form ran
    # the join + countDistinct aggregation once per direction (same
    # duplicated-subtree fix as _txn_edges)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("c_node").alias("src"),
                        F.col("s_node").alias("dst"),
                        F.col("w"),
                    ),
                    F.struct(
                        F.col("s_node").alias("src"),
                        F.col("c_node").alias("dst"),
                        F.col("w"),
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst", "e.w")
        .localCheckpoint(eager=True)
    )
    _WEIGHTED_EDGES_MEMO[key] = edges
    return edges


def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest-path cost from the BFS seed suppliers to every node,
    bounded at ``SSSP_ROUNDS`` edges — weighted reachability
    (``operators/graph.py:sssp_bounded``), the trust/propagation-cost
    primitive next to ``graph_bfs_hops``' hop count. Bellman-Ford's
    round-k table IS "min cost over paths of <= k edges", so the
    oracle recomputes it as a depth-bounded recursive walk with MIN
    per node: hash equality certifies the relax-then-fold rounds
    neither lose an improvement nor apply one round too many.
    Registered in the catalog TAIL (r7 certification window)."""
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    seeds = supp.where(
        F.col("s_suppkey") % BFS_SEED_MOD == BFS_SEED_RES
    ).select((F.col("s_suppkey") * 2).alias("node"))
    from personal_health_etl_pipeline_spark.operators.graph import sssp_bounded

    d = sssp_bounded(
        _weighted_edges(spark, sf_dir),
        seeds,
        max_rounds=SSSP_ROUNDS,
        materialize_edges=False,
    )
    return d.select(
        F.when(F.col("node") % 2 == 0, F.lit("supplier"))
        .otherwise(F.lit("customer"))
        .alias("node_type"),
        F.expr("node div 2").alias("key"),
        F.col("dist").alias("min_cost"),
    ).orderBy("min_cost", "node_type", "key")


# UNION (not UNION ALL) bounds the recursive working set at distinct
# (node, cost, hops) triples; costs are small integers so the variety
# per node is bounded and MIN per node reproduces the Bellman-Ford
# round-SSSP_ROUNDS table exactly.
GRAPH_SSSP_ORACLE = rf"""
WITH RECURSIVE wpairs AS (
  SELECT o.o_custkey * 2 + 1 AS c_node, l.l_suppkey * 2 AS s_node,
         greatest(1, 4 - COUNT(DISTINCT l.l_orderkey)) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
wedges AS (
  SELECT c_node AS src, s_node AS dst, w FROM wpairs
  UNION ALL
  SELECT s_node AS src, c_node AS dst, w FROM wpairs
),
walk(node, cost, hops) AS (
  SELECT DISTINCT s_suppkey * 2 AS node, CAST(0 AS BIGINT) AS cost, 0 AS hops
  FROM supplier WHERE s_suppkey % {BFS_SEED_MOD} = {BFS_SEED_RES}
  UNION
  SELECT e.dst AS node, w.cost + e.w AS cost, w.hops + 1 AS hops
  FROM walk w JOIN wedges e ON e.src = w.node
  WHERE w.hops < {SSSP_ROUNDS}
)
SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'customer' END AS node_type,
       node // 2 AS key,
       CAST(MIN(cost) AS BIGINT) AS min_cost
FROM walk GROUP BY node
ORDER BY min_cost, node_type, key
"""


# --- synchronous label propagation (community detection) -----------------

LPA_ROUNDS = 2


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the part co-occurrence graph:
    ``LPA_ROUNDS`` synchronous label-propagation rounds
    (``operators/graph.py:label_propagation_sync``) — every node
    simultaneously adopts its neighborhood's most frequent label, ties
    to the smallest. Sync + total tie order makes the result a pure
    function of the graph (async LPA is visit-order-dependent — not
    reproducible, not certifiable), so the oracle is the same two
    rounds unrolled relationally and the hash gate proves the
    per-round argmax aggregates lose nothing. Reuses the memoized
    ``_cooc_edges`` structure artifact. Registered in the catalog
    TAIL (r7 certification window)."""
    from personal_health_etl_pipeline_spark.operators.graph import (
        label_propagation_sync,
    )

    labels = label_propagation_sync(
        _cooc_edges(spark, sf_dir),
        n_rounds=LPA_ROUNDS,
        src="id_a",
        dst="id_b",
        materialize_edges=False,
    )
    return labels.select(
        F.col("node").alias("part_id"), F.col("label").alias("community")
    ).orderBy("part_id")


def _lpa_round_ctes(n_rounds: int) -> str:
    parts = [
        "adj AS (SELECT a AS n, b AS nbr FROM edges "
        "UNION ALL SELECT b, a FROM edges)",
        "l0 AS (SELECT DISTINCT n AS node, n AS label FROM adj)",
    ]
    for i in range(n_rounds):
        parts.append(
            f"c{i} AS (SELECT a.n AS node, l.label, COUNT(*) AS cnt "
            f"FROM adj a JOIN l{i} l ON l.node = a.nbr GROUP BY 1, 2)"
        )
        parts.append(
            f"l{i + 1} AS (SELECT node, label FROM ("
            f"SELECT node, label, row_number() OVER (PARTITION BY node "
            f"ORDER BY cnt DESC, label) AS rn FROM c{i}) WHERE rn = 1)"
        )
    return ",\n".join(parts)


GRAPH_LPA_ORACLE = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {TRI_MIN_ORDERS}
),
{_lpa_round_ctes(LPA_ROUNDS)}
SELECT node AS part_id, label AS community
FROM l{LPA_ROUNDS} ORDER BY part_id
"""


# --- k-core decomposition (bounded peeling) ----------------------------

KCORE_K = 3
KCORE_ROUNDS = 4


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {KCORE_K}-core of the part co-occurrence graph: repeatedly
    peel nodes of degree < {KCORE_K} (4 fixed rounds — the
    bounded-round discipline of every iterative entry here; production
    loops to convergence with the same per-round plan), then report
    each survivor's within-core degree. k-cores are the standard
    dense-region primitive (spam rings, power users, fraud cliques).
    The co-occurrence graph is the right substrate: its degrees are
    homogeneous (1-13 at sf0.01), so peeling CASCADES — removing a
    part lowers its neighbors below k in later rounds — unlike the
    bimodal bipartite transaction graph, where no k separates the two
    modes' degree ranges.

    The peel itself lives in :func:`operators.graph.kcore_bounded`
    (factored out in r15 so hypothesis properties drive the engine
    code, not a test-local replica; plan unchanged — see its docstring
    for the per-round scale shape). The edge list is the
    session-memoized structure artifact (:func:`_cooc_edges`)."""
    from personal_health_etl_pipeline_spark.operators.graph import (
        kcore_bounded,
    )

    return kcore_bounded(
        _cooc_edges(spark, sf_dir),
        k=KCORE_K,
        rounds=KCORE_ROUNDS,
        node="part_id",
    ).orderBy("part_id")


def _kcore_ctes(k: int, n_rounds: int) -> str:
    parts = [
        "und AS (SELECT a AS n, b AS m FROM edges"
        " UNION ALL SELECT b, a FROM edges)",
        "surv0 AS (SELECT DISTINCT n AS node FROM und)",
    ]
    for i in range(n_rounds):
        parts.append(
            f"deg{i} AS (SELECT e.n AS node, COUNT(*) AS deg FROM und e"
            f" JOIN surv{i} a ON e.n = a.node"
            f" JOIN surv{i} b ON e.m = b.node GROUP BY e.n)"
        )
        parts.append(
            f"surv{i + 1} AS (SELECT node FROM deg{i} WHERE deg >= {k})"
        )
    parts.append(
        f"degf AS (SELECT e.n AS node, COUNT(*) AS deg FROM und e"
        f" JOIN surv{n_rounds} a ON e.n = a.node"
        f" JOIN surv{n_rounds} b ON e.m = b.node GROUP BY e.n)"
    )
    return ",\n".join(parts)


GRAPH_KCORE_ORACLE = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {TRI_MIN_ORDERS}
),
{_kcore_ctes(KCORE_K, KCORE_ROUNDS)}
SELECT node AS part_id, deg FROM degf ORDER BY part_id
"""
