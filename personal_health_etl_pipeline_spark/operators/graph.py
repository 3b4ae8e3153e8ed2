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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Raised when label propagation exceeds the round budget."""


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Resolve the undirected pair graph into components.

    Returns ``(node, component)`` where ``component`` is the minimum
    node id in the node's connected component — a deterministic group
    label AND the keep-one policy (keep ``node == component``) in one.

    ``max_rounds`` bounds the loop; with pointer jumping the round
    count is O(log n) in the largest component diameter, so 25 covers
    components of ~2^25 nodes even in the worst (path-graph) shape.

    ``checkpoint_dir``: when set, per-round state is truncated with
    RELIABLE checkpoints written under this path (HDFS/object storage
    on a cluster) instead of ``localCheckpoint``. Local checkpoints
    live in executor block storage, so on a real cluster losing one
    executor mid-iteration kills the job; reliable checkpoints survive
    executor loss and are the right default for any long-running
    cluster deployment. Local mode / tests can keep the default.
    """
    spark = pairs.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
        _ckpt = lambda df: df.checkpoint(eager=True)  # noqa: E731
    else:
        _ckpt = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    # materialize once: the pair graph may hang off an expensive lineage
    # (a full LSH pipeline) and every round joins against it — without
    # the checkpoint each round would recompute that lineage.
    edges = _ckpt(edges)
    # initial label = own id, for every node that appears in any pair
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    labels = _ckpt(labels)

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
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise ConvergenceError(
        f"connected_components did not converge in {max_rounds} rounds"
    )


def dedup_groups(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Duplicate groups with keeper selection: one row per non-singleton
    node — ``(doc_id, group_id, is_keeper, group_size)`` where
    ``group_id`` is the component minimum (the kept document)."""
    comp = connected_components(pairs, src=src, dst=dst)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("group_id"),
        (F.col("node") == F.col("component")).alias("is_keeper"),
        F.count(F.lit(1)).over(Window.partitionBy("component")).alias("group_size"),
    )
