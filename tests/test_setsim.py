"""Exact set-similarity prefix join (operators/dedup.py:
setsim_prefix_pairs): the zero-false-negative contract vs brute force,
prefix-length arithmetic, and the no-cartesian plan shape."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.operators.dedup import (
    setsim_prefix_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _brute_pairs(rows, n=3, t=(4, 5)):
    """Driver-side exact Jaccard >= t over distinct n-shingle sets."""
    sets = {}
    for doc_id, text in rows:
        toks = [x for x in text.split() if x]
        sh = {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }
        if sh:
            sets[doc_id] = sh
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if t[1] * inter >= t[0] * union:
            out[(a, b)] = round(inter / union, 4)
    return out


def test_exactly_matches_brute_force_on_neardup_corpus(spark):
    """Synthetic corpus with planted near-dups, edits and unrelated
    docs: the prefix join must return EXACTLY the brute-force pair
    set — the no-false-negatives (and no-false-positives) contract
    LSH cannot make."""
    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    base_docs = []
    for d in range(12):
        words = [rng.choice(vocab) for _ in range(30)]
        base_docs.append(words)
        rows.append((d, " ".join(words)))
    # planted near-dups: copy with 0-2 token edits
    for i, d in enumerate(range(100, 106)):
        words = list(base_docs[i])
        for _ in range(i % 3):
            words[rng.randrange(len(words))] = rng.choice(vocab)
        rows.append((d, " ".join(words)))
    got = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in setsim_prefix_pairs(_docs(spark, rows)).collect()
    }
    assert got == _brute_pairs(rows)
    assert got  # the planted dups must actually produce pairs


def test_identical_and_disjoint_edges(spark):
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g h"),  # identical -> 1.0
        (3, "p q r s t u v w"),  # disjoint -> absent
    ]
    got = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in setsim_prefix_pairs(_docs(spark, rows)).collect()
    }
    assert got == {(1, 2): 1.0}


def test_threshold_is_integer_exact_at_boundary(spark):
    """A pair engineered to land EXACTLY on J = 4/5 must be kept: the
    accept test is den*shared >= num*union, never a float compare."""
    # sets of shingles: construct via shared 3-token runs
    # doc1: 10 shingles, doc2 shares 8 of them, union 12 -> 8/12 < 0.8;
    # easier: identical doc plus one EXTRA trailing token ->
    # shared = n1, union = n1 + 1 ... pick n1 = 4 -> 4/5 exactly
    t1 = "x1 x2 x3 x4 x5 x6"  # 4 shingles
    t2 = t1 + " x7"  # 5 shingles, shares all 4 -> J = 4/(4+5-4) = 4/5
    got = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in setsim_prefix_pairs(_docs(spark, [(1, t1), (2, t2)])).collect()
    }
    assert got == {(1, 2): 0.8}


def test_positional_filter_is_lossless(spark):
    """The PPJoin positional filter only cuts CANDIDATES — the verified
    pair set must be byte-identical with it on and off (and both equal
    brute force). The neardup corpus exercises misaligned prefix
    positions, which is exactly what the filter prunes on."""
    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(10):
        words = [rng.choice(vocab) for _ in range(25)]
        rows.append((d, " ".join(words)))
        # two mutated copies per base doc at varying edit distance
        for j in range(2):
            m = list(words)
            for _ in range(j + d % 3):
                m[rng.randrange(len(m))] = rng.choice(vocab)
            rows.append((100 + 10 * d + j, " ".join(m)))
    frame = _docs(spark, rows)
    on = sorted(
        map(tuple, setsim_prefix_pairs(frame, positional_filter=True).collect())
    )
    off = sorted(
        map(tuple, setsim_prefix_pairs(frame, positional_filter=False).collect())
    )
    assert on == off
    assert {(a, b): s for a, b, s in on} == _brute_pairs(rows)
    assert on  # the planted dups must actually produce pairs


def test_plan_has_no_cartesian(spark, sf_dir):
    from personal_health_etl_pipeline_spark.sources.tables import load_table

    df = setsim_prefix_pairs(load_table(spark, sf_dir, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
