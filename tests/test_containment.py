"""Directed containment dedup (operators/dedup.py:ngram_containment_pairs)."""

from __future__ import annotations

from personal_health_etl_pipeline_spark.operators.dedup import (
    ngram_containment_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


BASE = "the quick brown fox jumps over the lazy dog near the old river bank"


def test_quote_inside_larger_doc_is_caught(spark):
    """A doc fully quoted inside a much larger one: containment 1.0 in
    the sub->super direction, not the reverse."""
    filler = " ".join(f"tok{i}a tok{i}b tok{i}c" for i in range(40))
    docs = _docs(spark, [(1, BASE), (2, filler + " " + BASE + " " + filler)])
    out = {(r.id_sub, r.id_super): r.containment
           for r in ngram_containment_pairs(docs, "doc_id", "text").collect()}
    assert out.get((1, 2)) == 1.0
    assert (2, 1) not in out  # the big doc is NOT contained in the quote


def test_jaccard_would_miss_this_pair(spark):
    """The same pair scores far below any usable Jaccard threshold —
    the reason containment exists as a separate operator."""
    from personal_health_etl_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    filler = " ".join(f"tok{i}a tok{i}b tok{i}c" for i in range(40))
    docs = _docs(spark, [(1, BASE), (2, filler + " " + BASE + " " + filler)])
    jac = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    assert jac == []


def test_unrelated_docs_no_pairs(spark):
    docs = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta"),
                         (2, "one two three four five six seven")])
    assert ngram_containment_pairs(docs, "doc_id", "text").count() == 0


def test_threshold_filters_partial_overlap(spark):
    """Half-overlapping docs pass at 0.4 but not at 0.9."""
    a = "w1 w2 w3 w4 w5 w6 w7 w8"            # 6 shingles
    b = "w1 w2 w3 w4 w5 x1 x2 x3 x4 x5"      # shares shingles from the w-prefix
    docs = _docs(spark, [(1, a), (2, b)])
    hi = ngram_containment_pairs(docs, "doc_id", "text", threshold=0.9).collect()
    lo = ngram_containment_pairs(docs, "doc_id", "text", threshold=0.4).collect()
    assert hi == []
    assert len(lo) >= 1
