"""Sketch QUALITY gates: a deterministic sketch whose oracle mirrors
the construction is certified reproducible, not certified good — these
tests measure each sketch against exact ground truth.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.plans.sketches import (
    CM_WIDTH,
    sketch_countmin_heavy,
    sketch_sample_quantiles,
)
from personal_health_etl_pipeline_spark.sources.tables import load_table


class TestSampleQuantiles:
    def test_within_tolerance_of_exact(self, spark, sf_dir):
        est = {
            r.q_pct: r.value
            for r in sketch_sample_quantiles(spark, sf_dir).collect()
        }
        li = load_table(spark, sf_dir, "lineitem")
        qs = sorted(est)
        exact = li.agg(
            F.percentile_approx(
                "l_extendedprice", [q / 100 for q in qs], 100000
            ).alias("p")
        ).first().p
        for q, ex in zip(qs, exact):
            rel = abs(est[q] - ex) / ex
            # 1024-row uniform sample: a few percent of relative error
            assert rel < 0.1, f"q{q}: sample {est[q]} vs exact {ex} ({rel:.2%})"

    def test_monotone_and_complete(self, spark, sf_dir):
        rows = sketch_sample_quantiles(spark, sf_dir).collect()
        assert [r.q_pct for r in rows] == [25, 50, 75, 90, 99]
        vals = [r.value for r in rows]
        assert vals == sorted(vals)


class TestCountMin:
    def test_never_undercounts_and_bounded_overcount(self, spark, sf_dir):
        rows = sketch_countmin_heavy(spark, sf_dir).collect()
        assert len(rows) == 20
        docs = load_table(spark, sf_dir, "documents")
        n_tokens = docs.select(
            F.sum(F.size(F.split("text", r"\s+"))).alias("n")
        ).first().n
        for r in rows:
            assert r.est_count >= r.true_count  # CM is one-sided
            # classic bound: overcount <= ~2N/W with prob; depth-4 min
            # tightens it — allow 3N/W slack deterministically
            assert r.est_count - r.true_count <= 3 * n_tokens / CM_WIDTH, (
                f"{r.term}: est {r.est_count} vs true {r.true_count}"
            )


class TestBigramLogprob:
    def test_fluent_text_outscores_word_salad(self, spark, tmp_path):
        """The corpus-LM score must separate repeated natural phrasing
        (bigrams shared across the corpus) from one-off token salad."""
        from personal_health_etl_pipeline_spark.plans.llm_surface2 import (
            text_bigram_logprob,
        )

        rows = [
            (i, "the cat sat on the mat and the dog sat on the rug", "en", "w", 0)
            for i in range(20)
        ]
        rows.append((99, "zq glarp wibble fnord quux blorch snarf plugh", "en", "w", 0))
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(str(tmp_path / "documents.parquet"))
        out = {
            r.doc_id: r.avg_lp_micro
            for r in text_bigram_logprob(spark, str(tmp_path)).collect()
        }
        fluent = sum(v for k, v in out.items() if k != 99) / 20
        assert out[99] < fluent, (out[99], fluent)


def test_kmv_set_ops_partial_overlap(spark):
    """A=users 0..99, B=users 50..149: union 150, intersection 50.
    With k=64 the estimator path engages; estimates must land within
    the KMV error envelope (~1/sqrt(k) ~ 12.5%, allow 3x)."""
    import datetime as dt
    import tempfile

    from personal_health_etl_pipeline_spark.plans.sketches import (
        sketch_kmv_set_ops,
    )

    root = tempfile.mkdtemp(prefix="kmvso_")
    rows = []
    eid = 0
    for u in range(100):
        rows.append((eid, dt.datetime(2024, 1, 1), u, "a", 1.0, "{}")); eid += 1
    for u in range(50, 150):
        rows.append((eid, dt.datetime(2024, 1, 1), u, "b", 1.0, "{}")); eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{root}/events.parquet")
    out = sketch_kmv_set_ops(spark, root).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.ta, r.tb) == ("a", "b")
    assert r.exact_union == 150 and r.exact_inter == 50
    assert abs(r.est_union - 150) <= 0.375 * 150
    assert abs(r.est_inter - 50) <= 0.375 * 150  # error scales with union
