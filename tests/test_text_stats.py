"""PMI collocations and Zipf slope (llm_surface2 text extensions).

The catalog entries are hash-verified against DuckDB; these tests check
the STATISTICS mean what they claim on constructed corpora."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.functions import text as T
from personal_health_etl_pipeline_spark.plans.llm_surface2 import (
    PMI_MIN_COUNT,
    ZIPF_SCALE,
)


def _pmi(spark, docs_rows):
    """Run the PMI body over an in-memory (doc_id, text) corpus by
    monkey-free recomputation: same formula as text_pmi_top_pairs."""
    docs = spark.createDataFrame(docs_rows, "doc_id bigint, text string")
    bg = (
        docs.select(T.tokens("text").alias("t"))
        .where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
                    " (x, y) -> struct(x AS a, y AS b))"
                )
            ).alias("s")
        )
        .select("s.a", "s.b")
    )
    cnt_ab = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    cnt_a = cnt_ab.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    cnt_b = cnt_ab.groupBy("b").agg(F.sum("c_ab").alias("c_b"))
    total = cnt_ab.agg(F.sum("c_ab").alias("n"))
    return (
        cnt_ab.where(F.col("c_ab") >= PMI_MIN_COUNT)
        .join(cnt_a, "a")
        .join(cnt_b, "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            (
                F.log(
                    F.col("c_ab").cast("double") * F.col("n").cast("double")
                    / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
                )
            ).alias("pmi"),
        )
    )


class TestPmi:
    def test_bound_pair_beats_independent_pair(self, spark):
        """'san francisco' always co-occurs; filler words pair freely.
        PMI must rank the bound collocation far above the filler."""
        fillers = ["the", "a", "of", "and"]
        texts = [(i, "san francisco") for i in range(20)]
        # filler pairs drawn from the full product, 5 docs each — every
        # filler co-occurs with every other, so none is a collocation
        i = 20
        for x in fillers:
            for y in fillers:
                for _ in range(5):
                    texts.append((i, f"{x} {y}"))
                    i += 1
        out = {(r.a, r.b): r.pmi for r in _pmi(spark, texts).collect()}
        assert ("san", "francisco") in out
        sf = out[("san", "francisco")]
        indep = [v for (a, b), v in out.items() if a in fillers and b in fillers]
        assert indep, "expected filler pairs above min count"
        assert sf > max(indep) + 1.0  # clearly separated, in nats

    def test_min_count_filters_rare_noise(self, spark):
        texts = [(0, "rare pair " + "x y " * PMI_MIN_COUNT)]
        out = {(r.a, r.b) for r in _pmi(spark, texts).collect()}
        assert ("rare", "pair") not in out  # occurs once < PMI_MIN_COUNT
        assert ("x", "y") in out


class TestZipfSlope:
    def test_recovers_constructed_power_law(self, spark, monkeypatch, tmp_path):
        """A corpus built with freq(rank r) = C / r must come back with
        slope ~= -1 through the whole pipeline (tokens -> counts ->
        milli-ln quantization -> integer OLS)."""
        import personal_health_etl_pipeline_spark.plans.llm_surface2 as m

        # term_i appears floor(1200 / i) times, i = 1..40
        words = []
        for i in range(1, 41):
            words += [f"w{i:02d}"] * (1200 // i)
        text = " ".join(words)
        df = spark.createDataFrame(
            [(0, text, "en", "src0", len(text))],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )
        path = str(tmp_path / "documents.parquet")
        df.coalesce(1).write.parquet(path)
        # text_zipf_slope loads <sf_dir>/documents.parquet
        monkeypatch.setattr(
            m, "load_table", lambda spark, sf_dir, name: spark.read.parquet(path)
        )
        [row] = m.text_zipf_slope(spark, "ignored").collect()
        assert row.n_terms == 40
        assert abs(row.zipf_slope - (-1.0)) < 0.05, row.zipf_slope
        # intercept_ln ~= ln(1200)
        assert abs(row.intercept_ln - math.log(1200)) < 0.1


class TestPhraseTopk:
    def test_planted_winner_and_all_positions(self, spark):
        """Plant 'x y z' three times (twice in doc 0 — including at
        position 0 — once in doc 1); every other trigram occurs once."""
        import tempfile

        from personal_health_etl_pipeline_spark.plans.llm_surface import (
            text_phrase_topk,
        )

        root = tempfile.mkdtemp(prefix="phrase_")
        docs = [
            (0, "x y z a b x y z", "en", "s", 0),
            (1, "c d x y z e", "en", "s", 0),
            (2, "f g h i", "en", "s", 0),
        ]
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        ).write.mode("overwrite").parquet(f"{root}/documents.parquet")
        rows = text_phrase_topk(spark, root).collect()
        assert [(r.doc_id, r.pos) for r in rows] == [(0, 0), (0, 5), (1, 2)]
        assert all(r.trigram == "x y z" and r.n_total == 3 for r in rows)
