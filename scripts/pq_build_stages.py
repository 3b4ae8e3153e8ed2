#!/usr/bin/env python
"""Stage-attribute the PQ artifact builds across a 10x row step
(VERDICT-r12 item 4: `llm.pq_index` 6.67x and `llm.pq_probe_batch`
4.28x at 10x rows were the drill's largest artifact-build lines with
no measured cause note).

Mirrors the exact stages of ``llm_surface._pq_index_root`` /
``_pq_probe_artifact`` (same helpers, same expressions) and times each
at sf0.1 and .scratch/sf1 in ONE session:

* index.codebook_sample — hash-ordered top-PQ_K sample + collect
  (bounded output; linear scan)
* index.encode_checkpoint — per-row ADC code assignment
  (``_pq_data_codes_expr``: m_sub x PQ_K distance evals per vector)
  materialized by the eager localCheckpoint; the expected linear term
* index.write_codes / write_vectors / write_codebook — the two
  corpus-sized parquet writes + the one-row codebook write
* probe.query_side — bounded (n_queries rows) encode + checkpoint
* probe.adc_scan — the rows x n_queries ADC distance join, per-query
  shortlist window, bounded collect; the expected linear term

There is NO k-means/training iteration anywhere in these builds (the
codebook is hash-sampled), so the null hypothesis is pure linearity in
rows with fixed overheads amortizing — this probe either confirms that
with per-stage ratios or finds the superlinear stage.

DELIBERATE DEVIATION from the real build (ADVICE-r13): this mirror
eagerly checkpoints ``cb_arr`` inside the ``index.codebook_sample``
stage, whereas the real ``_pq_index_root`` leaves it lazy until the
final memo checkpoint — in the real build the sample's compute lands
inside the codes/codebook-write jobs. The eager cut is intentional
stage ISOLATION: without it every downstream stage re-times the
sample and the per-stage attribution is meaningless. Consequence:
``codebook_sample``'s own ratio (x7.37 in r13) and the write stages'
"flat" reads are shifted relative to the real build's job boundaries;
only the TOTAL and the identity of the dominant linear stage
(``encode_checkpoint`` / ``adc_scan``) transfer to the real build.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import pyspark.sql.functions as F  # noqa: E402

from personal_health_etl_pipeline_spark import get_spark  # noqa: E402
from personal_health_etl_pipeline_spark.functions.hashing import (  # noqa: E402
    md5_long,
    md5_long_seeded,
)
from personal_health_etl_pipeline_spark.operators import (  # noqa: E402
    similarity as S,
)
from personal_health_etl_pipeline_spark.plans import llm_surface as L  # noqa: E402
from personal_health_etl_pipeline_spark.sources.tables import load_table  # noqa: E402

SFS = ("/root/testdata/sf0.1", os.path.join(ROOT, ".scratch", "sf1"))


def _stages(spark, sf_dir: str) -> dict[str, float]:
    import shutil
    import tempfile

    out: dict[str, float] = {}
    m_sub = 64 // S.PQ_SUBDIM
    root = tempfile.mkdtemp(prefix="pq_stage_probe_")
    try:
        emb = load_table(spark, sf_dir, "embeddings")
        raw = S._spread_vec(
            emb.select(F.col("vec_id").alias("_id"), "embedding")
        ).select(
            "_id",
            S.quantize(F.col("embedding")).alias("_q"),
        )
        base = (
            raw.withColumn("_n2", S.norm2_int(F.col("_q")))
            .select(
                "_id",
                S.unit_quantize(F.col("_q"), F.col("_n2")).alias("_qn"),
            )
            .withColumn("_n2n", S.norm2_int(F.col("_qn")))
        )

        t0 = time.perf_counter()
        sel = (
            base.select("_id", "_qn", md5_long("_id").alias("_h"))
            .orderBy("_h", "_id")
            .limit(S.PQ_K)
        )
        cb_arr = S.attach_cbs_sub(
            sel.agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(_h, _id, _qn))),"
                    " s -> s._qn)"
                ).alias("cbs")
            ),
            m_sub,
            S.PQ_SUBDIM,
        ).localCheckpoint(eager=True)
        out["index.codebook_sample"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        codes = (
            base.crossJoin(F.broadcast(cb_arr))
            .select(
                "_id",
                "_qn",
                "_n2n",
                F.expr(
                    S._pq_data_codes_expr("_qn", m_sub, S.PQ_SUBDIM)
                ).alias("codes"),
            )
            .localCheckpoint(eager=True)
        )
        out["index.encode_checkpoint"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        codes.select("_id", "codes").write.mode("overwrite").parquet(
            os.path.join(root, "codes")
        )
        out["index.write_codes"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        (
            codes.select(
                "_id", "_qn", "_n2n",
                (F.col("_id") % L.PQ_PERS_BUCKETS).alias("bucket"),
            )
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(root, "vectors"))
        )
        out["index.write_vectors"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        cb_arr.select("cbs").write.mode("overwrite").parquet(
            os.path.join(root, "codebook")
        )
        out["index.write_codebook"] = time.perf_counter() - t0

        # --- probe-batch stages (persisted-probe batch shape) --------
        seed, n_queries = L.PQ_PERS_SEED, L.PQ_PERS_QUERIES
        t0 = time.perf_counter()
        ext = (
            emb.select(
                "vec_id", "embedding",
                md5_long_seeded("vec_id", seed).alias("_h"),
            )
            .orderBy("_h", "vec_id")
            .limit(n_queries)
            .select("vec_id", "embedding")
        )
        query_side = (
            ext.select(
                F.col("vec_id").alias("_id"),
                S.quantize(F.col("embedding")).alias("_q"),
            )
            .withColumn("_n2", S.norm2_int(F.col("_q")))
            .select(
                "_id", S.unit_quantize(F.col("_q"), F.col("_n2")).alias("_qn")
            )
            .withColumn("_n2n", S.norm2_int(F.col("_qn")))
            .crossJoin(F.broadcast(cb_arr))
            .select(
                F.col("_id").alias("query_id"),
                F.col("_qn").alias("_qq"),
                F.col("_n2n").alias("_qn2"),
                F.expr(
                    S._pq_data_dtab_expr("_qn", m_sub, S.PQ_SUBDIM)
                ).alias("dtab"),
            )
            .localCheckpoint(eager=True)
        )
        out["probe.query_side"] = time.perf_counter() - t0

        from pyspark.sql import Window

        t0 = time.perf_counter()
        codes_rd = spark.read.parquet(os.path.join(root, "codes"))
        adc = codes_rd.join(
            F.broadcast(query_side.select("query_id", "dtab")),
            F.col("_id") != F.col("query_id"),
        ).select(
            "query_id",
            F.col("_id").alias("neighbor_id"),
            F.expr(S._pq_adc_expr(m_sub)).alias("adist"),
        )
        ws = Window.partitionBy("query_id").orderBy(
            F.col("adist").asc(), F.col("neighbor_id")
        )
        pairs = (
            adc.withColumn("srank", F.row_number().over(ws))
            .where(F.col("srank") <= S.PQ_SHORTLIST)
            .select("query_id", "neighbor_id")
            .collect()
        )
        out["probe.adc_scan"] = time.perf_counter() - t0
        out["probe.n_pairs"] = len(pairs)
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    return {k: round(v, 3) for k, v in out.items()}


def main() -> None:
    spark = get_spark(app_name="pq-build-stages")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    results: dict[str, dict[str, float]] = {}
    for sf in SFS:
        _stages(spark, sf)  # warm pass: plans, codegen, page cache
        results[sf] = _stages(spark, sf)
    small, big = (results[s] for s in SFS)
    report = {
        k: {
            "sf0.1": small[k],
            "sf1": big[k],
            "ratio": round(big[k] / small[k], 2) if small[k] else None,
        }
        for k in small
        if not k.endswith("n_pairs")
    }
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
