#!/usr/bin/env python
"""Adjudicate the r12 ``dedup_minhash_lsh`` level shift (VERDICT-r12
item 1) with the repo's own single-session protocol.

The observation: the same untouched code read 1.80 s (r11 local twin),
~3.4 s (r12 local twin + order probe, IN the 89-query loop), 2.28 s
(r12 driver median), 1.79 s (fresh-session standalone) and 1.57 s
(standalone after artifact pre-build). Cross-session absolutes are the
documented trap (README "Benchmarking notes"), so this probe runs every
arm in ONE session:

* **A1 (bare)** — quiet trials in a fresh session, nothing else built.
  The query is self-contained (``minhash_lsh_pairs`` checkpoints its
  own candidates per call; no ``_*_MEMO`` involvement), so this is the
  query's intrinsic steady state.
* **B (artifacts resident)** — ``force_all`` builds all 15 session
  artifacts (eager localCheckpoint blocks stay resident), then the same
  quiet trials. Isolates the r12 hypothesis "the artifact force-build
  changes what's warm".
* **A2 (artifacts evicted)** — memos cleared, caches dropped, GC both
  sides, same quiet trials. If B ≈ A1 ≈ A2 the residency hypothesis is
  dead; if B alone moved, it's real.
* **C (loop context), interleaved** — alternating QUIET/AFTER-BATCH
  trials where the batch is the four heavy headline neighbours run
  back-to-back with no GC in between, exactly like a bench pass.
  Isolates "in-session interference from the 89-query loop".

Each quiet trial: System.gc() + 0.4 s settle, then one timed collect.
Writes MINHASH_AB_r13.json with all trials, medians, and a derived
verdict; the human-adjudicated verdict goes in README / drill NOTES.
"""

from __future__ import annotations

import importlib
import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from personal_health_etl_pipeline_spark import get_spark  # noqa: E402
from personal_health_etl_pipeline_spark.plans.artifacts import (  # noqa: E402
    SESSION_ARTIFACTS,
    force_all,
)
from personal_health_etl_pipeline_spark.plans.catalog import CATALOG  # noqa: E402

QUERY = "dedup_minhash_lsh"
# the heavy headline entries that run near minhash in a bench pass —
# the "loop context" arm reproduces their residue (shuffle files, JVM
# heap churn, page cache) without a GC in between, like bench.py's
# per-pass (not per-query) GC policy
BATCH = (
    "dedup_ngram_jaccard",
    "dedup_setsim_prefix",
    "dedup_simhash",
    "ann_lsh_topk",
)
TRIALS = 5


def _gc(spark, settle: float = 0.4) -> None:
    spark.sparkContext._jvm.System.gc()
    time.sleep(settle)


def _timed(spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    CATALOG[QUERY][0](spark, sf_dir).collect()
    return round(time.perf_counter() - t0, 3)


def _quiet_trials(spark, sf_dir: str, n: int = TRIALS) -> list[float]:
    out = []
    for _ in range(n):
        _gc(spark)
        out.append(_timed(spark, sf_dir))
    return out


def _clear_artifacts(spark) -> None:
    """Drop every registry-covered memo and its cached blocks."""
    for fn in SESSION_ARTIFACTS.values():
        for cover in fn.covers:
            mod_name, memo_name = cover.split(":")
            getattr(importlib.import_module(mod_name), memo_name).clear()
    spark.catalog.clearCache()
    _gc(spark, settle=2.0)  # let ContextCleaner drop checkpoint blocks


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="minhash-ab-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import pandas as _pd  # noqa: F401

    spark.range(64).mapInPandas(lambda it: it, "id long").selectExpr(
        "sum(id)"
    ).collect()

    # warm the query's own plan/codegen before any arm
    for _ in range(2):
        CATALOG[QUERY][0](spark, sf_dir).collect()

    a1 = _quiet_trials(spark, sf_dir)

    build = force_all(spark, sf_dir)
    b = _quiet_trials(spark, sf_dir)

    _clear_artifacts(spark)
    a2 = _quiet_trials(spark, sf_dir)

    # interleaved loop-context arm: QUIET, AFTER-BATCH, QUIET, ... in
    # strict alternation so machine drift hits both arms equally
    for name in BATCH:  # warm the batch plans outside timings
        CATALOG[name][0](spark, sf_dir).collect()
    c_quiet, c_after = [], []
    for _ in range(TRIALS):
        _gc(spark)
        c_quiet.append(_timed(spark, sf_dir))
        for name in BATCH:  # no GC: reproduce the bench pass
            CATALOG[name][0](spark, sf_dir).collect()
        c_after.append(_timed(spark, sf_dir))

    med = lambda xs: round(statistics.median(xs), 3)  # noqa: E731
    m_a1, m_b, m_a2 = med(a1), med(b), med(a2)
    m_cq, m_ca = med(c_quiet), med(c_after)
    residency = m_b - (m_a1 + m_a2) / 2
    interference = m_ca - m_cq
    verdict = []
    if abs(residency) < 0.3:
        verdict.append(
            f"artifact residency NEUTRAL ({residency:+.3f}s B vs A1/A2)"
        )
    else:
        verdict.append(
            f"artifact residency EFFECT {residency:+.3f}s (B {m_b} vs "
            f"A1 {m_a1} / A2 {m_a2})"
        )
    if abs(interference) < 0.3:
        verdict.append(
            f"loop-context interference NEUTRAL ({interference:+.3f}s)"
        )
    else:
        verdict.append(
            f"loop-context interference EFFECT {interference:+.3f}s "
            f"(after-batch {m_ca} vs quiet {m_cq})"
        )

    payload = {
        "metric": "minhash_ab_probe",
        "query": QUERY,
        "sf_dir": sf_dir,
        "protocol": (
            "single session; A1 bare -> B artifacts resident -> A2 "
            "evicted (5 quiet trials each, gc+0.4s settle per trial); "
            "then 5 interleaved QUIET/AFTER-BATCH rounds, batch = "
            f"{list(BATCH)} back-to-back, no gc (bench-pass policy)"
        ),
        "trials": {
            "A1_bare": a1,
            "B_artifacts_resident": b,
            "A2_artifacts_evicted": a2,
            "C_quiet": c_quiet,
            "C_after_batch": c_after,
        },
        "medians": {
            "A1": m_a1,
            "B": m_b,
            "A2": m_a2,
            "C_quiet": m_cq,
            "C_after_batch": m_ca,
        },
        "artifact_build_secs": build,
        "derived_verdict": "; ".join(verdict),
    }
    out = os.path.join(ROOT, "MINHASH_AB_r13.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload["medians"]))
    print(payload["derived_verdict"])
    print("written:", out)
    spark.stop()


if __name__ == "__main__":
    main()
