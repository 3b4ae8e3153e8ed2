#!/usr/bin/env python
"""Skew drill: wall-clock on uniform sf0.1 vs the planted-skew twin.

Complements the sf1 scale drill (which preserves distributions) with
the axis it cannot probe: a hot key. Equal volume both sides, so the
ratio IS the skew effect. Same warm-pass + gc + median-of-3 protocol.

Writes BENCH_SKEW_r{N}.json at the repo root (N from $ROUND).
Run scripts/make_skew.py first.

What each family is expected to show (written into the artifact):

* aggregation skew (q13) — absorbed by partial aggregation: the hot
  customer's counts combine map-side, the shuffle carries one row per
  (key, mapper). Ratio ~1.
* join skew (j7, the salted-join demo) — absorbed by the salting the
  entry exists to certify (and AQE's skew split covers the unsalted
  case, certified by sql8 on its own planted distribution).
* per-entity ORDERED windows (sessionize, funnels, as-of, cohorts) —
  semantically serial per entity: one user's ordered history cannot
  split without boundary stitching, so the hot user's partition is a
  straggler and the ratio quantifies the inherent cost ceiling
  (bounded by hot-entity share x cores, not unbounded).
* graph degree skew (pagerank/triangles/k-core over the derived
  customer-supplier graph, hot customer = hub) — pagerank's
  contribution aggregation combines partially; triangles'
  degree-ordered wedge orientation exists precisely to keep hub
  wedges O(m^1.5).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from personal_health_etl_pipeline_spark import get_spark  # noqa: E402
from personal_health_etl_pipeline_spark.plans.catalog import CATALOG  # noqa: E402

# (axis label, uniform dir, skewed twin). The sf0.1 axis measured
# every ratio BELOW 1 in r11 — at that scale the hot partition is
# under job overhead and skew-induced output shrinkage (interleaved
# hot-user events merge into fewer sessions; hub edges dedup)
# dominates; the sf1 axis is where a straggler can surface.
AXES = [
    ("sf0.1", "/root/testdata/sf0.1", os.path.join(ROOT, ".scratch", "skew01")),
    ("sf1", os.path.join(ROOT, ".scratch", "sf1"),
     os.path.join(ROOT, ".scratch", "skew1")),
]

ENTRIES = (
    # aggregation skew — expect ~1 (partial agg)
    "q13_order_count_distribution",
    # join skew with the certified mitigation in place
    "j7_salted_user_enrich",
    # per-user ordered windows — the inherent-straggler family
    "w3_sessionize",
    "w13_sessionized_funnel",
    "w5_event_funnel",
    "j4_asof_last_click",
    "j5_views_before_purchase",
    "a13_cohort_retention",
    # time-keyed (not user-keyed) windows — control, expect ~1
    "st_sliding_window_agg",
    # degree skew on the derived graph (hot customer = hub)
    "graph_pagerank",
    "graph_triangles",
    "graph_kcore",
)


def bench_at(spark, sf_dir: str) -> dict[str, float]:
    for name in ENTRIES:
        CATALOG[name][0](spark, sf_dir).collect()
    trials: dict[str, list[float]] = {n: [] for n in ENTRIES}
    for _ in range(3):
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        for name in ENTRIES:
            t0 = time.perf_counter()
            CATALOG[name][0](spark, sf_dir).collect()
            trials[name].append(time.perf_counter() - t0)
    return {n: round(sorted(ts)[1], 3) for n, ts in trials.items()}


def main() -> None:
    rnd = os.environ.get("ROUND", "11")
    out = os.path.join(ROOT, f"BENCH_SKEW_r{rnd}.json")
    if os.path.exists(out) and "--force" not in sys.argv:
        # $ROUND defaults to an OLD round: without this guard a bare run
        # silently overwrites a committed artifact (nearly lost
        # BENCH_SKEW_r11.json in r14). Fail before the drill, not after.
        raise SystemExit(
            f"{out} already exists — set ROUND=<this round> or pass "
            "--force to overwrite a committed artifact"
        )
    spark = get_spark(app_name="skew-drill")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    axes = {}
    flagged = []
    for label, uniform, skewed in AXES:
        if not (os.path.isdir(uniform) and os.path.isdir(skewed)):
            print(f"{label}: corpus pair missing, skipped")
            continue
        uni = bench_at(spark, uniform)
        skw = bench_at(spark, skewed)
        axes[label] = {
            n: {
                "uniform": uni[n],
                "skewed": skw[n],
                "ratio": round(skw[n] / uni[n], 2) if uni[n] else None,
            }
            for n in ENTRIES
        }
        flagged += [
            f"{label}:{n}"
            for n, r in axes[label].items()
            if r["ratio"] and r["ratio"] > 3
        ]
    payload = {
        "metric": "skew_drill_hotkey_vs_uniform",
        "corpus": (
            "scripts/make_skew.py — 40% of events on one user (~27x "
            "hot key at sf0.1, ~6000x at sf1 vs the uniform max), 40% "
            "of orders on one customer; equal volume per axis, so "
            "ratio == skew effect"
        ),
        "protocol": "median-of-3 after warm pass, gc per pass",
        "axes": axes,
        "flagged": sorted(flagged),
        "expectations": __doc__.split("artifact):", 1)[1].strip(),
    }
    out = os.path.join(ROOT, f"BENCH_SKEW_r{rnd}.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({k: v for k, v in payload.items()
                      if k in ("metric", "flagged")}))
    for label, report in axes.items():
        for n, r in report.items():
            print(f"{label} {n}: {r['uniform']}s -> {r['skewed']}s"
                  f"  x{r['ratio']}")
    spark.stop()


if __name__ == "__main__":
    main()
