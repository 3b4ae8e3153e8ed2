#!/usr/bin/env python
"""Order-insensitivity probe for per-query bench attribution.

VERDICT-r11 item 2's done-criterion is that per-query numbers no
longer depend on RUN ORDER (the r11 driver charged ``graph_kcore``
24.0 s for an artifact build the local twin charged elsewhere). With
session artifacts force-built up front (``plans/artifacts.py``), the
per-query loop should time pure steady-state — so running the SAME
queries in CANONICAL vs REVERSED order inside one session must agree
per query.

Protocol (single-session interleaved, per the repo's benchmarking
discipline): force artifacts, one untimed warm pass, then timed passes
alternating canonical / reversed / canonical / reversed; compare each
query's best-of-2 between the two orders. Flag |delta| over
max(0.3 s, 40%) — generous bounds because single-trial pairs at
sub-second scale carry scheduler jitter; the r11 failure mode was
20x, not 1.4x.

Writes BENCH_ORDER_LAST.json and prints one summary line.
"""

from __future__ import annotations

import json
import os
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

import bench  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-order-probe")
    spark.sparkContext.setLogLevel("ERROR")

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    artifacts = force_all(spark, sf_dir)
    for name in bench.HEADLINE:  # untimed warm pass
        CATALOG[name][0](spark, sf_dir).collect()

    orders = {
        "canonical": list(bench.HEADLINE),
        "reversed": list(reversed(bench.HEADLINE)),
    }
    trials: dict[str, dict[str, list[float]]] = {
        n: {o: [] for o in orders} for n in bench.HEADLINE
    }
    for _ in range(2):
        for oname, seq in orders.items():
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
            for fn in SESSION_ARTIFACTS.values():  # memo-guarded no-ops
                fn(spark, sf_dir)
            for name in seq:
                t0 = time.perf_counter()
                CATALOG[name][0](spark, sf_dir).collect()
                trials[name][oname].append(time.perf_counter() - t0)

    flags = []
    detail = {}
    for name, by_order in trials.items():
        c = min(by_order["canonical"])
        r = min(by_order["reversed"])
        delta = abs(c - r)
        detail[name] = {
            "canonical": round(c, 3),
            "reversed": round(r, 3),
            "delta": round(delta, 3),
        }
        if delta > max(0.3, 0.4 * min(c, r)):
            flags.append(name)

    worst = max(detail, key=lambda n: detail[n]["delta"])
    payload = {
        "metric": "bench_order_insensitivity",
        "sf_dir": sf_dir,
        "n_queries": len(detail),
        "artifacts": artifacts,
        "flags": sorted(flags),
        "worst": {"query": worst, **detail[worst]},
        "detail": detail,
    }
    with open(os.path.join(ROOT, "BENCH_ORDER_LAST.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
    print(
        json.dumps(
            {
                k: v
                for k, v in payload.items()
                if k not in ("detail", "artifacts")
            }
        )
    )
    spark.stop()
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
