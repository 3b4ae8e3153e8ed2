#!/usr/bin/env python
"""Quiet-session steady-state probe for bench-regression flags.

When ``bench_regress.py`` flags a query whose implementation is
UNTOUCHED since the previous round, the repo's measurement protocol
(README "benchmark discipline"; the r13 minhash adjudication) says the
flag must be adjudicated with same-session data, never by comparing
absolute wall-clock across sessions. This script is the standing
first-line tool: ONE fresh session, bench-identical setup (session
factory, table warm-up, force-built artifacts), then per query a warm
pass plus N timed trials with gc+settle between trials — the median is
the query's QUIET steady state. Read it against the two in-loop
readings (previous twin, current twin): if quiet sits at or below the
previous round's in-loop value, the flag was in-loop context plus
cross-session variance, not code; if quiet reproduces the elevated
reading, escalate to an interleaved A/B over the suspect change
(scripts/minhash_ab_probe.py is the template).

Usage: python scripts/quiet_probe.py OUT.json name1 name2 ...
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TRIALS = 5
SETTLE_S = 1.0


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    out_path, names = sys.argv[1], sys.argv[2:]

    from personal_health_etl_pipeline_spark import get_spark
    from personal_health_etl_pipeline_spark.plans.artifacts import force_all
    from personal_health_etl_pipeline_spark.plans.catalog import CATALOG

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # bench-identical warm-up: codegen + table footers + artifacts
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).collect()
    force_all(spark, sf_dir)

    # the same fixed machine-window calibration the bench records, so
    # a quiet reading is directly comparable to any twin's window
    import bench

    machine_calib = bench._machine_calib(spark)
    print(f"machine_calib: {machine_calib}", flush=True)

    out = {
        "sf_dir": sf_dir,
        "trials": TRIALS,
        "machine_calib": machine_calib,
        "queries": {},
    }
    for name in names:
        fn = CATALOG[name][0]
        fn(spark, sf_dir).collect()  # warm pass, untimed
        times = []
        for _ in range(TRIALS):
            gc.collect()
            time.sleep(SETTLE_S)
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times.append(round(time.perf_counter() - t0, 3))
        out["queries"][name] = {
            "trials": times,
            "median": round(statistics.median(times), 3),
        }
        print(f"{name}: median {out['queries'][name]['median']}s "
              f"trials {times}", flush=True)

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
