#!/usr/bin/env python
"""Per-stage profile of one catalog query (optimization-round tooling).

Runs a named catalog entry N times against $SPARK_GRAFT_SF_DIR with the
noop sink (guide §1.4 — times the computation, not the collect), then
prints per-stage wall clock, task counts and shuffle bytes scraped from
the Spark UI REST API, so "where does the time go" has a number instead
of a guess.  Artifacts are force-built first (same discipline as
bench.py) so the profile never charges a session-artifact build to the
query.

Usage: python scripts/stage_profile.py <entry> [trials] [--collect]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from personal_health_etl_pipeline_spark import get_spark  # noqa: E402
from personal_health_etl_pipeline_spark.plans.catalog import CATALOG  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 3
    use_collect = "--collect" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name=f"stage-profile-{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # bench-identical warm-up + artifact forcing, outside every timing
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from personal_health_etl_pipeline_spark.plans.artifacts import force_all

    force_all(spark, sf_dir)

    fn = CATALOG[name][0]
    fn(spark, sf_dir).collect()  # warm pass (codegen, parquet footers)

    app_id = spark.sparkContext.applicationId
    base = f"http://127.0.0.1:4049/api/v1/applications/{app_id}"

    def stages_seen() -> set[int]:
        with urllib.request.urlopen(f"{base}/stages") as r:
            return {s["stageId"] for s in json.load(r)}

    before = stages_seen()
    walls = []
    for i in range(trials):
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)
        spark.sparkContext.setJobDescription(f"{name} trial {i}")
        # time fn() too: several entries do eager work (checkpoints,
        # gated-broadcast counts) at plan-build time, exactly as the
        # bench's fn(...).collect() charges them
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        if use_collect:
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)

    with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
        stages = json.load(r)
    new = [s for s in stages if s["stageId"] not in before]
    new.sort(key=lambda s: s.get("executorRunTime", 0), reverse=True)
    total_run = sum(s.get("executorRunTime", 0) for s in new)
    print(f"query={name} trials={walls!r} best={min(walls):.3f}s "
          f"(sink={'collect' if use_collect else 'noop'})")
    print(f"stages (all {trials} trials, sorted by executorRunTime; "
          f"total executorRunTime={total_run/1000:.2f}s):")
    print(f"{'stage':>6} {'tasks':>5} {'runT(s)':>8} {'cpuT(s)':>8} "
          f"{'shRead':>9} {'shWrite':>9} {'input':>9} {'name'}")
    for s in new[:40]:
        print(
            f"{s['stageId']:>6} {s['numCompleteTasks']:>5} "
            f"{s.get('executorRunTime', 0)/1000:>8.2f} "
            f"{s.get('executorCpuTime', 0)/1e9:>8.2f} "
            f"{s.get('shuffleReadBytes', 0):>9} "
            f"{s.get('shuffleWriteBytes', 0):>9} "
            f"{s.get('inputBytes', 0):>9} "
            f"{s['name'].split(chr(10))[0][:70]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
