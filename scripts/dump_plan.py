#!/usr/bin/env python
"""Dump .explain("formatted") for catalog entries to plans/r16/ files.

Usage: python scripts/dump_plan.py <suffix> <entry> [<entry> ...]
Writes plans/r16/<entry>_<suffix>.txt for each entry.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from personal_health_etl_pipeline_spark import get_spark  # noqa: E402
from personal_health_etl_pipeline_spark.plans.catalog import CATALOG  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    from personal_health_etl_pipeline_spark.plans.artifacts import force_all

    force_all(spark, sf_dir)
    for name in names:
        df = CATALOG[name][0](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
