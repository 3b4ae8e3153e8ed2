"""Drive the driver contract end-to-end, like the external harness does.

Usage: python tests/run_verify.py [sf_dir]

Builds a VANILLA SparkSession (not the repo session factory) on purpose:
the external driver does the same, so any conf the engine needs must be
set inside the engine (e.g. nanosAsLong in sources/tables.py), not in
the session factory alone.
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import __spark_entry__ as e  # noqa: E402
from tests.parity import compare, run_oracle  # noqa: E402

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 1. smoke: entry() twice, stable schema, >0 rows
    d1 = e.entry(spark)
    n1 = len(d1.collect())
    d2 = e.entry(spark)
    assert d1.schema == d2.schema, "entry() schema not stable"
    print(f"smoke: entry() -> {n1} rows, stable schema", flush=True)
    assert n1 > 0

    # 2. differential: every queries() entry vs oracle_sql()
    qs = e.queries()
    oracles = e.oracle_sql()
    n_pass = n_rows_only = 0
    failures: list[str] = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                cols, rows, types = run_oracle(oracles[name], sf_dir)
                compare(df, cols, rows, types)
                n_pass += 1
                tag = "ok"
            else:
                assert df.count() >= 0
                n_rows_only += 1
                tag = "rows-only"
        except Exception:
            failures.append(name)
            tag = "FAIL"
            traceback.print_exc()
        print(f"  {name}: {tag} ({time.time() - t0:.1f}s)", flush=True)
    print(
        f"differential: {n_pass} pass, {n_rows_only} rows-only, "
        f"{len(failures)} FAIL {failures}",
        flush=True,
    )

    # 3. plan probe: pushdown + pruned ReadSchema on the flagship filter
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = (
        qs["q6_revenue_delta"](spark, sf_dir)
        ._jdf.queryExecution()
        .explainString(mode.fromString("formatted"))
    )
    assert "PushedFilters: [" in plan, "q6 filters not pushed to scan"
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert read_schema.count(":") - 1 <= 5, "q6 scan reads unpruned schema"
    print("plan probe: q6 pushdown + pruned schema ok", flush=True)

    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
