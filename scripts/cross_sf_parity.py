#!/usr/bin/env python
"""Cross-sf parity sweep: the FULL catalog vs DuckDB at a bigger sf.

The driver's differential runs at sf0.01, where scale-dependent
semantic bugs are invisible. On its first run (r11, at sf0.1) this
sweep caught two real defects the sf0.01 gate had certified green for
rounds: ts2's rolling-moment bigint envelope breaking (the w10
overflow class — Σx² past int64 at 10x volume) and quality_score's
double-then-ROUND recipe diverging from DuckDB by one 6th-decimal
digit at a boundary row. Run it each round after impl changes; pass a
scratch corpus dir (e.g. .scratch/sf1) to probe a deeper scale for a
targeted subset.

Usage:  python scripts/cross_sf_parity.py [sf_dir] [--only a,b,c]

``--only`` restricts the sweep to a comma-separated entry subset —
the r12 use: probing the INTEGER-ENVELOPE families (power sums,
windowed moments, rank arithmetic) one decade deeper at .scratch/sf1,
since the overflow class reappears at each decade (w10 broke at sf1,
ts2 at sf0.1; VERDICT-r11 item 5).
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from personal_health_etl_pipeline_spark import get_spark  # noqa: E402
from personal_health_etl_pipeline_spark.plans.catalog import CATALOG  # noqa: E402
from tests.parity import check_query  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--only")]
    only = [a for a in sys.argv[1:] if a.startswith("--only")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = list(CATALOG)
    if only:
        wanted = only[0].split("=", 1)[-1].split(",")
        unknown = sorted(set(wanted) - set(names))
        if unknown:
            raise SystemExit(f"--only names not in catalog: {unknown}")
        names = [n for n in names if n in set(wanted)]
    spark = get_spark(app_name="cross-sf-parity")
    spark.sparkContext.setLogLevel("ERROR")
    fails = []
    t0 = time.time()
    for name in names:
        try:
            check_query(spark, name, sf_dir)
        except Exception as ex:  # record and continue — it's a sweep
            fails.append((name, repr(ex)[:250]))
    n = len(names)
    print(
        f"CROSS-SF PARITY [{sf_dir}]: {n - len(fails)}/{n} green "
        f"in {time.time() - t0:.0f}s"
    )
    for name, err in fails:
        print("FAIL", name, err)
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
