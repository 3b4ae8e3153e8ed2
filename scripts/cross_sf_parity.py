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

Usage:  python scripts/cross_sf_parity.py [sf_dir] [--only a,b,c|--envelope]

``--only`` restricts the sweep to a comma-separated entry subset;
``--envelope`` is the standing shorthand for the INTEGER-ENVELOPE
families (power sums, windowed moments, rank arithmetic) — the
overflow class reappears one decade at a time (w10 broke at sf1, ts2
at sf0.1; VERDICT-r11 item 5), so each round re-probes the class one
decade past the biggest corpus that changed:

    python scripts/cross_sf_parity.py .scratch/sf1 --envelope

r12 result: 16/16 green at sf1.
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


# the integer-envelope watch list: every entry whose arithmetic holds
# power sums, windowed moments, or rank products in fixed-width
# integers (the class w10/ts2 overflowed in); membership reviewed when
# entries join the catalog
ENVELOPE = (
    "a10_corr_stats",
    "a27_chisq_independence",
    "a28_welch_ttest",
    "a29_ols_slope",
    "a30_ks_statistic",
    "a31_mannwhitney_u",
    "a33_approx_percentile_window",
    "ts2_rolling_zscore",
    "ts4_seasonal_decompose",
    "ts5_ewma_halflife",
    "ts9_autocorr",
    "w8_windowed_distinct",
    "w10_ranking_function_sweep",
    "text_quality_score",
    "sketch_sample_quantiles",
    "emb_covariance",
)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="Full-catalog DuckDB differential at a bigger sf."
    )
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--only", help="comma-separated entry subset")
    ap.add_argument(
        "--envelope",
        action="store_true",
        help="shorthand for the integer-envelope watch list",
    )
    ns = ap.parse_args()
    sf_dir = ns.sf_dir
    names = list(CATALOG)
    wanted = list(ENVELOPE) if ns.envelope else (
        ns.only.split(",") if ns.only else None
    )
    if wanted is not None:
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
