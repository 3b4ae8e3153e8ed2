#!/usr/bin/env python
"""Corpus re-scan audit: duplicated identical scans in executed plans.

The r11 depth pass found the capped ngram path re-scanning + re-
shingling the documents table 7.5x because four consumers of the hot
drop-list each re-derived the inverted-index aggregation. This script
makes that sweep repeatable for every bench headline entry at sf0.01.

Metric: IDENTICAL FileScan signatures (same projected columns + data
filters, expression ids normalized). Different-predicate scans of the
same table are legitimate separate reads (e.g. kmv set ops sketching
two different event subsets); only duplicates of the SAME logical scan
indicate a re-derived subtree. Two measured normalizations:

* the AQE executed-plan string prints each FileScan TWICE — calibrated
  against single-scan controls (q1/q6/a9) rather than hard-coded, so a
  Spark-version print change recalibrates automatically;
* entries with cached (`InMemoryRelation`) or checkpointed
  (`Scan ExistingRDD`) subtrees are exempt — the cache IS the fix for
  re-derivation, and those nodes re-print their build lineage.

Flag rule: any single scan signature with a normalized count > 2 in an
uncached entry. Adjudicated findings move to SCHEDULED (open, assigned
a round) or ALLOWED (justified by semantics) so the audit stays
zero-noise round over round.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from personal_health_etl_pipeline_spark import get_spark  # noqa: E402
from personal_health_etl_pipeline_spark.plans.catalog import CATALOG  # noqa: E402

SF = "/root/testdata/sf0.01"
CONTROLS = ("q1_pricing_summary", "q6_revenue_delta", "a9_price_histogram")
FLAG_MAX = 2.0
# audited r11 — justified by semantics, do not re-flag:
ALLOWED = {
    "ann_recall_report": "recall needs brute-force truth + index build + probe",
    "m1_scd2_merge": "SCD-2 merge compares current snapshot vs incoming",
}
# audited r11 — genuine findings, scheduled into a future head window
# (the rotation rule requires impl changes to re-certify same round).
# The two r11 findings (text_pmi_top_pairs x3, sketch_kmv_set_ops
# x2.5) were instead FIXED mid-r11 with bounded-frame non-eager
# checkpoints and head-rotated for same-round certification — the
# list is empty until the audit finds something new:
SCHEDULED: dict[str, str] = {}


def _scan_sigs(df) -> tuple[Counter, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    sigs = Counter()
    for line in plan.splitlines():
        if "FileScan parquet" in line:
            sig = re.sub(r"^[^F]*", "", line)
            sig = re.sub(r"#\d+L?", "#x", sig)
            sigs[sig] += 1
    cached = plan.count("InMemoryRelation") + plan.count("Scan ExistingRDD")
    return sigs, cached


def main() -> None:
    import bench

    spark = get_spark(app_name="scan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    factors = []
    for name in CONTROLS:
        df = CATALOG[name][0](spark, SF)
        df.collect()
        sigs, _ = _scan_sigs(df)
        # ADVICE-r11: a control whose executed plan prints no
        # "FileScan parquet" line (cached, pruned, or a plan-string
        # format change) must not kill the audit — warn and skip it.
        peak = max(sigs.values(), default=0)
        if peak == 0:
            print(f"WARN control {name}: no FileScan lines — skipped")
            continue
        factors.append(peak)
    factor = min(factors, default=1) or 1
    print(f"calibration: single-scan control prints x{factor}")

    flagged = []
    for name in bench.HEADLINE:
        try:
            df = CATALOG[name][0](spark, SF)
            df.collect()
            sigs, cached = _scan_sigs(df)
        except Exception as ex:  # audit must not die on one entry
            print(f"ERR {name}: {ex!r}"[:120])
            continue
        worst = max((c / factor for c in sigs.values()), default=0.0)
        if worst <= FLAG_MAX or cached > 0:
            continue
        if name in ALLOWED:
            continue
        status = f"SCHEDULED ({SCHEDULED[name]})" if name in SCHEDULED else "FLAG"
        flagged.append(name)
        table = re.search(r"/(\w+)\.parquet", str(max(sigs, key=sigs.get)))
        print(
            f"{status[:9]} {name}: x{worst:.1f} identical scans of "
            f"{table.group(1) if table else '?'}"
            + ("" if name in SCHEDULED else " — NEW, adjudicate")
        )
    new = [n for n in flagged if n not in SCHEDULED]
    if not new:
        print("no NEW findings — every duplicate-scan shape is cached, "
              "checkpointed, allowed, or scheduled")
    spark.stop()


if __name__ == "__main__":
    main()
