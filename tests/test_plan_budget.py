"""Unit tests for the catalog-wide plan-budget parser.

``scripts/plan_budget.py`` pins every catalog entry's physical-plan
node counts (PLAN_BUDGET.json) and fails the compare mode when a
scale-hostile kind grew. These tests pin the PARSER against a canned
formatted-explain string (no Spark session needed) so a Spark-version
format drift or a regex regression is caught by the suite, not by a
silently-empty ledger; the 268-entry walk itself is a standing script,
not a suite member (it builds every memoized artifact).
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from scripts.plan_budget import _HOSTILE, count_nodes  # noqa: E402

# Representative of Spark 4.x ExplainMode "formatted": codegen stars,
# ":-" branch art, a two-word scan kind, a broadcast vs a shuffle
# exchange, a reused exchange, a pandas node, a row-UDF node, a details
# section whose "(id) Kind" lines must NOT be double-counted, and a
# subquery tree whose ids are globally unique.
_CANNED = """\
== Physical Plan ==
AdaptiveSparkPlan (13)
+- Sort (12)
   +- Exchange (11)
      +- * HashAggregate (10)
         +- BroadcastHashJoin Inner BuildRight (9)
            :- * Project (4)
            :  +- ArrowEvalPython (3)
            :     +- BatchEvalPython (2)
            :        +- Scan parquet  (1)
            +- BroadcastExchange (8)
               +- ReusedExchange (7)
                  +- Scan parquet  (6)

(1) Scan parquet
Output [2]: [id#0L, v#1]
Arguments: none

(11) Exchange
Arguments: hashpartitioning(id#0L, 32)

Subquery:1 Hosting operator id = 10 Hosting Expression = scalar-subquery#7
* HashAggregate (16)
+- Exchange (15)
   +- Scan parquet  (14)
"""


def test_count_nodes_on_canned_plan():
    c = count_nodes(_CANNED)
    # ids 11 and 15 are shuffles; 8 is broadcast; 7 reused (neither)
    assert c["shuffles"] == 2
    assert c["broadcasts"] == 1
    assert c["sorts"] == 1
    assert c["scans"] == 3  # ids 1, 6, 14 — the details re-print of 1
    # must not double-count
    assert c["python"] == 2  # ArrowEvalPython + BatchEvalPython
    assert c["row_udf"] == 1
    assert c["cartesian"] == 0 and c["bnlj"] == 0
    # every numbered node exactly once: 12 main-tree (ids 1-4, 6-13)
    # + 3 subquery (14-16)
    assert c["nodes"] == 15


def test_duplicate_ids_counted_once():
    doubled = _CANNED + _CANNED
    assert count_nodes(doubled) == count_nodes(_CANNED)


def test_details_section_lines_do_not_match():
    details_only = "(1) Scan parquet\nOutput [2]: [id#0L]\nArguments: none\n"
    assert count_nodes(details_only)["nodes"] == 0


def test_ledger_is_valid_and_complete():
    """The committed pin must cover the live catalog name-for-name with
    sane values — an empty or stale ledger would make the compare mode
    vacuous."""
    from personal_health_etl_pipeline_spark.plans.catalog import CATALOG

    with open(os.path.join(ROOT, "PLAN_BUDGET.json")) as f:
        ledger = json.load(f)
    entries = ledger["entries"]
    assert set(entries) == set(CATALOG)
    for name, counts in entries.items():
        assert counts["nodes"] > 0, name
        assert counts["row_udf"] == 0, f"{name}: pinned plan has a row UDF"
        assert counts["cartesian"] == 0, f"{name}: pinned cartesian product"
        for kind in _HOSTILE:
            assert counts[kind] >= 0, name
