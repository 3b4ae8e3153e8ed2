"""Unit tests for the standing per-query bench regression gate.

VERDICT-r13 item 4: a renamed query used to show as one drop + one add
with no timing comparison. These tests pin the fixed behavior — a
synthetic rename fails the gate unless declared, and a declared rename
is timing-compared under the normal >25%-and->0.3s rule.
"""

from __future__ import annotations

import importlib.util
import pathlib

_SPEC = importlib.util.spec_from_file_location(
    "bench_regress",
    pathlib.Path(__file__).resolve().parents[1] / "scripts" / "bench_regress.py",
)
bench_regress = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench_regress)


def _twin(queries):
    return {"queries": queries, "median_total": sum(queries.values())}


def test_stable_membership_no_flags():
    old = _twin({"q1": 1.0, "q2": 2.0})
    new = _twin({"q1": 1.05, "q2": 1.9})
    r = bench_regress.compare(old, new, {})
    assert r["flags"] == [] and not r["suspected_renames"]


def test_regression_gate_needs_both_floors():
    # >25% but <0.3s absolute: no flag; both floors crossed: flag
    old = _twin({"fast": 0.2, "slow": 2.0})
    new = _twin({"fast": 0.3, "slow": 3.0})
    r = bench_regress.compare(old, new, {})
    assert [f[0] for f in r["flags"]] == ["slow"]


def test_undeclared_rename_is_suspected():
    old = _twin({"old_name": 1.0, "q2": 2.0})
    new = _twin({"new_name": 5.0, "q2": 2.0})
    r = bench_regress.compare(old, new, {})
    assert r["suspected_renames"]
    assert r["only_old"] == ["old_name"] and r["only_new"] == ["new_name"]
    # and crucially: no timing comparison happened for the pair
    assert r["flags"] == []


def test_declared_rename_gets_timing_comparison():
    old = _twin({"old_name": 1.0, "q2": 2.0})
    new = _twin({"new_name": 5.0, "q2": 2.0})
    r = bench_regress.compare(old, new, {"old_name": "new_name"})
    assert not r["suspected_renames"]
    assert r["rename_pairs"] == [("old_name", "new_name")]
    assert [f[0] for f in r["flags"]] == ["new_name"]  # 1.0s -> 5.0s


def test_pure_drop_or_add_stays_informational():
    old = _twin({"q1": 1.0, "q2": 2.0})
    new = _twin({"q1": 1.0})
    r = bench_regress.compare(old, new, {})
    assert not r["suspected_renames"] and r["only_old"] == ["q2"]
