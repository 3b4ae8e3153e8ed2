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


# --- VERDICT-r14 item 2: machine_calib wired into the gate -----------


def _calib_twin(queries, calib):
    t = _twin(queries)
    if calib is not None:
        t["machine_calib"] = calib
    return t


def test_calib_shift_stable_window():
    old = _calib_twin({"q1": 1.0}, {"cpu32": 1.0, "cpu1": 1.0})
    new = _calib_twin({"q1": 1.0}, {"cpu32": 1.1, "cpu1": 0.95})
    c = bench_regress.calib_shift(old, new)
    assert c["ratios"] == {"cpu1": 0.95, "cpu32": 1.1}
    assert not c["suspect"] and c["missing"] == []


def test_calib_shift_suspect_both_directions():
    old = _calib_twin({}, {"cpu32": 1.0, "cpu1": 1.0})
    slower = _calib_twin({}, {"cpu32": 1.44, "cpu1": 1.0})  # r14's real swing
    faster = _calib_twin({}, {"cpu32": 1.0, "cpu1": 0.7})
    assert bench_regress.calib_shift(old, slower)["suspect"]
    assert bench_regress.calib_shift(old, faster)["suspect"]


def test_calib_missing_degrades_gracefully(capsys):
    # BENCH_LOCAL_r14.json predates the field: screen unavailable, gate
    # behaves exactly as before (exit 1 on a flag, not a crash)
    import json

    old = _calib_twin({"q1": 1.0}, None)
    new = _calib_twin({"q1": 5.0}, {"cpu32": 1.44, "cpu1": 1.0})
    c = bench_regress.calib_shift(old, new)
    assert c["ratios"] is None and c["missing"] == ["old"] and not c["suspect"]
    import tempfile, pathlib

    with tempfile.TemporaryDirectory() as d:
        po, pn = pathlib.Path(d) / "o.json", pathlib.Path(d) / "n.json"
        po.write_text(json.dumps(old)), pn.write_text(json.dumps(new))
        assert bench_regress.main([str(po), str(pn)]) == 1
    out = capsys.readouterr().out
    assert "window screen unavailable" in out and "REGRESSION q1" in out


def test_calib_suspect_flips_exit_to_window_suspect(capsys):
    # a real flag + a >20% calib move = exit 2, flag printed annotated
    import json, tempfile, pathlib

    old = _calib_twin({"q1": 1.0}, {"cpu32": 1.0, "cpu1": 1.0})
    new = _calib_twin({"q1": 5.0}, {"cpu32": 1.44, "cpu1": 1.02})
    with tempfile.TemporaryDirectory() as d:
        po, pn = pathlib.Path(d) / "o.json", pathlib.Path(d) / "n.json"
        po.write_text(json.dumps(old)), pn.write_text(json.dumps(new))
        assert bench_regress.main([str(po), str(pn)]) == 2
    out = capsys.readouterr().out
    assert "WINDOW-SUSPECT" in out
    assert "REGRESSION q1" in out and "[calib" in out


def test_calib_stable_keeps_exit_one_on_flags():
    import json, tempfile, pathlib

    old = _calib_twin({"q1": 1.0}, {"cpu32": 1.0, "cpu1": 1.0})
    new = _calib_twin({"q1": 5.0}, {"cpu32": 1.05, "cpu1": 1.0})
    with tempfile.TemporaryDirectory() as d:
        po, pn = pathlib.Path(d) / "o.json", pathlib.Path(d) / "n.json"
        po.write_text(json.dumps(old)), pn.write_text(json.dumps(new))
        assert bench_regress.main([str(po), str(pn)]) == 1


# --- ADVICE-r14: --rename parse + bad-declaration reporting ----------


def test_rename_space_form_and_pairless_spec_error():
    import pytest

    with pytest.raises(SystemExit):
        bench_regress.main(["--rename", "a=b", "o.json", "n.json"])
    with pytest.raises(SystemExit):
        bench_regress.main(["--rename=justonename", "o.json", "n.json"])


def test_bad_rename_declaration_fails_loudly(capsys):
    import json, tempfile, pathlib

    old = _twin({"q1": 1.0, "gone": 1.0})
    new = _twin({"q1": 1.0, "fresh": 1.0})
    # typo'd old name: guard must NOT silently drop the declaration
    with tempfile.TemporaryDirectory() as d:
        po, pn = pathlib.Path(d) / "o.json", pathlib.Path(d) / "n.json"
        po.write_text(json.dumps(old)), pn.write_text(json.dumps(new))
        assert bench_regress.main([str(po), str(pn), "--rename=typo=fresh"]) == 1
    out = capsys.readouterr().out
    assert "BAD RENAME --rename=typo=fresh" in out
    assert "not in old file" in out


def test_bad_rename_reasons_cover_all_three_guards():
    old = _twin({"q1": 1.0, "dup": 1.0})
    new = _twin({"q1": 1.0, "dup": 1.0})
    r = bench_regress.compare(
        old, new, {"missing_old": "dup", "q1": "missing_new"}
    )
    reasons = {why for (_, _, why) in r["bad_renames"]}
    assert any("not in old file" in w for w in reasons)
    assert any("not in new file" in w for w in reasons)
    r2 = bench_regress.compare(old, new, {"q1": "dup"})
    assert any("already in old file" in w for (_, _, w) in r2["bad_renames"])
