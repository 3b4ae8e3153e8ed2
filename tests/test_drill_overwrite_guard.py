"""VERDICT-r14 item 5: the $ROUND-env overwrite trap in the drill
scripts. Both default ROUND to an OLD round, so a bare run used to
silently overwrite that round's committed artifact. The guard refuses
before any Spark work unless --force is passed.

These tests run the scripts as subprocesses with ROUND pointed at a
round whose artifact is committed; the refusal must fire fast (before
the JVM spins up) with a message naming the artifact and --force.
"""

from __future__ import annotations

import os
import pathlib
import subprocess

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _run(script: str, round_env: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["ROUND"] = round_env
    return subprocess.run(
        ["python", str(ROOT / "scripts" / script)],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
        cwd=ROOT,
    )


def test_skew_drill_refuses_committed_round_artifact():
    assert (ROOT / "BENCH_SKEW_r11.json").exists()  # committed in r11
    p = _run("skew_drill.py", "11")
    assert p.returncode == 1
    assert "BENCH_SKEW_r11.json already exists" in p.stderr
    assert "--force" in p.stderr


def test_scale_drill_refuses_committed_round_artifact():
    assert (ROOT / "BENCH_SF1_r09.json").exists()  # committed in r9
    p = _run("scale_drill.py", "09")
    assert p.returncode == 1
    assert "BENCH_SF1_r09.json already exists" in p.stderr
    assert "--force" in p.stderr
