"""tools/bench_diff.py (r12 — the mechanical plan-diff exoneration
the r11 verdict asked for): pure-logic contract tests over synthetic
BENCH files; the Spark recheck tiers are exercised by the round's
live run (bench_diff.json)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "bench_diff.py")


def _run(tmp_path, old, new, expected):
    op, np_, ep = (
        tmp_path / "old.json",
        tmp_path / "new.json",
        tmp_path / "exp.json",
    )
    op.write_text(json.dumps({"detail": old}))
    np_.write_text(json.dumps({"detail": new}))
    ep.write_text(json.dumps({"expected": expected}))
    proc = subprocess.run(
        [sys.executable, TOOL, str(op), str(np_), "--expected", str(ep)],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
    )
    verdict = json.loads((tmp_path / "bench_diff.json").read_text())
    return proc.returncode, verdict


def test_bench_diff_named_set_exact(tmp_path):
    old = {
        "a": {"shuffle_bytes": 100, "tasks": 5},
        "b": {"shuffle_bytes": 10, "tasks": 2},
        "c": {"shuffle_bytes": 7, "tasks": 1},
    }
    new = {
        "a": {"shuffle_bytes": 120, "tasks": 5},  # changed
        "b": {"shuffle_bytes": 10, "tasks": 2},   # untouched
        "d": {"shuffle_bytes": 3, "tasks": 1},    # added
    }                                             # c removed
    # every observed diff named (+ one stale) -> ok, stale reported
    rc, v = _run(
        tmp_path, old, new,
        {"a": "r", "c": "r", "d": "r", "zz": "stale"},
    )
    assert rc == 0 and v["ok"]
    assert v["stale_expectations"] == ["zz"]
    assert set(v["observed_diffs"]) == {"a", "c", "d"}
    assert v["observed_diffs"]["a"]["delta"] == {
        "shuffle_bytes": [100, 120]
    }

    # an unnamed diff fails loudly with the diff listed
    rc, v = _run(tmp_path, old, new, {"a": "r", "d": "r"})
    assert rc == 1 and not v["ok"]
    assert v["unexplained"] == ["c"]

    # byte-identical details -> zero diffs, ok, empty expectations fine
    rc, v = _run(tmp_path, old, old, {})
    assert rc == 0 and v["ok"] and not v["observed_diffs"]


def test_bench_diff_wall_clock_ignored(tmp_path):
    """Wall-clock medians are host-owned; only plan metrics count."""
    old = {"q": {"shuffle_bytes": 5, "tasks": 1, "median": 1.0}}
    new = {"q": {"shuffle_bytes": 5, "tasks": 1, "median": 3.0}}
    rc, v = _run(tmp_path, old, new, {})
    assert rc == 0 and v["ok"] and not v["observed_diffs"]
