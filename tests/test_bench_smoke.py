"""Bench crash gate: ``bench.py --smoke`` must exit 0 and print one
valid JSON line. Round 2 shipped a crashing bench (rc=1) because the
harness was never re-run after a fixture change — this test makes
that class of regression impossible to ship silently."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_smoke_runs_clean():
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_SF_DIR", None)  # smoke default: sf0.001
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--smoke"],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    assert len(json_lines) == 1, proc.stdout[-2000:]
    payload = json.loads(json_lines[0])
    assert payload["unit"] == "sec"
    assert payload["queries"], "smoke ran zero queries"
    assert all(v >= 0 for v in payload["queries"].values())
