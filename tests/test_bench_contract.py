"""The driver contract: `python bench.py` prints EXACTLY one JSON line on
stdout (CLAUDE.md invariant; the round-end runner records it verbatim)."""

import json
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


@pytest.mark.slow
def test_bench_stdout_is_one_json_line():
    env = {
        **os.environ,
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "DCA_TPU_BENCH_SKIP_BIG": "1",
        "DCA_TPU_BENCH_PASSES": "1",
        "PYTHONPATH": REPO,
    }
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"stdout must be ONE line, got: {lines!r}"
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["unit"] == "cells/s" and rec["value"] > 0
    # the measured work happened: warm + measured pass logged on stderr
    assert "warm pass" in out.stderr and "steady-state" in out.stderr
