"""Perf-regression gate: the headline bench must not silently regress.

The test suite runs CPU-forced (tests/conftest.py), so this gate runs
``bench.py`` in a subprocess with a *clean* environment that reaches the real
TPU chip, and asserts the headline numbers stay above conservative floors
(round-1 record: 35.7k patterns/s, 22.6 train steps/s — VERDICT.md Weak #6
asked for exactly this pin). Opt-in because a cold bench costs minutes of
compile on the tunneled backend:

    LATICE_TPU_BENCH=1 python -m pytest tests/test_bench_gate.py -m tpu_bench -s
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

# Floors with ~15% headroom under the round-1 record, so real regressions
# trip the gate but run-to-run tunnel noise does not.
PATTERNS_PER_SEC_FLOOR = 30_000.0
TRAIN_STEPS_PER_SEC_FLOOR = 18.0


@pytest.mark.tpu_bench
@pytest.mark.skipif(
    os.environ.get("LATICE_TPU_BENCH") != "1",
    reason="TPU bench gate is opt-in: set LATICE_TPU_BENCH=1",
)
def test_bench_headline_above_floor():
    env = {
        k: v
        for k, v in os.environ.items()
        # Drop the CPU forcing this conftest installs, so the subprocess
        # binds to the ambient (TPU) backend.
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["value"] >= PATTERNS_PER_SEC_FLOOR, result
    assert result["train_steps_per_sec_b256"] >= TRAIN_STEPS_PER_SEC_FLOOR, result
    assert result["vs_baseline"] >= 3.5, result
