"""Perf-regression gate: the headline bench must not silently regress.

The test suite runs CPU-forced (tests/conftest.py), so the TPU gate runs
``bench.py`` in a subprocess with a *clean* environment that reaches the real
TPU chip, and asserts the headline numbers stay above the ratcheted floors
(~8% under the r1/r2 records — VERDICT r2 #6). Opt-in because a cold bench
costs minutes of compile on the tunneled backend:

    LATICE_TPU_BENCH=1 python -m pytest tests/test_bench_gate.py -m tpu_bench -s

``check_floors`` is pure and unit-tested on CPU so the gate's trip logic is
itself covered: a simulated 10% slowdown must trip, the recorded numbers
must pass.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

# Floors ~8% under the best recorded values (r3: one-pass InstanceNorm
# statistics + the Pallas fused matmul+top-k engine lifted the headline —
# see BENCH_HISTORY.jsonl), so real regressions trip while run-to-run
# tunnel noise does not. NOTE: a congested tunnel (dispatch_ms_per_iter
# >> 1 in the bench output) invalidates any run; re-run on a quiet rig
# before treating a floor trip as a code regression.
FLOORS = {
    "value": 43_000.0,  # headline patterns/sec/chip
    "train_steps_per_sec_b256": 26.1,
    "scaled_encode_patterns_per_sec": 20_000.0,
    "scaled_train_steps_per_sec": 11.5,
    "di_patterns_per_sec": 60_000.0,  # pattern-DI bin2, 100k dict
    "vs_baseline": 5.16,
}

# Best recorded values (update when a round sets a new record). The r3
# headline is the on-chip drive of the bench-identical fused-engine
# pipeline (46,975 patterns/s at 21.80 ms/batch, early-exit arm; the
# shipped no-early-exit default measured another ~1.3 ms faster at the
# kernel level) — the rig's tunnel degraded before bench.py could record
# it in BENCH_HISTORY.jsonl.
RECORD = {
    "value": 46_975.0,
    "train_steps_per_sec_b256": 28.41,
    "scaled_encode_patterns_per_sec": 21_931.2,
    "scaled_train_steps_per_sec": 12.53,
    "di_patterns_per_sec": 65_302.0,  # r3 pattern-DI bin2 (ROADMAP)
    "vs_baseline": 5.637,
}


def check_floors(result: dict) -> list[str]:
    """Return a violation message per metric under its floor (empty = pass)."""
    violations = []
    for key, floor in FLOORS.items():
        got = result.get(key)
        if got is None:
            violations.append(f"{key}: missing from bench output (floor {floor})")
        elif got < floor:
            violations.append(f"{key}: {got} < floor {floor}")
    return violations


class TestGateLogic:
    """CPU-runnable coverage of the trip logic itself."""

    def test_record_numbers_pass(self):
        assert check_floors(RECORD) == []

    def test_ten_percent_slowdown_trips(self):
        slowed = {k: v * 0.9 for k, v in RECORD.items()}
        violations = check_floors(slowed)
        # Every ratcheted floor is within 10% of the record, so all trip.
        assert len(violations) == len(FLOORS), violations

    def test_missing_metric_trips(self):
        partial = {k: v for k, v in RECORD.items() if k != "scaled_train_steps_per_sec"}
        assert any("missing" in v for v in check_floors(partial))


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
    assert check_floors(result) == [], result
