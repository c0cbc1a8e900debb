"""XLA trace summarization: turn a jax.profiler trace into per-op numbers.

`jax.profiler.trace` (wired through `latice_tpu.utils.profiling`) writes a
Perfetto trace whose "XLA Ops" track carries one duration event per
compiled-op execution. TensorBoard renders it, but perf work on a headless
rig needs the numbers directly — this module parses the trace and
aggregates on-device op time, which is how round 3 found the encode's
hidden InstanceNorm second-pass (ROADMAP "Round-3 perf") and verified the
fix's fusion structure.

Usage::

    from latice_tpu.utils import trace, summarize_trace, format_summary
    with trace("/tmp/trace"):             # utils.profiling context manager
        run_workload()                    # repeat N times for stable stats
    print(format_summary(summarize_trace("/tmp/trace", iterations=N)))

or from the shell::

    python -m latice_tpu.utils.xla_trace /tmp/trace --iterations 5
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from dataclasses import dataclass, field

__all__ = ["OpTime", "TraceSummary", "summarize_trace", "format_summary"]


@dataclass
class OpTime:
    """Aggregated time of one XLA op across the trace."""

    name: str
    total_ms: float
    count: int
    hlo: str = ""  # long_name / HLO text when the trace carries it

    @property
    def per_iteration_ms(self) -> float:  # populated via TraceSummary
        return self.total_ms


@dataclass
class TraceSummary:
    """Per-op on-device time for one captured trace."""

    trace_file: str
    iterations: int
    total_ms: float  # sum over ops, per iteration
    ops: list[OpTime] = field(default_factory=list)  # sorted, slowest first


def _find_trace_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True)
    )
    if not hits:
        raise FileNotFoundError(
            f"no *.trace.json.gz under {path!r} — pass the directory given "
            "to jax.profiler.trace (or a trace file directly)"
        )
    return hits[-1]  # latest capture


def summarize_trace(
    path: str, iterations: int = 1, track: str = "XLA Ops"
) -> TraceSummary:
    """Aggregate per-op device time from a jax.profiler trace.

    Args:
        path: the directory passed to ``jax.profiler.trace`` (the newest
            capture inside is used) or a ``*.trace.json.gz`` file.
        iterations: number of workload repetitions inside the capture;
            reported times are divided by it.
        track: profiler thread to aggregate (default "XLA Ops"; "XLA
            Modules" gives whole-program totals).

    Returns:
        `TraceSummary` with ops sorted slowest-first, times in
        milliseconds per iteration.
    """
    trace_file = _find_trace_file(path)
    opener = gzip.open if trace_file.endswith(".gz") else open
    with opener(trace_file, "rt") as f:
        events = json.load(f)["traceEvents"]

    threads = {
        (e["pid"], e["tid"]): e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    totals: dict[str, float] = collections.defaultdict(float)
    counts: collections.Counter[str] = collections.Counter()
    hlo: dict[str, str] = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        if threads.get((e["pid"], e.get("tid"))) != track:
            continue
        name = e["name"]
        totals[name] += e.get("dur", 0)  # microseconds
        counts[name] += 1
        if name not in hlo:
            hlo[name] = (e.get("args") or {}).get("long_name", "") or ""

    it = max(1, iterations)
    ops = [
        OpTime(
            name=n,
            total_ms=d / 1e3 / it,
            count=counts[n] // it,
            hlo=hlo.get(n, ""),
        )
        for n, d in totals.items()
    ]
    ops.sort(key=lambda o: -o.total_ms)
    return TraceSummary(
        trace_file=trace_file,
        iterations=it,
        total_ms=sum(o.total_ms for o in ops),
        ops=ops,
    )


def format_summary(summary: TraceSummary, top: int = 20) -> str:
    """Human-readable table of the slowest ops."""
    lines = [
        f"{summary.trace_file}",
        f"on-device total: {summary.total_ms:.3f} ms/iteration "
        f"({len(summary.ops)} ops, {summary.iterations} iterations)",
    ]
    for op in summary.ops[:top]:
        tail = f"  {op.hlo[:90]}" if op.hlo else ""
        lines.append(
            f"{op.total_ms:9.3f} ms  x{op.count:<3} {op.name[:40]:42}{tail}"
        )
    if len(summary.ops) > top:
        rest = sum(o.total_ms for o in summary.ops[top:])
        lines.append(f"{rest:9.3f} ms  ... {len(summary.ops) - top} more ops")
    return "\n".join(lines)


def main(argv: list[str] | None = None) -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path", help="jax.profiler trace directory or .trace.json.gz")
    p.add_argument("--iterations", type=int, default=1)
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--track", default="XLA Ops")
    args = p.parse_args(argv)
    summary = summarize_trace(args.path, args.iterations, track=args.track)
    print(format_summary(summary, top=args.top))


if __name__ == "__main__":
    main()
