"""XLA trace summarization: parsing, aggregation, CLI formatting."""

import gzip
import json

import pytest

from latice_tpu.utils import format_summary, summarize_trace


def _write_trace(path, *, iterations=2):
    """A minimal Perfetto trace shaped like jax.profiler output: metadata
    naming the 'XLA Ops' thread plus duration events across iterations."""
    events = [
        {"ph": "M", "pid": 1, "tid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 1, "tid": 10, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 1, "tid": 11, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 2, "tid": 1, "name": "thread_name",
         "args": {"name": "python"}},  # host track must be ignored
    ]
    t = 0
    for _ in range(iterations):
        for name, dur, hlo in [
            ("conv_fusion", 1500, "%conv_fusion = bf16[8,64,64,32] fusion(...)"),
            ("reduce_fusion", 500, "%reduce_fusion = f32[8,32] fusion(...)"),
            ("conv_fusion", 1500, ""),  # second call of the same op
        ]:
            events.append(
                {"ph": "X", "pid": 1, "tid": 10, "name": name,
                 "ts": t, "dur": dur, "args": {"long_name": hlo}}
            )
            t += dur
        # module-level and host events must not count toward "XLA Ops"
        events.append({"ph": "X", "pid": 1, "tid": 11, "name": "jit_step",
                       "ts": 0, "dur": 99999, "args": {}})
        events.append({"ph": "X", "pid": 2, "tid": 1, "name": "python_call",
                       "ts": 0, "dur": 12345, "args": {}})
    raw = json.dumps({"traceEvents": events}).encode()
    f = path / "plugins" / "profile" / "2026_01_01" / "host.trace.json.gz"
    f.parent.mkdir(parents=True)
    f.write_bytes(gzip.compress(raw))
    return f


class TestSummarizeTrace:
    def test_aggregates_per_iteration(self, tmp_path):
        _write_trace(tmp_path, iterations=2)
        s = summarize_trace(str(tmp_path), iterations=2)
        assert s.iterations == 2
        by_name = {o.name: o for o in s.ops}
        # conv_fusion: 2 calls x 1.5 ms per iteration.
        assert by_name["conv_fusion"].total_ms == pytest.approx(3.0)
        assert by_name["conv_fusion"].count == 2
        assert by_name["reduce_fusion"].total_ms == pytest.approx(0.5)
        assert s.total_ms == pytest.approx(3.5)
        # Slowest first.
        assert s.ops[0].name == "conv_fusion"
        # HLO text captured when present.
        assert "bf16[8,64,64,32]" in by_name["conv_fusion"].hlo

    def test_other_tracks_excluded(self, tmp_path):
        _write_trace(tmp_path)
        s = summarize_trace(str(tmp_path), iterations=2)
        names = {o.name for o in s.ops}
        assert "jit_step" not in names and "python_call" not in names
        mods = summarize_trace(str(tmp_path), iterations=2, track="XLA Modules")
        assert {o.name for o in mods.ops} == {"jit_step"}

    def test_direct_file_and_missing(self, tmp_path):
        f = _write_trace(tmp_path)
        assert summarize_trace(str(f)).total_ms > 0
        with pytest.raises(FileNotFoundError, match="trace.json.gz"):
            summarize_trace(str(tmp_path / "nowhere"))

    def test_format_summary(self, tmp_path):
        _write_trace(tmp_path)
        s = summarize_trace(str(tmp_path), iterations=2)
        text = format_summary(s, top=1)
        assert "conv_fusion" in text
        assert "1 more ops" in text
        assert "ms/iteration" in text

    def test_cli_main(self, tmp_path, capsys):
        from latice_tpu.utils.xla_trace import main

        _write_trace(tmp_path)
        main([str(tmp_path), "--iterations", "2", "--top", "5"])
        out = capsys.readouterr().out
        assert "conv_fusion" in out and "reduce_fusion" in out


class TestLiveCapture:
    def test_roundtrip_with_profiler(self, tmp_path):
        """End to end: capture a real jax.profiler trace and summarize it.

        On the CPU test backend the ops differ from TPU, but the trace
        format is identical; at minimum the file parses and reports
        non-negative totals.
        """
        import jax
        import jax.numpy as jnp

        from latice_tpu.utils import trace

        f = jax.jit(lambda x: (x @ x.T).sum())
        x = jnp.ones((64, 64))
        float(f(x))  # compile outside the capture
        with trace(str(tmp_path / "cap")):
            for _ in range(3):
                out = f(x)
            float(out)
        s = summarize_trace(str(tmp_path / "cap"), iterations=3)
        assert s.total_ms >= 0.0
        assert isinstance(format_summary(s), str)
