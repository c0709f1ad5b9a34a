"""utils/traceview: per-op timing tables from jax profiler traces
(the reference's --debug-timings / ggml_graph_print_impl analogue).

Uses a synthetic Chrome-trace file so the test doesn't depend on the
profiler's (backend-specific) output; an integration check then parses a
real trace produced by jax.profiler on the CPU backend.
"""

import gzip
import json
import os

import pytest

from ggllm_tpu.utils import traceview


def _write_trace(dirpath, events):
    sub = os.path.join(dirpath, "plugins", "profile", "2026_01_01")
    os.makedirs(sub)
    with gzip.open(os.path.join(sub, "host.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)
    return dirpath


def test_device_pid_filtering(tmp_path):
    """Only events on the device process count; python frames excluded."""
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "python"}},
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.1", "dur": 100.0},
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.1", "dur": 300.0},
        {"ph": "X", "pid": 3, "tid": 3, "name": "copy.2", "dur": 50.0},
        {"ph": "X", "pid": 1, "tid": 1, "name": "host_thing", "dur": 9e6},
        {"ph": "X", "pid": 3, "tid": 3, "name": "$builtins len", "dur": 1e6},
    ]
    stats = traceview.load_op_stats(_write_trace(str(tmp_path), events))
    by_name = {s.name: s for s in stats}
    assert set(by_name) == {"fusion.1", "copy.2"}
    assert by_name["fusion.1"].calls == 2
    assert by_name["fusion.1"].total_us == 400.0
    assert by_name["fusion.1"].mean_us == 200.0
    assert stats[0].name == "fusion.1"  # sorted by total desc


def test_cpu_thread_filtering(tmp_path):
    """No device pid: keep executor threads, drop python + codegen."""
    events = [
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 7, "tid": 1, "name": "thread_name",
         "args": {"name": "python"}},
        {"ph": "M", "pid": 7, "tid": 2, "name": "thread_name",
         "args": {"name": "tf_XLAEigen/123"}},
        {"ph": "M", "pid": 7, "tid": 3, "name": "thread_name",
         "args": {"name": "tf_xla-cpu-codegen/456"}},
        {"ph": "X", "pid": 7, "tid": 2, "name": "dot.5", "dur": 10.0},
        {"ph": "X", "pid": 7, "tid": 1, "name": "PjitFunction(f)", "dur": 99.0},
        {"ph": "X", "pid": 7, "tid": 3, "name": "Canonicalizer", "dur": 88.0},
    ]
    stats = traceview.load_op_stats(_write_trace(str(tmp_path), events))
    assert [s.name for s in stats] == ["dot.5"]


def test_format_table_levels_and_gbps(tmp_path):
    stats = [traceview.OpStat(f"op{i}", 1, 1000.0 - i) for i in range(40)]
    t1 = traceview.format_table(stats, 1)
    assert "op0" in t1 and "op20" not in t1 and "more ops" in t1
    t3 = traceview.format_table(stats, 3)
    assert "op39" in t3 and "more ops" not in t3
    # 4e9 bytes / 1000 us -> 4000 GB/s in the derived column
    t = traceview.format_table([traceview.OpStat("big_matmul", 2, 2000.0)],
                               1, bytes_by_op={"matmul": 4 * 10**9})
    assert "4000" in t


def test_missing_trace_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        traceview.load_op_stats(str(tmp_path))


def test_real_cpu_trace(tmp_path):
    """End to end: profile a jitted fn, parse, find a device op."""
    import jax
    import jax.numpy as jnp

    d = str(tmp_path / "prof")
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((256, 256))
    f(x)  # compile outside the trace
    jax.profiler.start_trace(d)
    jax.block_until_ready(f(x))
    jax.profiler.stop_trace()
    stats = traceview.load_op_stats(d)
    assert stats, "no device ops parsed from a real trace"
    assert all(not s.name.startswith("$") for s in stats)
    out = traceview.format_table(stats, 2)
    assert "TOTAL device op time" in out
