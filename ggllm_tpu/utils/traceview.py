"""Per-op timing tables from a jax profiler trace.

The reference prints per-node op timing tables when run with
``--debug-timings 1..3`` (ggml_graph_print_impl, ggml.c:18266 — op name,
runs, per-run ms, placement). XLA owns our schedule, so the equivalent
evidence comes from a ``jax.profiler`` trace: this module parses the
Chrome-trace JSON that ``jax.profiler.stop_trace`` writes (the
tensorboard converter is broken by protobuf versioning in this
environment, the raw ``*.trace.json.gz`` is not) and aggregates device
op durations by name.

Used by ``tools/main.py --debug-timings`` (wraps generation in a trace to
a temp dir and prints the table on exit) and usable standalone::

    python -m ggllm_tpu.utils.traceview /tmp/prof
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from dataclasses import dataclass


@dataclass
class OpStat:
    name: str
    calls: int
    total_us: float

    @property
    def mean_us(self) -> float:
        return self.total_us / max(self.calls, 1)


def _trace_files(trace_dir: str) -> list[str]:
    # jax.profiler writes <dir>/plugins/profile/<ts>/<host>.trace.json.gz
    pat = os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")
    files = sorted(glob.glob(pat))
    if not files:  # accept a direct file path too
        if os.path.isfile(trace_dir):
            return [trace_dir]
        raise FileNotFoundError(f"no trace under {trace_dir}")
    return files


def _device_lane(events: list[dict]):
    """Predicate selecting device-execution events.

    On TPU the device timeline is its own process ("/device:TPU:N"); on
    the CPU backend everything shares one "/host:CPU" process and the XLA
    executor threads are distinguished by thread names ("tf_XLAEigen/…",
    "tf_xla-cpu-codegen/…") from the "python" host thread. Python frame
    events additionally carry "$file:line"-style names — excluded as a
    safety net when metadata is missing.
    """
    pnames: dict[int, str] = {}
    tnames: dict[tuple[int, int], str] = {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pnames[e.get("pid", -1)] = e.get("args", {}).get("name", "")
        elif e.get("name") == "thread_name":
            tnames[(e.get("pid", -1), e.get("tid", -1))] = \
                e.get("args", {}).get("name", "")
    dev_pids = {pid for pid, n in pnames.items()
                if "/device:" in n or "TPU" in n or "GPU" in n}

    def keep(e: dict) -> bool:
        name = e.get("name", "")
        if name.startswith("$"):  # python frame event
            return False
        if dev_pids:
            return e.get("pid") in dev_pids
        tn = tnames.get((e.get("pid", -1), e.get("tid", -1)), "")
        if not tnames:
            return True
        # executor threads only — compiler pass timelines ("…codegen…")
        # would otherwise swamp the table on the CPU backend
        return tn.startswith("tf_") and "codegen" not in tn

    return keep


def load_op_stats(trace_dir: str) -> list[OpStat]:
    """Aggregate complete ("X") events on device lanes by op name."""
    agg: dict[str, OpStat] = {}
    for path in _trace_files(trace_dir):
        with gzip.open(path, "rt") as f:
            trace = json.load(f)
        events = trace.get("traceEvents", [])
        keep = _device_lane(events)
        for e in events:
            if e.get("ph") != "X" or not keep(e):
                continue
            name = e.get("name", "?")
            dur = float(e.get("dur", 0.0))  # microseconds
            st = agg.get(name)
            if st is None:
                agg[name] = OpStat(name, 1, dur)
            else:
                st.calls += 1
                st.total_us += dur
    return sorted(agg.values(), key=lambda s: -s.total_us)


def format_table(stats: list[OpStat], level: int = 1,
                 bytes_by_op: dict[str, int] | None = None) -> str:
    """Human table like the reference's debug-timings dump.

    level 1: top 15 ops; 2: top 40; 3: everything. ``bytes_by_op`` maps an
    op-name substring to HBM bytes moved per call — matching rows get a
    derived GB/s column (the number that matters on a bandwidth-bound
    decode).
    """
    limit = {1: 15, 2: 40}.get(level, len(stats))
    total = sum(s.total_us for s in stats) or 1.0
    lines = [f"{'op':<52} {'calls':>7} {'mean us':>9} "
             f"{'total ms':>9} {'%':>5}  GB/s"]
    for s in stats[:limit]:
        gbps = ""
        if bytes_by_op:
            for key, nbytes in bytes_by_op.items():
                if key in s.name:
                    gbps = f"{nbytes / (s.mean_us * 1e-6) / 1e9:6.0f}"
                    break
        name = s.name if len(s.name) <= 52 else s.name[:49] + "..."
        lines.append(f"{name:<52} {s.calls:>7} {s.mean_us:>9.1f} "
                     f"{s.total_us / 1e3:>9.2f} {100 * s.total_us / total:>4.1f}%  {gbps}")
    if len(stats) > limit:
        rest = sum(s.total_us for s in stats[limit:])
        lines.append(f"{'... ' + str(len(stats) - limit) + ' more ops':<52} "
                     f"{'':>7} {'':>9} {rest / 1e3:>9.2f} {100 * rest / total:>4.1f}%")
    lines.append(f"{'TOTAL device op time':<52} {'':>7} {'':>9} "
                 f"{total / 1e3:>9.2f}")
    return "\n".join(lines)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("trace_dir")
    ap.add_argument("-l", "--level", type=int, default=2, choices=[1, 2, 3])
    args = ap.parse_args(argv)
    print(format_table(load_op_stats(args.trace_dir), args.level))


if __name__ == "__main__":
    main()
