"""One-command regression target (the perf-run-all/ppl-run-all discipline
applied to the repo itself, scripts/perf-run-all.sh:1-40 analogue):

    python scripts/smoke.py [--fast] [--no-bench]

Runs, in order:
  1. the unit/parity suite  (pytest tests/ -q; --fast deselects the slow
     multi-device suites)
  2. the multi-chip dryrun  (8 virtual CPU devices)
  3. the multi-host dryrun  (2 processes x 4 devices)
  4. bench.py               (real accelerator; skipped with --no-bench)

and appends one JSON line per run to scripts/smoke_results.jsonl.
Exit code 0 = all stages green.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_stage(name: str, cmd: list[str], env=None, timeout=3600) -> dict:
    t0 = time.time()
    print(f"=== {name}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=ROOT, env=env, timeout=timeout,
                          capture_output=True, text=True)
    dt = time.time() - t0
    ok = proc.returncode == 0
    tail = (proc.stdout + proc.stderr)[-2000:]
    print(tail[-800:])
    print(f"=== {name}: {'OK' if ok else 'FAILED'} ({dt:.1f}s)", flush=True)
    return {"stage": name, "ok": ok, "seconds": round(dt, 1),
            "tail": tail if not ok else tail[-400:]}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="skip the slow multi-device test files")
    ap.add_argument("--no-bench", action="store_true",
                    help="skip the real-accelerator bench stage")
    args = ap.parse_args(argv)

    results = []
    pytest_cmd = [sys.executable, "-m", "pytest", "tests/", "-q", "-x"]
    if args.fast:
        pytest_cmd += ["--ignore=tests/test_tp_fused.py",
                       "--ignore=tests/test_seq_parallel.py",
                       "--ignore=tests/test_sharding.py"]
    results.append(run_stage("pytest", pytest_cmd))

    results.append(run_stage(
        "dryrun_multichip",
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"]))

    results.append(run_stage(
        "dryrun_multihost",
        [sys.executable, os.path.join("scripts", "multihost_dryrun.py"),
         "2", "4"]))

    bench = None
    if not args.no_bench:
        r = run_stage("bench", [sys.executable, "bench.py"], timeout=1800)
        results.append(r)
        for line in r["tail"].splitlines():
            try:
                obj = json.loads(line)
                if "metric" in obj:
                    bench = obj
            except (ValueError, TypeError):
                pass

    ok = all(r["ok"] for r in results)
    record = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "git": subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              cwd=ROOT, capture_output=True,
                              text=True).stdout.strip(),
        "ok": ok,
        "stages": [{k: r[k] for k in ("stage", "ok", "seconds")}
                   for r in results],
        "bench": bench,
    }
    log = os.path.join(ROOT, "scripts", "smoke_results.jsonl")
    with open(log, "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
