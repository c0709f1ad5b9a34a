"""Benchmark: Falcon-7B 4-bit decode tokens/sec on one TPU chip.

Measures steady-state single-stream decode throughput at real Falcon-7B
geometry with Q4_0 weights (BASELINE config 1/2 analogue; the reference's
comparable number is 45.99 tok/s for 7B Q4_1 on an RTX 4090, README.md:183-191).

Startup is engineered to be fast and predictable — XLA compiles through the
device tunnel have shown 30-400 s variance, and the round-3 driver run timed
out — so the bench:
  * builds synthetic params DIRECTLY in fused-kernel layout (~14 s, no
    quantize/repack pass, no native build; utils/benchgen.fast_kernel_quant);
  * compiles ONE program (the fused decode loop) — no prefill: decode_chunk
    starts from a fresh KV cache at n_past=0, and decode cost is dominated by
    weight streaming, not the <=384-token KV read;
  * persists the compile cache in-repo so re-runs on this machine are warm.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_TOKS = 45.99  # reference Falcon-7B Q4_1 decode on RTX 4090
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_compile_cache")


def main():
    import jax

    # persistent compile cache: first compiles through the device tunnel can
    # take minutes; repeated bench runs should not pay twice. In-repo so it
    # survives as long as the checkout does (unlike /tmp).
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    # cache EVERYTHING (min 0): through a degraded tunnel even trivial
    # compiles can queue for minutes, so every miss avoided counts
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from ggllm_tpu.core.config import EngineConfig, FalconHParams
    from ggllm_tpu.core.dtypes import GGMLType
    from ggllm_tpu.engine.engine import FalconEngine
    from ggllm_tpu.ops import sampling
    from ggllm_tpu.utils.benchgen import make_bench_params

    hp = FalconHParams.falcon7b()
    # decode_chunk 128: module-boundary overhead through the device tunnel
    # is ~1.3 ms/token at chunk 16 and ~0.6 at 64; 128 amortizes it
    # (measured 82/90.4/90.9 tok/s at 64/128/256)
    cfg = EngineConfig(n_ctx=2048, n_batch=512, kv_dtype="bfloat16",
                       compute_dtype="bfloat16", weight_mode="fused",
                       decode_chunk=128)

    t0 = time.time()
    params = make_bench_params(hp, GGMLType.Q4_0)
    params = jax.device_put(params)
    jax.block_until_ready(params["lm_head"].planes["q"])
    print(f"params built in {time.time() - t0:.1f}s; backend={jax.default_backend()}",
          file=sys.stderr)

    engine = FalconEngine(hp, params, cfg)
    rng = np.random.default_rng(0)
    greedy = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)
    tok = int(rng.integers(0, hp.n_vocab))
    chunk = cfg.decode_chunk

    # warmup: compiles the fused decode loop (the only compile in this bench)
    t0 = time.time()
    engine.decode_chunk(tok, chunk, greedy)
    print(f"decode-loop compile {time.time() - t0:.1f}s", file=sys.stderr)

    n_decode = 256
    t0 = time.perf_counter()
    # pipelined: the next chunk dispatches with its first token still on
    # device, so host/tunnel latency overlaps compute (engine.decode_pipelined)
    engine.decode_pipelined(tok, n_decode, chunk, greedy)
    dt = time.perf_counter() - t0
    toks = n_decode / dt

    print(json.dumps({
        "metric": "falcon7b_q4_decode_tokens_per_sec_per_chip",
        "value": round(toks, 2),
        "unit": "tok/s",
        "vs_baseline": round(toks / BASELINE_TOKS, 3),
    }))


def run_with_retries():
    """Run the measurement in subprocess attempts with per-attempt timeouts.

    The device tunnel intermittently degrades: a dispatch that normally takes
    ~1 s has been observed to block 5+ minutes (the round-3 driver bench
    timed out on such a window). One attempt hitting a bad window must not
    consume the whole outer budget — later attempts reuse the persistent
    compile cache, so a retry costs ~40 s when the tunnel recovers.

    Children run in their own session (so a timed-out attempt's whole process
    group can be killed by exact pgid) AND with PDEATHSIG=SIGKILL (so if THIS
    process is killed by an outer timeout, the child dies too instead of
    lingering as an orphan that holds the TPU and poisons the next run).
    """
    import ctypes
    import signal
    import subprocess

    def _child_setup():
        os.setsid()
        PR_SET_PDEATHSIG = 1
        try:
            ctypes.CDLL("libc.so.6", use_errno=True).prctl(
                PR_SET_PDEATHSIG, signal.SIGKILL)
        except OSError:
            pass  # non-Linux: orphan risk accepted

    def _drop_cache(reason):
        # A killed attempt can leave a corrupt/partial cache entry behind, and
        # a corrupt entry has been observed to HANG subsequent compiles (not
        # just miss). Rotate the whole dir away so the next attempt recompiles
        # from scratch (~40 s) instead of wedging.
        if os.path.isdir(CACHE_DIR):
            os.rename(CACHE_DIR, f"{CACHE_DIR}.dropped.{int(time.time())}")
            print(f"dropped compile cache ({reason})", file=sys.stderr)

    # budgets sized for compile-service weather: fresh decode-loop
    # compiles measured 28-78 s on good days and 224 s in a bad
    # window (round 5) — every attempt must out-wait the worst case
    for attempt, budget in enumerate((240, 300, 420)):
        if attempt:
            _drop_cache("previous attempt failed")
        t0 = time.time()
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--once"],
            stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
            preexec_fn=_child_setup,
        )
        try:
            out, _ = proc.communicate(timeout=budget)
        except subprocess.TimeoutExpired:
            os.killpg(proc.pid, signal.SIGKILL)  # exact child pgid, not a pattern
            proc.wait()
            print(f"attempt timed out after {budget}s, retrying",
                  file=sys.stderr)
            continue
        line = next((ln for ln in (out or "").splitlines()
                     if ln.startswith("{")), None)
        if proc.returncode == 0 and line:
            print(line)
            return 0
        print(f"attempt failed rc={proc.returncode} in {time.time()-t0:.0f}s, "
              "retrying", file=sys.stderr)
    return 1


if __name__ == "__main__":
    if "--once" in sys.argv:
        main()
    else:
        sys.exit(run_with_retries())
