"""Batched decode benchmark + profile on the real chip (B rows decode
together; the continuous-batching serving path).

Usage: python scripts/bench_batched.py [B] [CHUNK] [--profile]

History: r1 vmap'd per-row KV writes lowered to XLA copy cascades (80% of
step time, 123-235 tok/s aggregate at B=8); r2 defers all layers' writes to
one scatter with append-aware attention -> 474 tok/s; with the 4608-column
kernel chunks -> 511 tok/s; with the affine-correction kernel -> 531 tok/s;
deferring the scatter to once per CHUNK (the scatter's layout round-trip
copies the whole cache twice) -> 599 @chunk16 / 663 @32 / 714 @64 tok/s
(89.2 steps/s at chunk 64 — 1.25x a single-stream step for 8 rows; larger
chunks amortize the dispatch gap but add stop-check latency, so the server
default stays small while throughput serving should pass --decode-chunk 64).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.utils.benchgen import make_bench_params

KV = "int8" if "--kv-int8" in sys.argv else "bfloat16"
args = [a for a in sys.argv[1:] if not a.startswith("--")]
B = int(args[0]) if args else 8
CHUNK = int(args[1]) if len(args) > 1 else 64
PROFILE = "--profile" in sys.argv

hp = FalconHParams.falcon7b()
cfg = EngineConfig(n_ctx=2048, n_batch=512, kv_dtype=KV,
                   compute_dtype="bfloat16", weight_mode="fused")

t0 = time.time()
params = jax.device_put(make_bench_params(hp, GGMLType.Q4_0))
print(f"params {time.time()-t0:.1f}s backend={jax.default_backend()}", flush=True)

eng = FalconEngine(hp, params, cfg, batch_size=B)
rng = np.random.default_rng(0)

# rows at staggered positions around 1k context
n_past = (1000 + np.arange(B) * 37).astype(np.int32)
toks = rng.integers(0, hp.n_vocab, B).astype(np.int32)
temp = np.zeros(B, np.float32)
top_p = np.ones(B, np.float32)

t0 = time.time()
out, key = eng.decode_rows(toks, n_past, CHUNK, temp, top_p)
print(f"compile {time.time()-t0:.1f}s", flush=True)

N = 128 if CHUNK <= 128 else CHUNK
t0 = time.perf_counter()
done = 0
while done < N:
    out, key = eng.decode_rows(out[-1], n_past + done, CHUNK, temp, top_p,
                               rng_key=key)
    done += CHUNK
dt = time.perf_counter() - t0
print(f"B={B} chunk={CHUNK}: {N} steps in {dt:.3f}s -> {N/dt:.1f} steps/s, "
      f"{B*N/dt:.1f} tok/s aggregate", flush=True)

if PROFILE:
    jax.profiler.start_trace("/tmp/batched_trace")
    out, key = eng.decode_rows(out[-1], n_past + done, CHUNK, temp, top_p,
                               rng_key=key)
    jax.profiler.stop_trace()
    print("trace written to /tmp/batched_trace")
