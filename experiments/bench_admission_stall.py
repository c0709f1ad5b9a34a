"""Decode-stall during admission prefill, measured at the BATCHER level
(the HTTP/SSE layer on this 1-core host adds its own noise; this isolates
the device-side stall VERDICT r4 #8 asks to bound).

One live stream decodes via batcher.step(); a request with a LONG prompt
(1024 tokens) is admitted mid-flight. The max step wall time around the
admission IS the stall the live stream sees. Compare prefill_chunk=1024
(whole prompt per dispatch) vs 128 (interleaved).

Usage: python experiments/bench_admission_stall.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.batching import ContinuousBatcher, Request
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.utils.benchgen import make_bench_params
from ggllm_tpu.utils.jaxenv import enable_compile_cache

enable_compile_cache()

hp = FalconHParams.falcon7b()
cfg = EngineConfig(n_ctx=2048, n_batch=512, kv_dtype="bfloat16",
                   compute_dtype="bfloat16", weight_mode="fused")
t0 = time.time()
params = jax.device_put(make_bench_params(hp, GGMLType.Q4_0))
print(f"params {time.time()-t0:.1f}s backend={jax.default_backend()}",
      file=sys.stderr, flush=True)

rng = np.random.default_rng(0)
LONG = [int(t) for t in rng.integers(0, hp.n_vocab, 1024)]

for pc in (1024, 256, 128):
    eng = FalconEngine(hp, params, cfg, batch_size=8)
    cb = ContinuousBatcher(eng, chunk=8, prefill_chunk=pc)
    live = cb.submit(Request([5, 17, 130], n_predict=512, temp=0.8,
                             top_k=40, stop_ids=frozenset()))
    # warm all programs: decode chunks + the admission's prefill bucket
    for _ in range(4):
        cb.step()
    warm = cb.submit(Request(LONG, n_predict=2))
    while not warm.done:
        cb.step()
    # steady decode, then admit the long prompt mid-flight
    gaps = []
    req = None
    for i in range(40):
        t0 = time.perf_counter()
        if i == 10:
            req = cb.submit(Request(LONG, n_predict=4))
        cb.step()
        gaps.append(time.perf_counter() - t0)
    base = sorted(gaps[:10])[5]
    print(f"prefill_chunk={pc:5d}: steady step {base*1e3:6.1f} ms, "
          f"max step during admission {max(gaps[10:])*1e3:6.1f} ms "
          f"(stall bound = max - steady = "
          f"{(max(gaps[10:]) - base)*1e3:6.1f} ms)", flush=True)
