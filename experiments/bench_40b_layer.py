"""40B-geometry per-layer decode cost (reduced depth — full 40B exceeds one
chip's 15.75GB HBM; the MARGINAL per-layer cost between two depths isolates
layer streaming from fixed costs (lm_head/embedding/sampling/dispatch) and
extrapolates to the 60-layer number).

Usage: python experiments/bench_40b_layer.py [q4_k] [--profile]
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType, type_from_name
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.ops import sampling
from ggllm_tpu.utils.benchgen import make_bench_params

gtype = type_from_name(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
    else GGMLType.Q4_K
PROFILE = "--profile" in sys.argv
CHUNK = 64

greedy = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)
res = {}
eng = None
# build the parameter pytree ONCE at max depth; shallower engines reuse the
# same device buffers (layers alias one prototype anyway) — the repack is
# the dominant cost of this script on a small host
hp8 = FalconHParams.falcon40b()
hp8.n_layer = 8
t0 = time.time()
params8 = jax.device_put(make_bench_params(hp8, gtype))
print(f"params built in {time.time() - t0:.1f}s", flush=True)
for L in (4, 8):
    hp = FalconHParams.falcon40b()
    hp.n_layer = L
    cfg = EngineConfig(n_ctx=2048, n_batch=512, kv_dtype="bfloat16",
                       compute_dtype="bfloat16", weight_mode="fused",
                       decode_chunk=CHUNK)
    params = {**params8, "layers": params8["layers"][:L]}
    eng = FalconEngine(hp, params, cfg)
    eng.eval(np.random.default_rng(0).integers(0, hp.n_vocab, 128).tolist())
    t0 = time.time()
    eng.decode_chunk(3, CHUNK, greedy)
    print(f"L={L} decode compile {time.time() - t0:.1f}s", flush=True)
    N = 256
    trials = []
    for _ in range(3):  # single trials through this device link can read 2x
        eng.rollback(128)
        t0 = time.perf_counter()
        eng.decode_pipelined(3, N, CHUNK, greedy)
        trials.append((time.perf_counter() - t0) / N * 1e3)
    res[L] = min(trials)
    print(f"{gtype.name} L={L}: {res[L]:.3f} ms/token "
          f"(trials {[f'{t:.3f}' for t in trials]})", flush=True)
    if L != 8:
        del eng

marg = (res[8] - res[4]) / 4
full = res[8] + marg * 52
print(f"{gtype.name} marginal {marg:.3f} ms/layer; 60-layer estimate "
      f"{full:.2f} ms/token = {1000 / full:.2f} tok/s "
      f"(reference 2xGPU baseline: 18.31)", flush=True)

if PROFILE and eng is not None:
    jax.profiler.start_trace("/tmp/trace40b")
    eng.decode_chunk(3, CHUNK, greedy)
    jax.profiler.stop_trace()
    print("trace at /tmp/trace40b")
