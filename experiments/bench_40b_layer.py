"""40B-geometry per-layer decode cost (reduced depth — full 40B exceeds one
chip's 15.75GB HBM; per-layer cost extrapolates to the 60-layer number)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType, type_from_name
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.ops import sampling
from ggllm_tpu.utils.benchgen import make_bench_params

gtype = type_from_name(sys.argv[1]) if len(sys.argv) > 1 else GGMLType.Q4_K
L = int(sys.argv[2]) if len(sys.argv) > 2 else 8
PROFILE = "--profile" in sys.argv

hp = FalconHParams.falcon40b()
hp.n_layer = L
cfg = EngineConfig(n_ctx=2048, n_batch=512, kv_dtype="bfloat16",
                   compute_dtype="bfloat16", weight_mode="fused")

t0 = time.time()
params = jax.device_put(make_bench_params(hp, gtype))
print(f"params {time.time()-t0:.1f}s backend={jax.default_backend()}", flush=True)

eng = FalconEngine(hp, params, cfg)
rng = np.random.default_rng(0)
eng.eval(rng.integers(0, hp.n_vocab, 128).tolist())

greedy = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)
t0 = time.time()
eng.decode_chunk(3, 16, greedy)
print(f"decode compile {time.time()-t0:.1f}s", flush=True)

N = 96
tok, done = 3, 0
t0 = time.perf_counter()
while done < N:
    toks, _ = eng.decode_chunk(tok, 16, greedy)
    tok = int(toks[-1])
    done += 16
dt = time.perf_counter() - t0
ms_tok = dt / N * 1e3
# subtract the non-layer cost (embed+norm+lm_head+sampling) estimated from a
# second, shallower run? keep simple: report raw per-layer
print(f"{gtype.name} L={L}: {ms_tok:.3f} ms/token -> {ms_tok/L:.4f} ms/layer; "
      f"60-layer extrapolation {1000/(ms_tok/L*60):.2f} tok/s", flush=True)

if PROFILE:
    jax.profiler.start_trace("/tmp/trace40b")
    eng.decode_chunk(tok, 16, greedy)
    jax.profiler.stop_trace()
    print("trace at /tmp/trace40b")
