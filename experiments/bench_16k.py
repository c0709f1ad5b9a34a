"""Long-context (16k, dynamic NTK) prefill + decode bench, single chip."""

import sys
import time

sys.path.insert(0, ".")

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np
import jax

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.ops import sampling
from ggllm_tpu.ops.rope import ntk_alpha
from ggllm_tpu.utils.benchgen import make_bench_params

hp = FalconHParams.falcon7b()
cfg = EngineConfig(n_ctx=16384, n_batch=2048, kv_dtype="int8",
                   compute_dtype="bfloat16", weight_mode="fused",
                   decode_chunk=64)
print(f"NTK alpha at 16k: {ntk_alpha(cfg.rope, cfg.n_ctx, hp.head_dim):.1f}",
      flush=True)

params = jax.device_put(make_bench_params(hp, GGMLType.Q4_0))
eng = FalconEngine(hp, params, cfg)
rng = np.random.default_rng(0)
prompt = rng.integers(0, hp.n_vocab, 12288).tolist()

t0 = time.time()
eng.eval(prompt[:4096])
print(f"prefill compile {time.time()-t0:.1f}s", flush=True)
eng.reset()
t0 = time.perf_counter()
eng.eval(prompt)
dt = time.perf_counter() - t0
print(f"prefill 12288 tokens: {len(prompt)/dt:.0f} tok/s", flush=True)

greedy = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)
t0 = time.time()
eng.decode_chunk(3, 64, greedy)
print(f"decode compile {time.time()-t0:.1f}s", flush=True)
N, tok = 256, 3
t0 = time.perf_counter()
done = 0
while done < N:
    toks, _ = eng.decode_chunk(tok, 64, greedy)
    tok = int(toks[-1])
    done += 64
dt = time.perf_counter() - t0
print(f"decode @ n_past~{eng.n_past}: {N/dt:.1f} tok/s", flush=True)
