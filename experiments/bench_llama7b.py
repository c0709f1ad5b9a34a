"""LLaMA-7B-geometry Q4_0 decode + prefill on one chip (the second model
family on the same engine; llama.cpp-lineage runtime, SURVEY §2.7)."""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np

from ggllm_tpu.core.config import EngineConfig, LlamaHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.ops import sampling
from ggllm_tpu.utils.benchgen import make_llama_bench_params

hp = LlamaHParams.llama7b()
cfg = EngineConfig(n_ctx=2048, n_batch=512, kv_dtype="bfloat16",
                   compute_dtype="bfloat16", weight_mode="fused",
                   decode_chunk=128)
t0 = time.time()
params = jax.device_put(make_llama_bench_params(hp, GGMLType.Q4_0))
print(f"params {time.time() - t0:.1f}s backend={jax.default_backend()}",
      flush=True)
eng = FalconEngine(hp, params, cfg)
rng = np.random.default_rng(0)
prompt = rng.integers(0, hp.n_vocab, 512).tolist()
t0 = time.time()
eng.eval(prompt)
print(f"prefill compile {time.time() - t0:.1f}s", flush=True)
eng.reset()
t0 = time.perf_counter()
eng.eval(prompt)
dt = time.perf_counter() - t0
print(f"prefill 512: {512 / dt:.0f} tok/s", flush=True)

greedy = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)
t0 = time.time()
eng.decode_chunk(3, 128, greedy)
print(f"decode compile {time.time() - t0:.1f}s", flush=True)
eng.rollback(512)
N = 512
t0 = time.perf_counter()
eng.decode_pipelined(3, N, 128, greedy)
dt = time.perf_counter() - t0
print(f"llama7b q4_0 decode: {N / dt:.2f} tok/s ({dt / N * 1e3:.2f} ms/tok)",
      flush=True)
