"""Full Falcon-40B end-to-end decode on ONE chip — measured, not extrapolated.

All 60 layers at real 40B geometry (n_embd 8192, 128 heads / 8 KV heads,
n_ff 32768, vocab 65024) with Q2_K weights: ~13.4 GB of packed planes +
bf16 embedding + KV cache fits the chip's 15.75 GB HBM. Layer VALUES are
synthetic (bench cares about bytes streamed), but every layer gets its own
device buffers — the packed prototype is built once on the host and cloned
59 times ON DEVICE, so HBM genuinely holds and streams the full model
(distinct-buffer requirement validated in round 2; cloning on device avoids
a half-hour host repack).

Reference flagship baseline: Falcon-40B Q4_K 18.31 tok/s on TWO GPUs
(/root/reference README.md:162-171); Q6_K 16.77 (README.md:152-160).

Usage: python experiments/bench_40b_full.py [q2_K] [--profile]
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType, type_from_name
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.ops import sampling
from ggllm_tpu.utils.benchgen import make_bench_params

gtype = type_from_name(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
    else GGMLType.Q2_K
PROFILE = "--profile" in sys.argv
CHUNK = 64

hp = FalconHParams.falcon40b()
cfg = EngineConfig(n_ctx=2048, n_batch=512, kv_dtype="bfloat16",
                   compute_dtype="bfloat16", weight_mode="fused",
                   decode_chunk=CHUNK)

t0 = time.time()
hp1 = FalconHParams.falcon40b()
hp1.n_layer = 1
params1 = jax.device_put(make_bench_params(hp1, gtype))
proto = params1["layers"][0]
print(f"prototype layer built in {time.time() - t0:.1f}s", flush=True)

# clone on device: one compiled copy per call, distinct output buffers
clone = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
t0 = time.time()
layers = [jax.block_until_ready(clone(proto)) for _ in range(hp.n_layer)]
params = {**params1, "layers": layers}
del params1, proto
print(f"{hp.n_layer} device layer clones in {time.time() - t0:.1f}s", flush=True)

try:
    stats = jax.devices()[0].memory_stats()
    print(f"HBM in use: {stats['bytes_in_use'] / 1e9:.2f} GB "
          f"/ {stats.get('bytes_limit', 0) / 1e9:.2f} GB", flush=True)
except Exception:
    pass

eng = FalconEngine(hp, params, cfg)
prompt = np.random.default_rng(0).integers(0, hp.n_vocab, 128).tolist()
t0 = time.time()
eng.eval(prompt)
dt_prefill = time.time() - t0
print(f"prefill+compile {dt_prefill:.1f}s", flush=True)

# measured prefill (warm): re-ingest the prompt after rollback
eng.rollback(0)
t0 = time.perf_counter()
eng.eval(prompt)
prefill_tps = len(prompt) / (time.perf_counter() - t0)
print(f"prefill {prefill_tps:.0f} tok/s @128", flush=True)

greedy = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)
t0 = time.time()
eng.decode_chunk(3, CHUNK, greedy)
print(f"decode compile {time.time() - t0:.1f}s", flush=True)

N = 192
trials = []
for _ in range(3):  # single trials through this device link can read 2x off
    eng.rollback(128)
    t0 = time.perf_counter()
    eng.decode_pipelined(3, N, CHUNK, greedy)
    trials.append((time.perf_counter() - t0) / N * 1e3)
ms = min(trials)
print(f"FULL 40B {gtype.name}: {ms:.2f} ms/token = {1000 / ms:.2f} tok/s "
      f"(trials {[f'{t:.2f}' for t in trials]}; reference 2-GPU Q4_K: 18.31)",
      flush=True)

if PROFILE:
    jax.profiler.start_trace("/tmp/trace40b_full")
    eng.decode_chunk(3, CHUNK, greedy)
    jax.profiler.stop_trace()
    print("trace at /tmp/trace40b_full")
