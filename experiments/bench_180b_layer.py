"""180B-geometry per-layer decode cost on ONE chip (reduced depth — the full
80-layer model needs a multi-chip mesh; parallel/plan.py says Q4_K wants an
8-chip TP axis). The MARGINAL layer cost between two depths isolates layer
streaming from fixed costs and, combined with the plan's per-chip byte math,
projects the multi-chip 180B number against the reference's 0.98 tok/s
partial-offload baseline (/root/reference README.md:193-199).

Geometry: n_embd 14848, 232 heads / 8 KV heads (head_dim 64), n_ff 59392 —
one layer is 2.22G params (~1.25 GB at Q4_K), so L=2 vs L=4 plus the bf16
embedding + lm_head (~2.5 GB) stays within one chip's 15.75 GB.

Usage: python experiments/bench_180b_layer.py [q4_K] [--profile]
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
    else GGMLType.Q4_K
PROFILE = "--profile" in sys.argv
CHUNK = 64

greedy = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)
res = {}
eng = None

hp4 = FalconHParams.falcon180b()
hp4.n_layer = 4
t0 = time.time()
params4 = jax.device_put(make_bench_params(hp4, gtype))
# distinct buffers per layer so HBM truly streams every layer (device-side
# clones of the prototype; values are irrelevant to throughput)
clone = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
params4["layers"] = [jax.block_until_ready(clone(lw)) for lw in params4["layers"]]
print(f"params built in {time.time() - t0:.1f}s", flush=True)

for L in (2, 4):
    hp = FalconHParams.falcon180b()
    hp.n_layer = L
    cfg = EngineConfig(n_ctx=2048, n_batch=512, kv_dtype="bfloat16",
                       compute_dtype="bfloat16", weight_mode="fused",
                       decode_chunk=CHUNK)
    params = {**params4, "layers": params4["layers"][:L]}
    eng = FalconEngine(hp, params, cfg)
    eng.eval(np.random.default_rng(0).integers(0, hp.n_vocab, 128).tolist())
    t0 = time.time()
    eng.decode_chunk(3, CHUNK, greedy)
    print(f"L={L} decode compile {time.time() - t0:.1f}s", flush=True)
    N = 192
    trials = []
    for _ in range(3):  # single trials through this device link can read 2x
        eng.rollback(128)
        t0 = time.perf_counter()
        eng.decode_pipelined(3, N, CHUNK, greedy)
        trials.append((time.perf_counter() - t0) / N * 1e3)
    res[L] = min(trials)
    print(f"{gtype.name} L={L}: {res[L]:.3f} ms/token "
          f"(trials {[f'{t:.3f}' for t in trials]})", flush=True)
    if L != 4:
        del eng

# ---- DIRECT fixed-cost measurement (VERDICT r4 #7): the non-layer work
# per decode step — embedding row gather + output norm + the 65024x14848
# lm_head quant matmul + argmax — as a 64-step jitted scan at real 180B
# geometry (single-kernel microbenches through this tunnel read ~4x slow;
# a scanned chunk amortizes dispatch like the real decode loop does).
from ggllm_tpu.models.falcon import layer_norm
from ggllm_tpu.ops.linear import linear


def _head_chunk(params, tok0):
    def body(tok, _):
        x = jnp.take(params["tok_embeddings"], tok[None, None], axis=0) \
            .astype(jnp.bfloat16)
        x = layer_norm(x, params["output_norm"], params["output_norm_b"])
        logits = linear(params["lm_head"], x, preferred_dtype=jnp.float32)
        nxt = jnp.argmax(logits[0, 0]).astype(jnp.int32)
        return nxt, nxt

    _, toks = jax.lax.scan(body, tok0, None, length=CHUNK)
    return toks


head = jax.jit(_head_chunk)
hp_head = {k: params4[k] for k in
           ("tok_embeddings", "output_norm", "output_norm_b", "lm_head")}
jax.block_until_ready(head(hp_head, jnp.int32(3)))  # compile
head_trials = []
for _ in range(3):
    t0 = time.perf_counter()
    out = head(hp_head, jnp.int32(5))
    np.asarray(out)  # dependent fetch: block_until_ready lies on this link
    head_trials.append((time.perf_counter() - t0) / CHUNK * 1e3)
fixed_direct = min(head_trials)
print(f"fixed costs MEASURED (embed + out-norm + lm_head + argmax, "
      f"{CHUNK}-step scan): {fixed_direct:.3f} ms/token "
      f"(trials {[f'{t:.3f}' for t in head_trials]})", flush=True)

marg = (res[4] - res[2]) / 2
fixed = res[2] - 2 * marg
print(f"fixed by L2/L4 extrapolation: {fixed:.3f} ms/token "
      f"(direct measurement above is the number the projection uses)",
      flush=True)
fixed = fixed_direct
full_1chip = fixed + marg * 80  # hypothetical single chip with enough HBM
# TP projection: per-chip layer bytes scale 1/mp; fixed costs (lm_head,
# sampling, dispatch) replicate. One psum/layer rides ICI (~1-2 us/layer at
# these sizes) — small vs the multi-ms layer stream; quote compute-only.
for mp in (4, 8):
    proj = fixed + marg * 80 / mp
    print(f"{gtype.name} 180B projected @ {mp}-chip TP: {proj:.2f} ms/token "
          f"= {1000 / proj:.2f} tok/s", flush=True)
print(f"{gtype.name} marginal {marg:.3f} ms/layer; fixed {fixed:.3f} ms; "
      f"80-layer single-chip-equivalent {full_1chip:.2f} ms/token = "
      f"{1000 / full_1chip:.2f} tok/s (reference partial-offload: 0.98)",
      flush=True)

if PROFILE and eng is not None:
    jax.profiler.start_trace("/tmp/trace180b")
    eng.decode_chunk(3, CHUNK, greedy)
    jax.profiler.stop_trace()
    print("trace at /tmp/trace180b")
