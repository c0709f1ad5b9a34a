"""Batched speculative decoding cost at Falcon-7B geometry (one chip).

generate_rows runs fused greedy draft/verify rounds over B rows at once.
Synthetic weights can't show a real acceptance (self-draft of random
weights diverges, alpha ~= 0), so this measures:

  * ms/round at B rows (cost side; per-row rate = tokens/round / ms)
  * the alpha=1 UPPER BOUND end-to-end: draft == target (every draft
    accepted) gives the real aggregate tok/s ceiling of the machinery.

Compare against plain batched decode (scripts/bench_batched.py: 722 tok/s
aggregate @B=8).

Usage: python experiments/bench_spec_batched.py [--b 8] [--k 8]
       [--draft-layers 4]
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

ap = argparse.ArgumentParser()
ap.add_argument("--b", type=int, default=8)
ap.add_argument("--k", type=int, default=8)
ap.add_argument("--draft-layers", type=int, default=4)
ap.add_argument("--block", type=int, default=4)
ap.add_argument("--prefill-planes", action="store_true",
                help="row-major planes on the TARGET (it only runs prefill-style verifies in this mode)")
args = ap.parse_args()

import jax
import numpy as np

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.engine.speculative import SpeculativeDecoder, truncate_params
from ggllm_tpu.utils.benchgen import make_bench_params
from ggllm_tpu.utils.jaxenv import enable_compile_cache

enable_compile_cache()

hp = FalconHParams.falcon7b()
cfg = EngineConfig(n_ctx=2048, n_batch=512, kv_dtype="bfloat16",
                   compute_dtype="bfloat16", weight_mode="fused")
B, k = args.b, args.k
t0 = time.time()
params = jax.device_put(make_bench_params(hp, GGMLType.Q4_0))
jax.block_until_ready(params["lm_head"].planes["q"])
print(f"params {time.time()-t0:.1f}s backend={jax.default_backend()}",
      file=sys.stderr, flush=True)

rng = np.random.default_rng(0)
prompts = [list(map(int, rng.integers(0, hp.n_vocab, 16))) for _ in range(B)]

cfg_t = dataclasses.replace(cfg, plane_layout="prefill") \
    if "--prefill-planes" in sys.argv else cfg

for mode, dl in (("self-draft", args.draft_layers), ("alpha=1", hp.n_layer)):
    target = FalconEngine(hp, params, cfg_t, batch_size=B)
    dhp = dataclasses.replace(hp, n_layer=dl)
    draft = FalconEngine(dhp, truncate_params(params, dl), cfg, batch_size=B)
    spec = SpeculativeDecoder(target, draft, k=k,
                              rounds_per_dispatch=args.block)
    spec.generate_rows(prompts, k + 1)  # compile
    target.reset()
    draft.reset()
    target.n_past = 0
    n_predict = 160
    t0 = time.perf_counter()
    outs = spec.generate_rows(prompts, n_predict)
    dt = time.perf_counter() - t0
    st = spec.stats
    toks = sum(len(o) for o in outs)
    print(f"[{mode} dl={dl}] B={B} k={k}: {st.n_rounds} rounds in {dt:.3f}s "
          f"-> {dt / st.n_rounds * 1e3:.2f} ms/round, acceptance "
          f"{100*st.acceptance:.0f}%, {toks} tokens -> "
          f"{toks / dt:.0f} tok/s aggregate", flush=True)
    del target, draft, spec
