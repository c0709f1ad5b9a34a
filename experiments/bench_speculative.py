"""Speculative-decoding round cost at real Falcon-7B geometry (one chip).

Acceptance rate depends on the draft model's quality, which synthetic
weights cannot exhibit — so this bench measures the COST side precisely and
reports projected single-stream tok/s as a function of acceptance:

  round cost  = k draft steps (depth-truncated self-draft, d of 60 layers)
              + 1 target verify forward over k+1 positions (bucket-8 path)
              + host cascade_probs over 65k vocab per draft + verify row
  tokens/round(alpha) = expected committed tokens for per-token acceptance
  alpha (geometric):  sum_{i=0..k-1} alpha^i ... + 1 bonus at alpha^k

Compare against the measured plain decode rate (bench.py: ~111 tok/s
Falcon-7B Q4_0): speculative wins when tokens/round / round_cost exceeds it.

Usage: python experiments/bench_speculative.py [--k 6] [--draft-layers 4]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--k", type=int, default=6)
ap.add_argument("--draft-layers", type=int, default=4)
ap.add_argument("--rounds", type=int, default=20)
ap.add_argument("--block", type=int, default=4,
                help="fused rounds per device dispatch")
ap.add_argument("--temp", type=float, default=0.0,
                help="temp > 0 measures the STOCHASTIC fused round "
                     "(device cascade + accept/resample) instead of greedy")
args = ap.parse_args()

import jax

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.engine.speculative import SpeculativeDecoder, truncate_params
from ggllm_tpu.ops import sampling
from ggllm_tpu.utils.benchgen import make_bench_params
from ggllm_tpu.utils.jaxenv import enable_compile_cache

enable_compile_cache()

hp = FalconHParams.falcon7b()
cfg = EngineConfig(n_ctx=2048, n_batch=512, kv_dtype="bfloat16",
                   compute_dtype="bfloat16", weight_mode="fused")

t0 = time.time()
params = make_bench_params(hp, GGMLType.Q4_0)
params = jax.device_put(params)
jax.block_until_ready(params["lm_head"].planes["q"])
print(f"params built in {time.time() - t0:.1f}s", file=sys.stderr)

target = FalconEngine(hp, params, cfg)
hp_d = FalconHParams.falcon7b()
hp_d.n_layer = args.draft_layers
draft = FalconEngine(hp_d, truncate_params(params, args.draft_layers), cfg)

spec = SpeculativeDecoder(target, draft, k=args.k,
                          rounds_per_dispatch=args.block)
SAMPLER = sampling.SamplerParams(temp=args.temp, top_k=40, top_p=0.95,
                                 repeat_penalty=1.0, seed=3)
assert spec._fused_ok(SAMPLER), "sampler outside the fused-round coverage"

prompt = list(np.random.default_rng(0).integers(0, hp.n_vocab, 16))

# warmup: compiles the draft decode forward + the bucket-(k+1) verify path
spec.generate(prompt, args.k + 1, SAMPLER)

# measure steady-state rounds
target.reset()
draft.reset()
t0 = time.perf_counter()
out = spec.generate(prompt, args.rounds * (args.k + 1), SAMPLER)
dt = time.perf_counter() - t0
st = spec.stats
per_round = dt / st.n_rounds
mode = "greedy" if args.temp <= 0 else f"stochastic(temp={args.temp})"
print(f"k={args.k} draft_layers={args.draft_layers} block={args.block} "
      f"{mode}: "
      f"{st.n_rounds} rounds in {dt:.3f}s -> {per_round * 1e3:.2f} ms/round "
      f"(self-draft acceptance here: {100 * st.acceptance:.0f}%, "
      f"synthetic weights)")

plain_ms = 1000.0 / 111.0  # measured plain decode (bench.py round 3)
print(f"plain decode baseline: {plain_ms:.2f} ms/token (111 tok/s)")
for alpha in (0.5, 0.6, 0.7, 0.8, 0.9):
    toks = sum(alpha ** i for i in range(args.k)) + alpha ** args.k
    rate = toks / per_round
    print(f"  alpha={alpha:.1f}: {toks:.2f} tok/round -> {rate:.1f} tok/s "
          f"({rate / (1000 / plain_ms):.2f}x plain)")
