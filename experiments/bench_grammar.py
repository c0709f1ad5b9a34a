"""Grammar-constrained decode rate at Falcon-7B geometry (one chip).

Measures the generation tok/s with a GBNF digit grammar through the
Generator path — the number VERDICT r4 flagged as unmeasured. Modes:

  --mode host    per-token host path: device forward, fetch (V,) logits,
                 host mask + cascade (the round-4 baseline)
  --mode device  fused masked step: bit-packed valid mask uploaded per
                 step, mask + cascade + sample on device, fetch 4-byte id

Usage: python experiments/bench_grammar.py [--mode host|device] [--n 96]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

ap = argparse.ArgumentParser()
ap.add_argument("--mode", default="host", choices=["host", "device"])
ap.add_argument("--n", type=int, default=96)
ap.add_argument("--temp", type=float, default=0.0)
args = ap.parse_args()

import jax
import numpy as np

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.engine.generator import Generator
from ggllm_tpu.ops import sampling
from ggllm_tpu.ops.grammar import GrammarSampler, parse_gbnf
from ggllm_tpu.utils.benchgen import make_bench_params
from ggllm_tpu.utils.jaxenv import enable_compile_cache
from ggllm_tpu.utils.synthetic import make_tiny_vocab

enable_compile_cache()

hp = FalconHParams.falcon7b()
cfg = EngineConfig(n_ctx=2048, n_batch=512, kv_dtype="bfloat16",
                   compute_dtype="bfloat16", weight_mode="fused")
t0 = time.time()
params = jax.device_put(make_bench_params(hp, GGMLType.Q4_0))
print(f"params {time.time()-t0:.1f}s backend={jax.default_backend()}",
      file=sys.stderr, flush=True)
eng = FalconEngine(hp, params, cfg)
vocab = make_tiny_vocab(hp.n_vocab)
eos_id = 11

GBNF = "root ::= [0-9]+"
# ban eos so stochastic runs measure steady-state rate (the digit grammar
# completes after every digit, so temp>0 otherwise samples eos early)
sampler = sampling.SamplerParams(temp=args.temp, top_k=40, top_p=0.95,
                                 repeat_penalty=1.0, seed=3,
                                 logit_bias={eos_id: float("-inf")}
                                 if args.temp > 0 else {})


def run(n):
    eng.reset()
    g = GrammarSampler(parse_gbnf(GBNF), vocab.id_to_token, eos_id)
    gen = Generator(eng, sampler, eos_id, grammar=g)
    gen.grammar_device = args.mode == "device"
    toks = []
    logits = gen.prefill([5, 17, 130, 42])
    t0 = time.perf_counter()
    gen.generate(logits, n, lambda t: toks.append(t) or True)
    dt = time.perf_counter() - t0
    return toks, dt

run(40)  # warmup/compile (covers both masked-chunk program sizes)
toks, dt = run(args.n)
assert all(vocab.id_to_token[t].isdigit() for t in toks if t != eos_id), \
    toks[:8]
print(f"mode={args.mode} temp={args.temp}: {len(toks)} grammar-constrained "
      f"tokens in {dt:.3f}s -> {len(toks)/dt:.1f} tok/s "
      f"({dt/len(toks)*1e3:.1f} ms/token)")
