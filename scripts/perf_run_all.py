"""Decode/prefill throughput sweep across quant formats
(scripts/perf-run-all.sh analogue).

Default runs synthetic Falcon-7B-geometry weights per format on the current
backend; pass --model to sweep a real file instead (it is re-quantized to
each target type in memory first).

  python scripts/perf_run_all.py [--types q4_0,q5_1,q8_0] [--n-decode 64]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax as _jx
_jx.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
_jx.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax  # noqa: E402

from ggllm_tpu.core.config import EngineConfig, FalconHParams  # noqa: E402
from ggllm_tpu.core.dtypes import GGMLType, TYPE_TRAITS  # noqa: E402
from ggllm_tpu.engine.engine import FalconEngine  # noqa: E402
from ggllm_tpu.ops import sampling  # noqa: E402
from ggllm_tpu.utils.benchgen import make_bench_params  # noqa: E402

DEFAULT_TYPES = "q4_0,q4_1,q5_0,q5_1,q8_0,q2_K,q3_K,q4_K,q5_K,q6_K"


def bench_type(gtype: GGMLType, hp, cfg, n_decode: int, n_prefill: int):
    params = jax.device_put(make_bench_params(hp, gtype))
    eng = FalconEngine(hp, params, cfg)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, hp.n_vocab, n_prefill).tolist()

    eng.eval(prompt)  # compile all prefill buckets used
    eng.reset()
    t0 = time.perf_counter()
    eng.eval(prompt)
    t_prefill = time.perf_counter() - t0

    greedy = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)
    chunk = 64
    eng.decode_chunk(3, chunk, greedy)  # compile
    eng.rollback(n_prefill)
    t0 = time.perf_counter()
    eng.decode_pipelined(3, n_decode, chunk, greedy)
    t_decode = time.perf_counter() - t0
    del params, eng
    return n_prefill / t_prefill, n_decode / t_decode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--types", default=DEFAULT_TYPES)
    ap.add_argument("--n-decode", type=int, default=128)
    ap.add_argument("--n-prefill", type=int, default=512)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--model-size", default="7b", choices=["7b", "40b"])
    args = ap.parse_args()

    hp = FalconHParams.falcon7b() if args.model_size == "7b" else FalconHParams.falcon40b()
    cfg = EngineConfig(n_ctx=args.ctx, n_batch=512)
    by_name = {TYPE_TRAITS[t].name.lower(): t for t in TYPE_TRAITS
               if TYPE_TRAITS[t].name.lower().startswith("q")}

    results = []
    print(f"backend={jax.default_backend()}  model={args.model_size}  ctx={args.ctx}")
    print(f"{'type':8s} {'prefill tok/s':>14s} {'decode tok/s':>13s}")
    for name in args.types.split(","):
        t = by_name[name.strip().lower()]
        try:
            pf, dec = bench_type(t, hp, cfg, args.n_decode, args.n_prefill)
        except Exception as e:  # OOM / unsupported dims for this geometry
            print(f"{name:8s} FAILED: {str(e)[:80]}")
            continue
        print(f"{name:8s} {pf:14.1f} {dec:13.2f}")
        results.append({"type": name, "prefill_tok_s": round(pf, 1),
                        "decode_tok_s": round(dec, 2)})
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()
