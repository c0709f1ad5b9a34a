"""Speculative SERVING cost at Falcon-7B geometry: the full HTTP path
(tokenize -> fused draft/verify rounds -> SSE/blocking response) vs the
direct SpeculativeDecoder rounds, one chip.

Synthetic weights can't exhibit a real acceptance rate (the self-draft of a
random model diverges, alpha ~= 0), so every round commits ~1 token and
serving tok/s ~= 1000/ms_round; what this bench establishes is the HTTP
path's OVERHEAD per round on top of the measured device round
(experiments/bench_speculative.py), and the projection is rate(alpha) as in
docs/PERFORMANCE.md.

Usage: python experiments/bench_spec_server.py [--k 8] [--draft-layers 4]
"""

import argparse
import dataclasses
import json
import sys
import threading
import time
import urllib.request

sys.path.insert(0, ".")

ap = argparse.ArgumentParser()
ap.add_argument("--k", type=int, default=8)
ap.add_argument("--draft-layers", type=int, default=4)
ap.add_argument("--n-predict", type=int, default=120)
ap.add_argument("--temp", type=float, default=0.0)
args = ap.parse_args()

import jax

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.engine.speculative import truncate_params
from ggllm_tpu.server.app import serve
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

engine = FalconEngine(hp, params, cfg)
dhp = dataclasses.replace(hp, n_layer=args.draft_layers)
draft = FalconEngine(dhp, truncate_params(params, args.draft_layers), cfg)
vocab = make_tiny_vocab(hp.n_vocab)
httpd = serve(engine, vocab, port=0, draft_engine=draft, draft_k=args.k)
threading.Thread(target=httpd.serve_forever, daemon=True).start()
url = f"http://127.0.0.1:{httpd.server_address[1]}/completion"


def request(prompt: str):
    body = {"prompt": prompt, "n_predict": args.n_predict,
            "temperature": args.temp, "top_k": 40, "top_p": 0.95,
            "repeat_penalty": 1.0, "ignore_eos": False, "seed": 3}
    req = urllib.request.Request(url, data=json.dumps(body).encode(),
                                 headers={"Content-Type": "application/json"})
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=600) as r:
        out = json.loads(r.read())
    return out, time.perf_counter() - t0

out, _ = request("the warm up prompt")  # compile
assert out.get("speculative", {}).get("rounds", 0) > 0, out.get("speculative")

best = None
for i in range(3):
    out, dt = request(f"steady prompt {i}")
    sp = out["speculative"]
    ms_round = out["timings"]["predicted_ms"] / max(sp["rounds"], 1)
    best = min(best or ms_round, ms_round)
    print(f"[{i}] {out['tokens_predicted']} tokens, {sp['rounds']} rounds, "
          f"acceptance {sp['acceptance']:.2f}, "
          f"{ms_round:.2f} ms/round over HTTP "
          f"(total {dt*1e3:.0f} ms incl. prompt "
          f"{out['timings']['prompt_ms']:.0f} ms)", flush=True)
print(f"best HTTP ms/round: {best:.2f} (direct-round baseline: "
      f"experiments/bench_speculative.py)")
httpd.shutdown()
