"""End-to-end HTTP serving benchmark on the real chip: concurrent clients
against the continuous-batching server (the FULL production path — HTTP,
JSON, tokenizer, scheduler, batched fused decode, detokenize — not just the
engine loop that scripts/bench_batched.py measures).

Spins up `serve(parallel=B)` in-process on synthetic Falcon-7B Q4_0 params,
then drives it with C client threads, each looping blocking /completion
requests (temp 0.8 + penalties: the full per-row device cascade). Reports
aggregate generated tok/s and request latency percentiles.

Usage: python scripts/bench_server.py [B] [CLIENTS] [N_PREDICT] [--kv-int8]
       (defaults 32 64 64; bench host has ONE core — client threads and the
        scheduler share it, so the HTTP overhead measured here is an upper
        bound; real serving hosts have cores to spare)
"""

import json
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.server.app import serve
from ggllm_tpu.utils.benchgen import make_bench_params
from ggllm_tpu.utils.synthetic import make_tiny_vocab

KV = "int8" if "--kv-int8" in sys.argv else "bfloat16"
args = [a for a in sys.argv[1:] if not a.startswith("--")]
B = int(args[0]) if args else 32
CLIENTS = int(args[1]) if len(args) > 1 else 2 * B
N_PREDICT = int(args[2]) if len(args) > 2 else 64

hp = FalconHParams.falcon7b()
cfg = EngineConfig(n_ctx=2048, n_batch=512, kv_dtype=KV,
                   compute_dtype="bfloat16", weight_mode="fused")

t0 = time.time()
params = jax.device_put(make_bench_params(hp, GGMLType.Q4_0))
print(f"params {time.time()-t0:.1f}s backend={jax.default_backend()}",
      flush=True)
engine = FalconEngine(hp, params, cfg, batch_size=B)
vocab = make_tiny_vocab(hp.n_vocab)
httpd = serve(engine, vocab, port=0, parallel=B, chunk=32)
threading.Thread(target=httpd.serve_forever, daemon=True).start()
url = f"http://127.0.0.1:{httpd.server_address[1]}/completion"


def request(i: int) -> tuple[int, float]:
    body = {"prompt": f"the {i} and", "n_predict": N_PREDICT,
            "temperature": 0.8, "seed": i, "ignore_eos": True}
    req = urllib.request.Request(url, data=json.dumps(body).encode(),
                                 headers={"Content-Type": "application/json"})
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=600) as r:
        out = json.loads(r.read())
    return int(out["tokens_predicted"]), time.perf_counter() - t0


# warmup: compile the batched prefill + decode programs
t0 = time.time()
with ThreadPoolExecutor(4) as ex:
    list(ex.map(request, range(4)))
print(f"warmup/compile {time.time()-t0:.1f}s", flush=True)

NREQ = 2 * CLIENTS
for rnd in (1, 2):  # round 1 may absorb one-time prefill-bucket compiles
    lat: list[float] = []
    tokens = 0
    t0 = time.perf_counter()
    with ThreadPoolExecutor(CLIENTS) as ex:
        for n, dt in ex.map(request, range(100 * rnd, 100 * rnd + NREQ)):
            tokens += n
            lat.append(dt)
    wall = time.perf_counter() - t0
    lat.sort()
    p50 = lat[len(lat) // 2]
    p95 = lat[int(len(lat) * 0.95)]
    print(f"[round {rnd}] B={B} clients={CLIENTS} n_predict={N_PREDICT} "
          f"kv={KV}: {NREQ} requests, {tokens} tokens in {wall:.2f}s -> "
          f"{tokens / wall:.0f} tok/s aggregate over HTTP; "
          f"latency p50 {p50:.2f}s p95 {p95:.2f}s", flush=True)
httpd.shutdown()
