"""Serving latency distribution under concurrent load (VERDICT r4 #8).

Drives the continuous-batching HTTP server with streaming clients and
reports TTFT (time to first streamed token) p50/p99, per-token
inter-arrival p50/p99 (tokens arrive in CHUNK-sized bursts: p50 shows the
in-burst spacing, p99 the burst interval), and the maximum mid-stream stall — which bounds the decode pause
in-flight requests see while a new admission runs its batched prefill
(engine.prefill_rows).

Usage: python scripts/bench_serve_latency.py [B] [CLIENTS] [N_PREDICT]
       [--chunk N] [--kv-int8]
       (defaults 8 16 64; the bench host has ONE core — client threads,
        SSE parsing and the scheduler share it, so host-side overhead here
        is an upper bound)
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
CHUNK = 8
if "--chunk" in sys.argv:
    CHUNK = int(sys.argv[sys.argv.index("--chunk") + 1])
args = [a for a in sys.argv[1:]
        if not a.startswith("--") and a != str(CHUNK)]
args = [a for a in sys.argv[1:] if a.isdigit()]
B = int(args[0]) if args else 8
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
httpd = serve(engine, vocab, port=0, parallel=B, chunk=CHUNK)
threading.Thread(target=httpd.serve_forever, daemon=True).start()
url = f"http://127.0.0.1:{httpd.server_address[1]}/completion"


def request(i: int):
    """Streaming request; returns (ttft, [(gap_s, n_tokens_in_chunk)...])."""
    body = {"prompt": "the " * 30 + str(i), "n_predict": N_PREDICT,
            "temperature": 0.8, "seed": i, "ignore_eos": True,
            "stream": True}
    req = urllib.request.Request(url, data=json.dumps(body).encode(),
                                 headers={"Content-Type": "application/json"})
    t_start = time.perf_counter()
    ttft = None
    gaps = []
    last = None
    with urllib.request.urlopen(req, timeout=600) as r:
        for line in r:
            line = line.strip()
            if not line.startswith(b"data: "):
                continue
            obj = json.loads(line[6:])
            if obj.get("stop"):
                break
            now = time.perf_counter()
            n_tok = 1  # the batched server emits one SSE event per token
            if ttft is None:
                ttft = now - t_start
            else:
                gaps.append((now - last, n_tok))
            last = now
    return ttft, gaps


def pct(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(len(xs) * p))]


# warmup: compile batched prefill + decode programs
with ThreadPoolExecutor(4) as ex:
    list(ex.map(request, range(4)))
print("warmup done", flush=True)

for rnd in (1, 2):
    t0 = time.perf_counter()
    with ThreadPoolExecutor(CLIENTS) as ex:
        results = list(ex.map(request, range(100 * rnd, 100 * rnd
                                             + 2 * CLIENTS)))
    wall = time.perf_counter() - t0
    ttfts = [r[0] for r in results if r[0] is not None]
    per_tok = [g / n for r in results for g, n in r[1]]
    stalls = [g for r in results for g, _ in r[1]]
    n_tokens = sum(n for r in results for _, n in r[1]) + len(ttfts)
    print(f"[round {rnd}] B={B} clients={CLIENTS} n_predict={N_PREDICT} "
          f"chunk={CHUNK} kv={KV}: {len(results)} streams, "
          f"~{n_tokens} tokens in {wall:.2f}s "
          f"({n_tokens / wall:.0f} tok/s aggregate)", flush=True)
    print(f"  TTFT      p50 {pct(ttfts, 0.5)*1e3:7.0f} ms   "
          f"p99 {pct(ttfts, 0.99)*1e3:7.0f} ms", flush=True)
    print(f"  per-token p50 {pct(per_tok, 0.5)*1e3:7.1f} ms   "
          f"p99 {pct(per_tok, 0.99)*1e3:7.1f} ms "
          f"(tokens stream {CHUNK}/chunk)", flush=True)
    print(f"  max mid-stream stall (admission prefill bound): "
          f"{max(stalls)*1e3:.0f} ms", flush=True)
httpd.shutdown()
