"""Model-load latency: cold (host repack) vs warm (.kcache memmap).

Builds a REAL Falcon-7B-geometry Q4_0 GGCC file once (random pre-quantized
blobs — load cost depends on bytes, not values) and measures:

* cold: read + kernel-layout repack (threaded, io/loader._parallel_layers)
  + .kcache write + device upload;
* warm: .kcache memmap + device upload.

Reference baseline: 2.4 s load for 7B q4_1 (README.md:183-191, mmap'd —
its disk layout IS its compute layout, ours pays one repack then memmaps
the repacked form).

Usage: python experiments/bench_load.py [--rebuild] [--threads N]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType, TYPE_TRAITS, row_nbytes
from ggllm_tpu.io.ggcc import GGCCWriter
from ggllm_tpu.utils.synthetic import make_tiny_vocab

PATH = "/tmp/bench7b_q4_0.ggcc"

if "--threads" in sys.argv:
    os.environ["GGLLM_LOAD_THREADS"] = sys.argv[sys.argv.index("--threads") + 1]


def build_file():
    hp = FalconHParams.falcon7b()
    hp.n_bpe_merges = 0
    rng = np.random.default_rng(0)
    vocab = make_tiny_vocab(hp.n_vocab)
    w = GGCCWriter(PATH, hp, vocab)
    E, H, KV, D = hp.n_embd, hp.n_head, hp.n_head_kv, hp.head_dim
    V, F, L = hp.n_vocab, hp.n_ff, hp.n_layer

    blk = rng.integers(0, 256, 1 << 22, dtype=np.uint8)  # tiled random bytes

    def q4(name, out, cols):  # ne is in ggml dim order: (cols, rows)
        nbytes = out * row_nbytes(GGMLType.Q4_0, cols)
        reps = nbytes // blk.size + 1
        blob = np.broadcast_to(blk, (reps, blk.size)).reshape(-1)[:nbytes]
        w.write_tensor(name, GGMLType.Q4_0, (cols, out), blob)

    def f32(name, *shape):
        w.write_tensor(name, GGMLType.F32, tuple(reversed(shape)),
                       rng.standard_normal(shape).astype(np.float32)
                       .view(np.uint8).reshape(-1))

    f32("transformer.word_embeddings.weight", V, E)
    f32("transformer.ln_f.weight", E)
    f32("transformer.ln_f.bias", E)
    q4("lm_head.weight", V, E)
    for i in range(L):
        p = f"transformer.h.{i}"
        f32(f"{p}.input_layernorm.weight", E)
        f32(f"{p}.input_layernorm.bias", E)
        q4(f"{p}.self_attention.query_key_value.weight", (H + 2 * KV) * D, E)
        q4(f"{p}.self_attention.dense.weight", E, H * D)
        q4(f"{p}.mlp.dense_h_to_4h.weight", F, E)
        q4(f"{p}.mlp.dense_4h_to_h.weight", E, F)
    w.close()
    print(f"wrote {os.path.getsize(PATH) / 1e9:.2f} GB to {PATH}", flush=True)


if "--rebuild" in sys.argv or not os.path.exists(PATH):
    t0 = time.time()
    build_file()
    print(f"file build {time.time() - t0:.1f}s", flush=True)

from ggllm_tpu.io.loader import load_model  # noqa: E402

kc = PATH + ".kcache"
if os.path.exists(kc):
    os.remove(kc)

cfg = EngineConfig(kernel_layout=True)
t0 = time.time()
mf, params = load_model(PATH, cfg)
cold = time.time() - t0
print(f"COLD load (repack {os.environ.get('GGLLM_LOAD_THREADS', 'auto')} "
      f"threads + kcache write + upload): {cold:.1f}s", flush=True)
del params

t0 = time.time()
mf, params = load_model(PATH, cfg)
warm = time.time() - t0
print(f"WARM load (.kcache memmap + upload): {warm:.1f}s", flush=True)
print(f"kcache size {os.path.getsize(kc) / 1e9:.2f} GB "
      f"(reference 7B load baseline: 2.4s)", flush=True)
del params

# cold-AFTER-QUANTIZE: the quantizer now emits the kcache by default
# (tools/quantize.py --kcache on), so a freshly produced model's first
# serving load is the warm path — measure exactly that: preseed (the
# quantizer's tail step) is excluded, the first load after it is timed.
os.remove(kc)
from ggllm_tpu.io.loader import preseed_kcache  # noqa: E402

t0 = time.time()
preseed_kcache(PATH)
print(f"quantizer kcache pre-seed step: {time.time() - t0:.1f}s", flush=True)
t0 = time.time()
mf, params = load_model(PATH, cfg)
first = time.time() - t0
print(f"FIRST load after quantize (kcache pre-seeded): {first:.1f}s "
      f"(target: ~= warm {warm:.1f}s)", flush=True)
