"""A/B probe for fused dequant-matmul kernel variants.

Standalone single-kernel microbenchmarks through this device link read ~4x
slow (docs/PERFORMANCE.md), so this probe instead chains N data-dependent
kernel calls inside ONE jitted lax.scan — the same conditions as the fused
decode loop — and reports ms per call. Use it to rank kernel variants in
~2 minutes before paying a full bench.py run.

  python experiments/kernel_ab.py [q4_0] [--n 200]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from ggllm_tpu.core.dtypes import GGMLType, type_from_name
from ggllm_tpu.kernels import layout as klayout
from ggllm_tpu.kernels.quant_matmul import fused_matmul_2d
from ggllm_tpu.utils.benchgen import random_quant_tensor

from ggllm_tpu.kernels import quant_matmul as qm

gtype = type_from_name(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
    else GGMLType.Q4_0
N = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 200
# kernel-variant knobs (see quant_matmul module flags)
qm.UNPACK_F32 = "--uf32" in sys.argv
qm.SPLIT_DOTS = "--split" in sys.argv
print(f"variant: UNPACK_F32={qm.UNPACK_F32} SPLIT_DOTS={qm.SPLIT_DOTS}",
      flush=True)

# 7B merged-QKV+FFN-up geometry: the decode hot tile
O, K = 22848, 4544
qt = random_quant_tensor(gtype, O, K if K % 256 == 0 or not klayout.FORMATS[gtype].two_level
                         else 4608)
K = qt.shape[1]
kq0 = klayout.to_kernel(gtype, qt.planes, qt.shape)
kq = klayout.KernelQuant(kq0.gtype, kq0.shape, kq0.ck,
                         {k: jnp.asarray(v) for k, v in kq0.planes.items()})
gbytes = sum(v.size * v.dtype.itemsize for v in kq.planes.values()) / 1e9


@jax.jit
def probe(x0):
    def step(x, _):
        y = fused_matmul_2d(kq, x, jnp.float32)
        # cheap data-dependent feedback keeping magnitudes sane
        x = (y[:, :K] * jnp.float32(1e-3)).astype(x0.dtype)
        return x, y[0, 0]

    x, ys = jax.lax.scan(step, x0, None, length=N)
    return ys.sum()


rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32)).astype(jnp.bfloat16)

t0 = time.time()
float(probe(x0))
print(f"compile+first {time.time() - t0:.1f}s", flush=True)
trials = []
for _ in range(3):
    t0 = time.perf_counter()
    float(probe(x0))
    trials.append((time.perf_counter() - t0) / N * 1e3)
ms = min(trials)
print(f"{gtype.name} ({O}x{K}, {gbytes:.3f} GB/call): {ms:.4f} ms/call "
      f"= {gbytes / ms * 1e3:.0f} GB/s  (trials {[f'{t:.4f}' for t in trials]})")
