"""A/B probe: alternative kernel layouts for the Q5_0/Q5_1 h-plane.

Q5 decode (73/71 tok/s) is the worst byte-efficiency in the format sweep:
the 1-bit h plane unpack costs widen + 8 shift/mask + an 8-way sublane
concat + shift + add. The kernel layout is OURS to choose (load-time
repack; the on-disk ggml format is unchanged), so probe trading bytes for
VPU ops:

  h1: (q 4b, h 1b<<4)  — shipped layout, 5 bits/w codes
  h2: (q 4b, h 2b<<4)  — h bit in 2-bit fields, 6 bits/w, 4-way concat
  h4: (q 4b, h 4b<<4)  — h bit in 4-bit fields, 8 bits/w, 2-way concat
  c8: (q 8b)           — combined 5-bit code in int8, 8 bits/w, NO unpack

Same chained-scan methodology as kernel_ab.py (single-kernel micros read
~4x slow through this link). Usage:
  python experiments/q5_variants.py [q5_0|q5_1] [--n 200]
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

gtype = (type_from_name(sys.argv[1])
         if len(sys.argv) > 1 and not sys.argv[1].startswith("-")
         else GGMLType.Q5_0)
assert gtype in (GGMLType.Q5_0, GGMLType.Q5_1)
N = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 200

SHIPPED = klayout.FORMATS[gtype]
VARIANTS = {
    "h1": SHIPPED.planes,
    "h2": (("q", 4, 0), ("h", 2, 4)),
    "h4": (("q", 4, 0), ("h", 4, 4)),
    "c8": (("q", 8, 0),),
}

O, K = 22848, 4544  # 7B merged-QKV+FFN-up decode tile
if "--down" in sys.argv:
    O, K = 4544, 18176  # 7B FFN-down decode tile (long contraction)
qt = random_quant_tensor(gtype, O, K)
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32)).astype(
    jnp.bfloat16)

# exact-dequant reference for correctness
from ggllm_tpu.ops.linear import dequant_jnp

w = np.asarray(dequant_jnp(gtype, qt.planes, qt.shape, jnp.float32))
y_ref = np.asarray(x0, np.float32) @ w.T

klayout._native_repack = lambda *a, **k: {}  # force the generic pack path

results = {}
for name, planes in VARIANTS.items():
    import dataclasses

    klayout.FORMATS[gtype] = dataclasses.replace(SHIPPED, planes=planes)
    kq0 = klayout.to_kernel(gtype, qt.planes, qt.shape)
    kq = klayout.KernelQuant(kq0.gtype, kq0.shape, kq0.ck,
                             {k: jnp.asarray(v) for k, v in kq0.planes.items()})
    gbytes = sum(v.size * v.dtype.itemsize for v in kq.planes.values()) / 1e9

    y = np.asarray(fused_matmul_2d(kq, x0, jnp.float32))
    err = np.max(np.abs(y - y_ref)) / max(np.max(np.abs(y_ref)), 1e-9)
    assert err < 2e-2, (name, err)  # bf16 dot noise only

    @jax.jit
    def probe(x0, kq=kq):
        def step(x, _):
            y = fused_matmul_2d(kq, x, jnp.float32)
            yk = jnp.tile(y, (1, -(-K // O)))[:, :K]  # data-dep feedback
            x = (yk * jnp.float32(1e-3)).astype(x0.dtype)
            return x, y[0, 0]

        x, ys = jax.lax.scan(step, x0, None, length=N)
        return ys.sum()

    t0 = time.time()
    float(probe(x0))
    compile_s = time.time() - t0
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(probe(x0))
        trials.append((time.perf_counter() - t0) / N * 1e3)
    ms = min(trials)
    results[name] = (ms, gbytes)
    print(f"{gtype.name} {name}: {ms:.4f} ms/call, {gbytes:.3f} GB "
          f"({gbytes / ms * 1e3:.0f} GB/s) ck={kq.ck} "
          f"rel_err={err:.1e} compile {compile_s:.0f}s", flush=True)

klayout.FORMATS[gtype] = SHIPPED
best = min(results, key=lambda k: results[k][0])
base = results["h1"][0]
print(f"best: {best} ({results[best][0]:.4f} ms vs shipped {base:.4f}; "
      f"{base / results[best][0]:.2f}x)")
