"""Fused dequant-matmul micro-benchmark (benchmark-matmult.cpp analogue).

Measures wall-clock and effective HBM bandwidth / FLOPs of the fused Pallas
kernel vs the dense bf16 dot at Falcon-7B weight geometry, using chained
data dependencies and a final device_get (this runtime's block_until_ready
returns at enqueue).

  python scripts/benchmark_matmult.py [--type q4_0] [--s 1,16,512]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ggllm_tpu.core.dtypes import GGMLType, TYPE_TRAITS  # noqa: E402
from ggllm_tpu.kernels import layout as klayout  # noqa: E402
from ggllm_tpu.kernels.quant_matmul import fused_matmul  # noqa: E402
from ggllm_tpu.utils.benchgen import random_quant_tensor  # noqa: E402


ITERS = 16


def timed(step, x, w):
    """Time ITERS chained applications INSIDE one program, with the weights
    as explicit jit ARGUMENTS: per-dispatch latency through this runtime is
    large/jittery, block_until_ready returns at enqueue, and closed-over
    arrays behave like per-call constants — so loop on device, pass weights
    as args, and force completion with device_get."""
    K = x.shape[1]

    @jax.jit
    def loop(x, w):
        def body(_, v):
            return step(v, w)[:, :K] * 0.01
        return jax.lax.fori_loop(0, ITERS, body, x)

    _ = jax.device_get(jnp.sum(loop(x, w)))  # compile + warm
    t0 = time.perf_counter()
    _ = jax.device_get(jnp.sum(loop(x, w)))
    return (time.perf_counter() - t0) / ITERS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--type", default="q4_0")
    ap.add_argument("--s", default="1,16,512")
    ap.add_argument("--o", type=int, default=18176)
    ap.add_argument("--k", type=int, default=4544)
    args = ap.parse_args()

    by_name = {TYPE_TRAITS[t].name.lower(): t for t in TYPE_TRAITS
               if TYPE_TRAITS[t].name.lower().startswith("q")}
    gtype = by_name[args.type.lower()]
    O, K = args.o, args.k

    qt = random_quant_tensor(gtype, O, K)
    kq = klayout.to_kernel(gtype, qt.planes, qt.shape)
    kq_dev = klayout.KernelQuant(
        kq.gtype, kq.shape, kq.ck,
        {k: jnp.asarray(v) for k, v in kq.planes.items()})
    qbytes = sum(v.nbytes for v in kq.planes.values())
    wdense = jax.random.normal(jax.random.PRNGKey(0), (K, O), jnp.bfloat16)

    print(f"{TYPE_TRAITS[gtype].name} ({O}x{K}), q-bytes {qbytes/1e6:.1f} MB, "
          f"dense {wdense.nbytes/1e6:.1f} MB, backend={jax.default_backend()}")
    for s in map(int, args.s.split(",")):
        x = jax.random.normal(jax.random.PRNGKey(1), (s, K), jnp.bfloat16)

        t_f = timed(lambda v, w: fused_matmul(w, v, jnp.bfloat16), x, kq_dev)
        t_d = timed(lambda v, w: jax.lax.dot_general(
            v, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16), x, wdense)
        flops = 2 * s * O * K
        print(f"  S={s:4d}: fused {t_f*1e6:9.1f} us ({qbytes/t_f/1e9:6.1f} GB/s, "
              f"{flops/t_f/1e12:6.2f} TFLOP/s)  "
              f"dense {t_d*1e6:9.1f} us ({wdense.nbytes/t_d/1e9:6.1f} GB/s)")


if __name__ == "__main__":
    main()
