"""Prototype: fused Q4_0 dequant-matmul Pallas kernel layout exploration.

Layout ("global lo/hi split, chunk-major 3D planes"):
  qs3 (n_k, CKh, O) uint8 : byte [c, j, o] = code(o, c*CKh+j) | code(o, Kh+c*CKh+j)<<4
  dlo3 (n_k, ckb, O) f32  : scales for lo cols, ckb = CKh/32
  dhi3 (n_k, ckb, O) f32  : scales for hi cols
  x pre-split by XLA into x_lo = x[:, :Kh], x_hi = x[:, Kh:]

Kernel per (s-tile, out-tile i, k-chunk c):
  w_lo = (lo(qs) - 8) * repeat(dlo, 32, axis=0)   # sublane expansion
  w_hi = (hi(qs) - 8) * repeat(dhi, 32, axis=0)
  acc += x_lo_blk @ w_lo + x_hi_blk @ w_hi
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_q4_planes(rng, O, K):
    codes = rng.integers(0, 16, (O, K), dtype=np.uint8)
    d = (rng.standard_normal((O, K // 32)) * 0.01 + 0.02).astype(np.float32)
    return codes, d


def ref_dequant(codes, d):
    return (codes.astype(np.float32) - 8.0) * np.repeat(d, 32, axis=1)


def kernel_layout(codes, d, ckh):
    """codes (O, K), d (O, nb) -> qs3 (n_k, CKh, O), dlo3/dhi3 (n_k, ckb, O)."""
    O, K = codes.shape
    kh = K // 2
    n_k = kh // ckh
    ckb = ckh // 32
    lo = codes[:, :kh]
    hi = codes[:, kh:]
    qs = (lo | (hi << 4)).T  # (Kh, O)
    qs3 = qs.reshape(n_k, ckh, O).copy()
    nbh = d.shape[1] // 2
    dlo3 = d[:, :nbh].T.reshape(n_k, ckb, O).copy()
    dhi3 = d[:, nbh:].T.reshape(n_k, ckb, O).copy()
    return qs3, dlo3, dhi3


def fused_q4_matmul(x, qs3, dlo3, dhi3, *, block_o=256, block_s=512,
                    out_dtype=jnp.float32, interpret=False):
    """y = x @ W^T. x (S, K). Planes per kernel_layout."""
    S, K = x.shape
    n_k, ckh, O = qs3.shape
    ckb = dlo3.shape[1]
    kh = K // 2
    assert n_k * ckh == kh and ckb * 32 == ckh
    block_s = min(block_s, S)
    block_o = min(block_o, O)
    n_s = pl.cdiv(S, block_s)
    n_o = pl.cdiv(O, block_o)

    x_lo = x[:, :kh]
    x_hi = x[:, kh:]

    def kern(xlo_ref, xhi_ref, qs_ref, dlo_ref, dhi_ref, o_ref):
        c = pl.program_id(2)

        @pl.when(c == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        qs = qs_ref[0].astype(jnp.int32)  # i8 vector shifts unsupported on TPU
        lo = qs & 0xF
        hi = qs >> 4
        slo = jnp.repeat(dlo_ref[0], 32, axis=0)  # (ckh, O_t)
        shi = jnp.repeat(dhi_ref[0], 32, axis=0)
        wlo = ((lo.astype(jnp.float32) - 8.0) * slo).astype(jnp.bfloat16)
        whi = ((hi.astype(jnp.float32) - 8.0) * shi).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            xlo_ref[:], wlo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc += jax.lax.dot_general(
            xhi_ref[:], whi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] += acc

    grid = (n_s, n_o, n_k)
    y = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_s, ckh), lambda s, i, c: (s, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, ckh), lambda s, i, c: (s, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ckh, block_o), lambda s, i, c: (c, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ckb, block_o), lambda s, i, c: (c, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ckb, block_o), lambda s, i, c: (c, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_s, block_o), lambda s, i, c: (s, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x_lo, x_hi, qs3, dlo3, dhi3)
    return y.astype(out_dtype)


def timeit(fn, *args, iters=50):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    r.block_until_ready()
    return (time.perf_counter() - t0) / iters


def run(O, K, S, ckh, block_o, rng):
    codes, d = make_q4_planes(rng, O, K)
    wref = ref_dequant(codes, d)
    qs3, dlo3, dhi3 = kernel_layout(codes, d, ckh)
    qs3d, dlo3d, dhi3d = map(jnp.asarray, (qs3, dlo3, dhi3))
    wdense = jnp.asarray(wref.T, dtype=jnp.bfloat16)  # (K, O)
    x = jnp.asarray(rng.standard_normal((S, K)), dtype=jnp.bfloat16)

    fused = jax.jit(functools.partial(fused_q4_matmul, block_o=block_o))
    y = np.asarray(fused(x, qs3d, dlo3d, dhi3d))
    yref = np.asarray(x, dtype=np.float32) @ wref.T
    err = np.abs(y - yref).max() / (np.abs(yref).max() + 1e-9)
    t_fused = timeit(fused, x, qs3d, dlo3d, dhi3d)

    dense = jax.jit(lambda x, w: jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    t_dense = timeit(dense, x, wdense)

    qbytes = qs3.nbytes + dlo3.nbytes + dhi3.nbytes
    print(f"O={O} K={K} S={S:4d} ckh={ckh:5d} bo={block_o}: "
          f"fused {t_fused*1e6:8.1f}us ({qbytes/t_fused/1e9:6.1f} GB/s) "
          f"dense {t_dense*1e6:8.1f}us ({wdense.nbytes/t_dense/1e9:6.1f} GB/s) "
          f"relerr {err:.2e}")


def main():
    rng = np.random.default_rng(0)
    # 7B ffn_up geometry
    run(18176, 4544, 1, 2272, 256, rng)
    run(18176, 4544, 1, 2272, 512, rng)
    run(18176, 4544, 512, 2272, 256, rng)
    # 7B ffn_down (K % 256 == 0 via 128-chunks on halves)
    run(4544, 18176, 1, 9088, 128, rng)
    run(4544, 18176, 1, 128, 256, rng)
    run(4544, 18176, 512, 128, 256, rng)
    # wo
    run(4544, 4544, 1, 2272, 256, rng)
    # lm_head
    run(65024, 4544, 1, 2272, 512, rng)


if __name__ == "__main__":
    main()
