"""Fused dequant x matmul Pallas kernels for all ggml quant formats.

One generic kernel, parameterized by kernels.layout.FormatSpec: per grid step
it streams packed bit-plane tiles from HBM, unpacks on the VPU (widen to i32,
shift/mask, sublane-concat of the bit-field parts so columns come out in
ascending order), applies per-group scales (w = q*ds), and feeds the MXU.
The affine part of the dequant (mins / integer offsets) never touches the
per-element path: it is folded into a tiny per-group correction dot against
precomputed group-sums of x (see _kern).

Grid: (s_tiles, out_tiles, k_chunks) with k innermost accumulating into the
output block (revisit pattern). Replaces the reference's per-format CUDA
dequant-matvec kernels (ggml-cuda.cu:475-1171) and the quantize-activations
CPU hot loop (ggml.c:11318) with a single TPU program.

The decode path (S=1) is HBM-bandwidth-bound: the kernel reads the packed
planes exactly once per token, ~4.25 bits/weight for Q4_0 plus 1 bit/weight
of f32 group scales.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggllm_tpu.kernels.layout import FORMATS, KernelQuant

# Kernel-variant knobs for experiments/kernel_ab.py probes (module-level so
# a probe can flip them before tracing; shipped defaults are the measured
# winners — see docs/PERFORMANCE.md "Kernel variant probes").
# Round-3 probe results (q4_0, 7B merged tile, real chip):
#   SPLIT_DOTS: 0.2617 vs 0.2607 ms/call baseline — flat (the sublane concat
#     is not the bottleneck; interpret-verified, kept for reproducibility).
#   UNPACK_F32: does NOT lower on TPU ("Unsupported cast: uint8 -> float32"
#     in Mosaic) — interpret-only.
#   int4 native dtype (would delete the unpack chain): S4 arrays fail at
#     creation on this platform (jit recursion) — unavailable.
UNPACK_F32 = False  # 4-bit unpack via f32 floor-divide instead of i32 shifts
SPLIT_DOTS = False  # one dot per bit-field part (skips the sublane concat)


def _block_o(ck: int, O: int, S: int = 256, code_bits: int = 8) -> int:
    if O <= 256:
        return O
    if S <= 16 and ck <= 2304 and code_bits <= 5:
        # decode matvecs with narrow codes: double the output tile — bigger
        # DMAs, fewer grid steps (measured +1% at 7B Q4_0; VMEM still fits
        # because the i32 unpack intermediates stay ≤ (2304, 512))
        return 512
    return 128 if ck > 4608 else 256


def _kern(spec, ck, n_code, has_ms, w_dtype, *refs):
    # refs: x, [xg], code planes..., scale planes (scale_names order), out.
    # xg (per-group sums of x) is present iff the format has a min or a
    # nonzero integer offset: the affine part of the dequant is folded OUT
    # of the per-element path (k_quants.c:1751's bsums trick, TPU-shaped) —
    #   y = x @ (q*ds)^T - xg @ M^T,  M = ms_g (min formats)
    #                                 M = -offset*ds_g (offset formats)
    # so the VPU never touches a per-element add/subtract or the broadcast
    # of ms to element width; the correction is one tiny per-group MXU dot.
    has_corr = has_ms or spec.has_min or spec.offset != 0.0
    x_ref = refs[0]
    base = 1
    xg_ref = None
    if has_corr:
        xg_ref = refs[1]
        base = 2
    code_refs = refs[base : base + n_code]
    sc_refs = dict(zip(spec.scale_names,
                       refs[base + n_code : base + n_code + len(spec.scale_names)]))
    o_ref = refs[-1]
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    q = None
    parts4 = None  # variant path: per-bit-field f32 parts, concat deferred
    simple4 = len(spec.planes) == 1 and spec.planes[0][1] == 4
    if simple4 and (UNPACK_F32 or SPLIT_DOTS):
        ref = code_refs[0]
        if UNPACK_F32:
            # f32-domain unpack: one convert on the packed (half-size) tile
            # plus floor-divide, instead of widen+shift+mask+convert
            vf = ref[0].astype(jnp.float32)
            hi = jnp.floor(vf * jnp.float32(1.0 / 16.0))
            parts4 = [vf - hi * jnp.float32(16.0), hi]
        else:
            v = ref[0].astype(jnp.int32)
            parts4 = [(v & 0xF).astype(jnp.float32),
                      (v >> 4).astype(jnp.float32)]
    else:
        for (name, bits, shift), ref in zip(spec.planes, code_refs):
            v = ref[0].astype(jnp.int32)  # i8 vector shifts unsupported on TPU
            if bits == 8:
                unp = v
            else:
                mask = (1 << bits) - 1
                n_parts = 8 // bits
                # the top field needs no mask: v < 256, so v >> (8-bits) is clean
                parts = [(v >> (i * bits)) & mask if i < n_parts - 1
                         else v >> (i * bits) for i in range(n_parts)]
                unp = jnp.concatenate(parts, axis=0)  # (ck, bo)
            if shift:
                unp = unp << shift
            q = unp if q is None else q + unp

    def f16dec(v):
        # fp16 bit pattern stored as int16 (Mosaic has no f16): exact decode
        # via integer ops + bitcast; subnormals handled separately
        vi = v.astype(jnp.int32) & 0xFFFF
        sign = (vi >> 15) & 1
        exp = (vi >> 10) & 0x1F
        man = vi & 0x3FF
        bits = (sign << 31) | ((exp + 112) << 23) | (man << 13)
        f = jax.lax.bitcast_convert_type(bits, jnp.float32)
        sub = man.astype(jnp.float32) * jnp.float32(5.9604645e-8)
        return jnp.where(exp == 0, jnp.where(sign == 1, -sub, sub), f)

    def scales(ref):
        v = ref[0]
        return f16dec(v) if v.dtype == jnp.int16 else v

    # dequant arithmetic stays f32: a bf16-domain variant (half vector
    # width) was tried and measured SLOWER on this chip (98 -> 79 tok/s,
    # Mosaic relayout costs for bf16 elementwise outweigh the width win)
    dq = jnp.float32

    if spec.two_level:
        # super-block fp16 d (per 256) x integer sub-scales (per group):
        # the f32 product is exactly the reference's effective scale
        rep = 256 // spec.group
        d = jnp.repeat(f16dec(sc_refs["db"][0]), rep, axis=0)  # (ck/g, bo)
        if spec.packed_scb:  # Q2_K: scale|min nibbles in one byte
            scb = sc_refs["scb"][0].astype(jnp.int32)
            ds_g = d * (scb & 0xF).astype(jnp.float32)
            dmin = jnp.repeat(f16dec(sc_refs["dminb"][0]), rep, axis=0)
            ms_g = dmin * (scb >> 4).astype(jnp.float32)
        else:
            ds_g = d * sc_refs["sc"][0].astype(jnp.float32)
            ms_g = None
            if spec.has_min:
                dmin = jnp.repeat(f16dec(sc_refs["dminb"][0]), rep, axis=0)
                ms_g = dmin * sc_refs["scm"][0].astype(jnp.float32)
    else:
        ds_g = scales(sc_refs["ds"]).astype(dq)
        ms_g = scales(sc_refs["ms"]).astype(dq) if has_ms else None

    if parts4 is not None and SPLIT_DOTS:
        # one dot per bit-field: part i covers chunk columns
        # [i*ck/2, (i+1)*ck/2) (kernels/layout._pack_plane order), so x and
        # the per-group scales slice cleanly and the sublane concat vanishes
        half = ck // 2
        hg = half // spec.group
        acc = None
        for i, p in enumerate(parts4):
            w = p * jnp.repeat(ds_g[i * hg:(i + 1) * hg].astype(dq),
                               spec.group, axis=0)
            a = jax.lax.dot_general(
                x_ref[:, i * half:(i + 1) * half], w.astype(w_dtype),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            acc = a if acc is None else acc + a
    else:
        if parts4 is not None:
            w = jnp.concatenate(parts4, axis=0)
        else:
            w = q.astype(dq)
        w = w * jnp.repeat(ds_g.astype(dq), spec.group, axis=0)
        acc = jax.lax.dot_general(
            x_ref[:], w.astype(w_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if has_corr:
        corr = ms_g if ms_g is not None else (-spec.offset) * ds_g
        acc = acc - jax.lax.dot_general(
            xg_ref[:, :corr.shape[0]], corr.astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[:] += acc


def _xg_kern(x_ref, e_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], e_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=64)
def _group_map(ck: int, g: int, cgp: int):
    # numpy, not jnp: a cached device array would leak tracers across jit
    # scopes (it embeds as a fresh constant per trace instead)
    import numpy as np

    e = np.zeros((ck, cgp), np.float32)
    e[np.arange(ck), np.arange(ck) // g] = 1.0
    return e


def _group_sums(x: jnp.ndarray, n_k: int, ck: int, g: int, bs: int,
                interpret: bool) -> jnp.ndarray:
    """(S, kp) -> (S, n_k*cgp) per-group sums of x, groups zero-padded per
    chunk to cgp = 128-multiple lanes.

    One tiny MXU dot against a 0/1 group-map matrix instead of an XLA
    reduce: reducing (S, 23040) bf16 over lane groups made XLA materialize
    a full f32 copy of x PLUS a 377 MB layout-transpose of it per layer at
    2048-ctx prefill (~1 ms/layer, trace-verified). Here x streams once
    more (~24 us/layer) and the dot is ~1% of the main kernel's FLOPs."""
    S = x.shape[0]
    cg = ck // g
    cgp = -(-cg // 128) * 128
    n_kp = x.shape[1] // ck
    if S < 256:
        # decode-sized rows: the reduce is tiny and fuses in XLA; a pallas
        # launch here costs more than it saves (~0.25 ms/token at 7B)
        xg = jnp.sum(x.reshape(S, n_kp, cg, g), axis=-1, dtype=jnp.float32)
        return jnp.pad(xg, ((0, 0), (0, 0), (0, cgp - cg))).reshape(
            S, n_kp * cgp)
    e = jnp.asarray(_group_map(ck, g, cgp), x.dtype)
    return pl.pallas_call(
        _xg_kern,
        grid=(pl.cdiv(S, bs), n_k),
        in_specs=[
            pl.BlockSpec((bs, ck), lambda s, c: (s, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ck, cgp), lambda s, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bs, cgp), lambda s, c: (s, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, n_k * cgp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(x, e)


def fused_matmul_2d(kq: KernelQuant, x: jnp.ndarray, out_dtype,
                    interpret: bool = False) -> jnp.ndarray:
    """y = x @ W^T. x (S, K) -> (S, O)."""
    S, K = x.shape
    O = kq.shape[0]
    assert kq.shape[1] == K, (kq.shape, x.shape)
    spec = FORMATS[kq.gtype]
    ck = kq.ck
    n_k = kq.planes[spec.scale_names[0]].shape[0]
    kp = n_k * ck  # padded contraction dim (kernels/layout.py padded_k)
    if kp != K:
        x = jnp.pad(x, ((0, 0), (0, kp - K)))
    bo = _block_o(ck, O, S, sum(b for _, b, _ in spec.planes))
    bs = min(S, 256)
    has_ms = "ms" in kq.planes
    has_corr = has_ms or spec.has_min or spec.offset != 0.0
    w_dtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16

    code_planes = [kq.planes[name] for name, _, _ in spec.planes]
    scale_planes = [kq.planes[n] for n in spec.scale_names if n in kq.planes]

    operands = [x]
    in_specs = [pl.BlockSpec((bs, ck), lambda s, i, c: (s, c),
                             memory_space=pltpu.VMEM)]
    if has_corr:
        # per-group sums of x for the affine correction dot (see _kern) in
        # x's row-major layout, group lanes zero-padded per chunk to a
        # 128-multiple so the block is lane-divisible (Mosaic); the kernel
        # slices [:, :ck//g] (offset-0 lane slice, free)
        g = spec.group
        cgp = -(-(ck // g) // 128) * 128
        xg = _group_sums(x, n_k, ck, g, bs, interpret)
        operands.append(xg)
        in_specs.append(pl.BlockSpec((bs, cgp), lambda s, i, c: (s, c),
                                     memory_space=pltpu.VMEM))
    for p in code_planes + scale_planes:
        rows = p.shape[1]
        in_specs.append(
            pl.BlockSpec((1, rows, bo), lambda s, i, c: (c, 0, i),
                         memory_space=pltpu.VMEM))
    operands += code_planes + scale_planes

    kern = functools.partial(_kern, spec, ck, len(code_planes), has_ms, w_dtype)
    y = pl.pallas_call(
        kern,
        grid=(pl.cdiv(S, bs), pl.cdiv(O, bo), n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bs, bo), lambda s, i, c: (s, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return y.astype(out_dtype)


def fused_matmul(kq: KernelQuant, x: jnp.ndarray, out_dtype,
                 interpret: bool = False) -> jnp.ndarray:
    """y = x @ W^T with arbitrary leading batch dims on x."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    y = fused_matmul_2d(kq, x2, out_dtype, interpret=interpret)
    return y.reshape(*lead, kq.shape[0])
