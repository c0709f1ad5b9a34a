"""Flash-decode attention: one-token-step attention over the valid KV-cache
prefix, with per-row lengths and a deferred-append block.

Replaces the XLA einsum decode attention (models/falcon._attention at S=1),
which reads and f32-converts the ENTIRE (T = n_ctx + chunk) cache buffer
every step regardless of n_past — for LLaMA-geometry caches (32 KV heads x
128 dims) that conversion materializes >1 GB per token. This kernel:

* reads the cache in its native dtype, tile by tile, through VMEM;
* reads ONLY the valid prefix: the time-tile grid index map aliases every
  tile past ``cdiv(valid[b], BT)`` to the last needed tile, and Pallas skips
  the DMA when the block index repeats — tiles beyond n_past cost neither
  bandwidth nor compute (the reference's analogue is the dedicated attention
  matvecs, ggml-cuda.cu:1173-1264, which also walk only n_past rows);
* takes the WHOLE stacked cache (L, 2, B, T, KV*D) as its operand with the
  layer as a scalar-prefetch arg, so no per-layer slice is materialized and
  every layer shares one compiled kernel;
* returns un-normalized online-softmax partials (acc, m, l); the caller
  merges them with the (tiny) deferred-append block computed in XLA — the
  same merged-partial algebra as parallel/sp.py's time-sharded decode.

Mosaic requires the cache block's lane dim be 128-divisible (or the whole
axis), so for head_dim 64 the kernel processes ``HB = 128 // D`` KV heads
per grid step (Falcon-40B/180B GQA); MQA (KV*D = whole axis) and D >= 128
run one head per step.

Semantics match _attention exactly: f32 scores/softmax, MQA/GQA query-head
broadcast, cache valid strictly below the per-row boundary.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _heads_per_block(KV: int, D: int) -> int:
    if D >= 128 or KV == 1:
        return 1
    return math.gcd(max(128 // D, 1), KV)


def supported(KV: int, D: int) -> bool:
    """Whether the cache layout satisfies Mosaic's lane-blocking rule."""
    hb = _heads_per_block(KV, D)
    return (hb * D) % 128 == 0 or hb * D == KV * D


def _kern(scale, BT, HB, G, D, quant, l_ref, valid_ref, q_ref, k_ref, v_ref,
          *rest):
    if quant:
        ks_ref, vs_ref, acc_o, m_o, l_o, m_s, l_s, acc_s = rest
    else:
        ks_ref = vs_ref = None
        acc_o, m_o, l_o, m_s, l_s, acc_s = rest
    b = pl.program_id(0)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    valid = valid_ref[b]
    needed = (valid + BT - 1) // BT

    @pl.when(t < needed)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)  # (HB*G, D)
        k, v = k_ref[0, 0, 0], v_ref[0, 0, 0]  # (BT, HB*D)
        if quant:  # int8 codes: Mosaic casts int->float via i32
            k = k.astype(jnp.int32).astype(jnp.float32)
            v = v.astype(jnp.int32).astype(jnp.float32)
        else:
            k = k.astype(jnp.float32)
            v = v.astype(jnp.float32)
        k_pos = t * BT + jax.lax.broadcasted_iota(jnp.int32, (G, BT), 1)
        kmask = k_pos < valid
        ms, ls, accs = [], [], []
        for h in range(HB):  # static unroll over the heads sharing the tile
            s = jax.lax.dot_general(
                q[h * G:(h + 1) * G], k[:, h * D:(h + 1) * D],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (G, BT)
            if quant:
                # int8 cache: the per-(t, head) scale factors out of the
                # over-D dot — one lane-broadcast multiply per head
                s = s * ks_ref[0, 0, 0, h:h + 1]  # (1, BT)
            s = jnp.where(kmask, s, NEG_INF)
            m_prev = m_s[h * G:(h + 1) * G]  # (G, 1)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            if quant:  # fold the V scale into the probabilities
                pv_in = p * vs_ref[0, 0, 0, h:h + 1]
            else:
                pv_in = p
            ms.append(m_new)
            ls.append(l_s[h * G:(h + 1) * G] * alpha
                      + jnp.sum(p, axis=-1, keepdims=True))
            accs.append(acc_s[h * G:(h + 1) * G] * alpha + jax.lax.dot_general(
                pv_in, v[:, h * D:(h + 1) * D], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        m_s[:] = ms[0] if HB == 1 else jnp.concatenate(ms, axis=0)
        l_s[:] = ls[0] if HB == 1 else jnp.concatenate(ls, axis=0)
        acc_s[:] = accs[0] if HB == 1 else jnp.concatenate(accs, axis=0)

    @pl.when(t == pl.num_programs(2) - 1)
    def _():
        acc_o[0, 0] = acc_s[:]
        m_o[0, 0] = m_s[:]
        l_o[0, 0] = l_s[:]


def _kern_mha(scale, BT, quant, l_ref, valid_ref, qbd_ref, e_ref, k_ref,
              v_ref, *rest):
    if quant:
        ks_ref, vs_ref, acc_o, m_o, l_o, m_s, l_s, acc_s = rest
    else:
        ks_ref = vs_ref = None
        acc_o, m_o, l_o, m_s, l_s, acc_s = rest
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    valid = valid_ref[b]
    needed = (valid + BT - 1) // BT

    @pl.when(t < needed)
    def _():
        k = k_ref[0, 0, 0]  # (BT, KV*D) native dtype
        v = v_ref[0, 0, 0]
        if quant:  # int8 codes -> f32 via i32 (direct i8 casts don't lower)
            k = k.astype(jnp.int32).astype(jnp.float32)
            v = v.astype(jnp.int32).astype(jnp.float32)
        # ALL heads in one MXU dot: qbd is block-diagonal (KV*D, KV) with
        # head kv's query in rows [kv*D, (kv+1)*D) of column kv
        s = jax.lax.dot_general(
            k, qbd_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (BT, KV)
        if quant:
            # int8 cache: scales ride in (KV, BT) tiles; one small
            # transpose + elementwise multiply applies them exactly
            s = s * ks_ref[0, 0, 0].T
        k_pos = t * BT + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(k_pos < valid, s, NEG_INF)
        m_prev = m_s[:]  # (1, KV)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
        p = jnp.exp(s - m_new)  # (BT, KV)
        alpha = jnp.exp(m_prev - m_new)  # (1, KV)
        l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=0, keepdims=True)
        if quant:  # fold the V scale into p before the lane expansion
            p = p * vs_ref[0, 0, 0].T
        # expand per-head columns back to per-head lane blocks (E = the
        # 0/1 head->lanes map), weight V, reduce over time (sublanes)
        pexp = jax.lax.dot_general(
            p, e_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (BT, KV*D)
        alpha_exp = jax.lax.dot_general(
            alpha, e_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (1, KV*D)
        z = pexp * v.astype(jnp.float32)
        acc_s[:] = acc_s[:] * alpha_exp + jnp.sum(z, axis=0, keepdims=True)
        m_s[:] = m_new

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        acc_o[:] = acc_s[:]
        m_o[0] = m_s[:]
        l_o[0] = l_s[:]


def _cache_partials_mha(kv4, KV: int, layer, qg: jnp.ndarray,
                        cache_valid: jnp.ndarray,
                        block_t: int = 256, interpret: bool = False):
    """G == 1 (MHA) variant: one grid step covers ALL heads of a time tile —
    scores via a single block-diagonal MXU dot instead of KV separate
    per-head programs (which cost 32x the grid overhead at LLaMA geometry).

    kv4 may be (codes int8, scales (L,2,B,KV,T) f32) for int8 caches."""
    quant = isinstance(kv4, tuple)
    kv4, sc = kv4 if quant else (kv4, None)
    L, _, B, T, KVD = kv4.shape
    D = KVD // KV
    BT = min(block_t, T)
    NT = pl.cdiv(T, BT)
    scale = 1.0 / (D ** 0.5)
    dt = jnp.float32 if quant else kv4.dtype

    q1 = qg.reshape(B, KV, D)
    eye = jnp.eye(KV, dtype=jnp.float32)
    # (B, KV*D, KV) block-diagonal queries; (KV, KV*D) head->lanes expander
    qbd = (q1.astype(jnp.float32)[:, :, :, None]
           * eye[None, :, None, :]).reshape(B, KV * D, KV).astype(dt)
    e = jnp.repeat(eye, D, axis=1).astype(jnp.float32)  # constant-folded

    def k_map(b, t, lref, vref):
        needed = (vref[b] + BT - 1) // BT
        return (lref[0], 0, b, jnp.minimum(t, jnp.maximum(needed - 1, 0)), 0)

    def v_map(b, t, lref, vref):
        needed = (vref[b] + BT - 1) // BT
        return (lref[0], 1, b, jnp.minimum(t, jnp.maximum(needed - 1, 0)), 0)

    def ks_map(b, t, lref, vref):
        needed = (vref[b] + BT - 1) // BT
        return (lref[0], 0, b, 0, jnp.minimum(t, jnp.maximum(needed - 1, 0)))

    def vs_map(b, t, lref, vref):
        needed = (vref[b] + BT - 1) // BT
        return (lref[0], 1, b, 0, jnp.minimum(t, jnp.maximum(needed - 1, 0)))

    scale_specs = [
        pl.BlockSpec((1, 1, 1, KV, BT), ks_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, KV, BT), vs_map, memory_space=pltpu.VMEM),
    ] if quant else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec((1, KV * D, KV), lambda b, t, lref, vref: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KV, KV * D), lambda b, t, lref, vref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, BT, KV * D), k_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, BT, KV * D), v_map, memory_space=pltpu.VMEM),
        ] + scale_specs,
        out_specs=[
            pl.BlockSpec((1, KV * D), lambda b, t, lref, vref: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KV), lambda b, t, lref, vref: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KV), lambda b, t, lref, vref: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, KV), jnp.float32),
            pltpu.VMEM((1, KV), jnp.float32),
            pltpu.VMEM((1, KV * D), jnp.float32),
        ],
    )

    operands = [qbd, e, kv4, kv4] + ([sc, sc] if quant else [])
    acc, m, l = pl.pallas_call(
        functools.partial(_kern_mha, scale, BT, quant),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KV * D), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, KV), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, KV), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray([layer], jnp.int32), jnp.asarray(cache_valid, jnp.int32),
      *operands)
    return (acc.reshape(B, KV, 1, D), m.reshape(B, KV, 1, 1),
            l.reshape(B, KV, 1, 1))


def cache_partials(kv4, KV: int, layer, qg: jnp.ndarray,
                   cache_valid: jnp.ndarray,
                   block_t: int = 512, interpret: bool = False):
    """Online-softmax partials of qg against layer `layer`'s valid cache
    prefix.

    kv4: stacked cache in MERGED head-lane form (L, 2, B, T, KV*D), any
    float dtype — reshape the 6D cache ONCE per chunk (the relayout
    materializes; see models.falcon.merged_cache_view) — or, for int8
    caches, a tuple (codes int8, scales (L, 2, B, KV, T) f32): the kernel
    dequantizes on the fly (scales factor out of the over-D dots).
    qg: (B, KV, G, D) queries grouped by kv head (head h = kv*G + g).
    cache_valid: (B,) int32 — rows strictly below are attended.
    Returns (acc (B,KV,G,D), m (B,KV,G,1), l (B,KV,G,1)), all f32.
    """
    quant = isinstance(kv4, tuple)
    codes4 = kv4[0] if quant else kv4
    L, _, B, T, KVD = codes4.shape
    D = KVD // KV
    G = qg.shape[2]
    if G == 1 and KV > 1 and (KV * D) % 128 == 0:
        return _cache_partials_mha(kv4, KV, layer, qg, cache_valid,
                                   interpret=interpret)
    sc = kv4[1] if quant else None
    kv4 = codes4
    HB = _heads_per_block(KV, D)
    NKV = KV // HB
    BT = min(block_t, T)
    NT = pl.cdiv(T, BT)
    scale = 1.0 / (D ** 0.5)
    q4 = qg.reshape(B, NKV, HB * G, D)

    def tile_idx(t, vref, b):
        # alias out-of-range tiles to the last needed one: an unchanged
        # block index means Pallas skips the DMA for that step
        needed = (vref[b] + BT - 1) // BT
        return jnp.minimum(t, jnp.maximum(needed - 1, 0))

    def k_map(b, kv, t, lref, vref):
        return (lref[0], 0, b, tile_idx(t, vref, b), kv)

    def v_map(b, kv, t, lref, vref):
        return (lref[0], 1, b, tile_idx(t, vref, b), kv)

    def ks_map(b, kv, t, lref, vref):
        return (lref[0], 0, b, kv, tile_idx(t, vref, b))

    def vs_map(b, kv, t, lref, vref):
        return (lref[0], 1, b, kv, tile_idx(t, vref, b))

    scale_specs = [
        pl.BlockSpec((1, 1, 1, HB, BT), ks_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, HB, BT), vs_map, memory_space=pltpu.VMEM),
    ] if quant else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, NKV, NT),
        in_specs=[
            pl.BlockSpec((1, 1, HB * G, D),
                         lambda b, kv, t, lref, vref: (b, kv, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, BT, HB * D), k_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, BT, HB * D), v_map, memory_space=pltpu.VMEM),
        ] + scale_specs,
        out_specs=[
            pl.BlockSpec((1, 1, HB * G, D),
                         lambda b, kv, t, lref, vref: (b, kv, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HB * G, 1),
                         lambda b, kv, t, lref, vref: (b, kv, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HB * G, 1),
                         lambda b, kv, t, lref, vref: (b, kv, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((HB * G, 1), jnp.float32),
            pltpu.VMEM((HB * G, 1), jnp.float32),
            pltpu.VMEM((HB * G, D), jnp.float32),
        ],
    )
    operands = [q4, kv4, kv4] + ([sc, sc] if quant else [])
    acc, m, l = pl.pallas_call(
        functools.partial(_kern, scale, BT, HB, G, D, quant),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, NKV, HB * G, D), jnp.float32),
            jax.ShapeDtypeStruct((B, NKV, HB * G, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, NKV, HB * G, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray([layer], jnp.int32), jnp.asarray(cache_valid, jnp.int32),
      *operands)
    return (acc.reshape(B, KV, G, D), m.reshape(B, KV, G, 1),
            l.reshape(B, KV, G, 1))


def flash_decode(kv4, KV: int, layer: int, q: jnp.ndarray, n_past,
                 kv_append: jnp.ndarray | None = None,
                 append_valid=None, block_t: int = 512,
                 interpret: bool = False) -> jnp.ndarray:
    """Drop-in for models/falcon._attention at S == 1 (decode).

    kv4: stacked cache in merged form (L, 2, B, T, KV*D); layer: which
    layer to attend. q: (B, 1, H, D). n_past: scalar or (B,).
    kv_append: (2, B, A, KV, D) unwritten block ([current token; pending]);
    append_valid: scalar count of valid append entries (None -> all A).
    Cache is valid strictly below n_past - (append_valid - 1) when appending
    (the chunk-start boundary), strictly below n_past + 1 otherwise (the
    current token is already written). Returns (B, 1, H, D) in q.dtype.
    """
    B, S, H, D = q.shape
    assert S == 1, "flash_decode is the S=1 path"
    G = H // KV
    np_vec = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32).reshape(-1), (B,))

    if kv_append is None:
        cache_valid = np_vec + 1
    elif append_valid is not None:
        cache_valid = np_vec - (jnp.asarray(append_valid, jnp.int32) - 1)
    else:
        cache_valid = np_vec

    qg = q.reshape(B, KV, G, D)
    acc, m, l = cache_partials(kv4, KV, layer, qg, cache_valid,
                               block_t=block_t, interpret=interpret)

    if kv_append is not None:
        A = kv_append.shape[2]
        ka = kv_append[0].astype(jnp.float32)  # (B, A, KV, D)
        va = kv_append[1].astype(jnp.float32)
        s2 = jnp.einsum("bkgd,bakd->bkga", qg.astype(jnp.float32), ka,
                        precision=jax.lax.Precision.HIGHEST) * (1.0 / (D ** 0.5))
        if append_valid is not None:
            amask = jnp.arange(A, dtype=jnp.int32) < jnp.asarray(
                append_valid, jnp.int32)
            s2 = jnp.where(amask[None, None, None, :], s2, NEG_INF)
        m2 = jnp.max(s2, axis=-1, keepdims=True)  # (B, KV, G, 1)
        p2 = jnp.exp(s2 - m2)
        l2 = jnp.sum(p2, axis=-1, keepdims=True)
        acc2 = jnp.einsum("bkga,bakd->bkgd", p2, va,
                          precision=jax.lax.Precision.HIGHEST)
        m_t = jnp.maximum(m, m2)
        w1 = jnp.exp(m - m_t)
        w2 = jnp.exp(m2 - m_t)
        acc = acc * w1 + acc2 * w2
        l = l * w1 + l2 * w2

    out = acc / jnp.maximum(l, 1e-30)
    return out.reshape(B, 1, H, D).astype(q.dtype)
