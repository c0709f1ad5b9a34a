"""Pallas flash attention for MQA/GQA prefill over a prefix-valid KV cache.

Replaces the XLA einsum attention (models/falcon._attention) on the TPU
prefill path: instead of materializing (B, KV, G, S, T) f32 scores in HBM
(372 MB per layer at 7B/512x2560), tiles of K/V stream through VMEM with an
online-softmax accumulator — O(S*D) memory, one pass.

Semantics match the reference attention exactly: causal mask
``key_pos <= n_past + query_pos`` (per batch row), f32 softmax, MQA/GQA
query-head broadcast over n_head_kv cache heads (libfalcon.cpp:2285-2356).

Grid: (B, head_blocks, S_tiles, T_tiles), T innermost; per-step scratch
carries the running max/denominator/accumulator. HB query heads sharing one
KV head are folded into the sublane axis of ONE dot per tile (71 per-head
programs cost 8x the grid overhead). Tiles entirely above the causal
diagonal alias their K/V block index to the last needed tile, so their DMA
is skipped (scalar-prefetch index maps, same trick as flash_decode); tiles
entirely below the diagonal skip the iota/select masking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kern(scale, BS, BT, HB, q_ref, k_ref, v_ref, o_ref,
          m_ref, l_ref, acc_ref, *, np_ref):
    b = pl.program_id(0)
    s_i = pl.program_id(2)
    t_i = pl.program_id(3)
    n_past = np_ref[b]

    @pl.when(t_i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    first_q = n_past + s_i * BS  # smallest query position in this tile
    last_q = first_q + BS - 1
    visible = t_i * BT <= last_q  # some key in tile is visible
    # every key in the tile is visible to every query row: no mask needed
    full = t_i * BT + BT - 1 <= first_q

    def update(masked: bool):
        D = q_ref.shape[-1]
        # dots run in the cache's native dtype with f32 accumulation: a
        # bf16 MXU pass is 4-8x an f32 one, and exact mode (f32 inputs)
        # is unchanged since the operands are already f32 there
        q = q_ref[0].reshape(HB * BS, D)
        k = k_ref[0, 0]  # (BT, D)
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (HB*BS, BT)
        if masked:
            # row r of head-block handles query position first_q + r % BS
            q_pos = first_q + jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (HB * BS, BT), 0), BS)
            k_pos = t_i * BT + jax.lax.broadcasted_iota(
                jnp.int32, (HB * BS, BT), 1)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        m_prev = m_ref[:]  # (HB*BS, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(full)
    def _():
        update(masked=False)

    @pl.when(jnp.logical_and(visible, jnp.logical_not(full)))
    def _():
        update(masked=True)

    @pl.when(t_i == pl.num_programs(3) - 1)
    def _():
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = out.reshape(o_ref.shape[1:]).astype(o_ref.dtype)


def _head_block(H: int, KV: int) -> int:
    """Largest head-block size: HB query heads fold into one dot. All heads
    of a block must share one KV head, so HB must divide G (for MQA KV == 1
    padding heads to a multiple is safe — they all map to cache head 0)."""
    if KV == 1:
        return 8
    G = H // KV
    for hb in (8, 4, 2):
        if G % hb == 0 and H % hb == 0:
            return hb
    return 1


def flash_mqa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, n_past,
              block_s: int = 256, block_t: int = 512,
              interpret: bool = False) -> jnp.ndarray:
    # VMEM budget: the (HB*BS, BT) f32 score tile dominates (4 MB at
    # 8*256 x 512); BS=256 with HB=8 halves the grid vs per-head BS=512
    """Causal MQA/GQA attention. q (B,S,H,D); k/v (B,T,KV,D); n_past scalar
    or (B,). Returns (B,S,H,D) in q.dtype."""
    B, S, H, D = q.shape
    T, KV = k.shape[1], k.shape[2]
    G = H // KV
    BS = min(block_s, S)
    BT = min(block_t, T)
    NT = pl.cdiv(T, BT)
    scale = 1.0 / (D ** 0.5)
    np_vec = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32).reshape(-1), (B,))

    HB = _head_block(H, KV)
    Hp = -(-H // HB) * HB  # pad heads to a block multiple (MQA only)

    # head-major layout: the block's trailing dims must be the (row, lane)
    # tile, so heads move to a leading blocked axis. For MQA (KV=1) the
    # cache transpose is a free reshape.
    qh = jnp.swapaxes(q, 1, 2)  # (B, H, S, D)
    if Hp != H:
        qh = jnp.pad(qh, ((0, 0), (0, Hp - H), (0, 0), (0, 0)))
    kh = jnp.swapaxes(k, 1, 2)  # (B, KV, T, D)
    vh = jnp.swapaxes(v, 1, 2)

    def kv_map(b, h, s, t, npr):
        # heads h*HB..h*HB+HB-1 share this KV head (padded heads clamp to
        # the last real one); tiles above the causal diagonal alias the
        # last needed tile index so their DMA is skipped
        kv = jnp.minimum((h * HB) // G, KV - 1)
        needed = jax.lax.div(npr[b] + (s + 1) * BS - 1, BT)
        return (b, kv, jnp.minimum(t, needed), 0)

    grid = (B, Hp // HB, pl.cdiv(S, BS), NT)
    out = pl.pallas_call(
        lambda npr, *refs: functools.partial(_kern, scale, BS, BT, HB,
                                             np_ref=npr)(*refs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, HB, BS, D), lambda b, h, s, t, npr: (b, h, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BT, D), kv_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BT, D), kv_map, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, HB, BS, D),
                                   lambda b, h, s, t, npr: (b, h, s, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((HB * BS, 1), jnp.float32),  # running max
                pltpu.VMEM((HB * BS, 1), jnp.float32),  # running denominator
                pltpu.VMEM((HB * BS, D), jnp.float32),  # output accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hp, S, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(np_vec, qh, kh, vh)
    return jnp.swapaxes(out[:, :H], 1, 2)
