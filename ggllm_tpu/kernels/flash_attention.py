"""Pallas flash attention for MQA/GQA prefill over a prefix-valid KV cache.

Replaces the XLA einsum attention (models/falcon._attention) on the TPU
prefill path: instead of materializing (B, KV, G, S, T) f32 scores in HBM
(372 MB per layer at 7B/512x2560), tiles of K/V stream through VMEM with an
online-softmax accumulator — O(S*D) memory, one pass.

Semantics match the reference attention exactly: causal mask
``key_pos <= n_past + query_pos`` (per batch row), f32 softmax, MQA/GQA
query-head broadcast over n_head_kv cache heads (libfalcon.cpp:2285-2356).

Grid: (B, H, S_tiles, T_tiles), T innermost; per-step scratch carries the
running max/denominator/accumulator. Fully-masked T tiles are skipped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kern(scale, BS, BT, causal_skip, q_ref, k_ref, v_ref, np_ref, o_ref,
          m_ref, l_ref, acc_ref):
    s_i = pl.program_id(2)
    t_i = pl.program_id(3)
    n_past = np_ref[pl.program_id(0), 0]  # whole (B,1) array lives in SMEM

    @pl.when(t_i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # skip tiles entirely above the causal diagonal
    first_needed = n_past + s_i * BS  # smallest visible key pos... largest is
    last_q = n_past + (s_i + 1) * BS - 1

    @pl.when(jnp.logical_or(not causal_skip, t_i * BT <= last_q))
    def _():
        q = q_ref[0, 0].astype(jnp.float32)  # (BS, D)
        k = k_ref[0, 0].astype(jnp.float32)  # (BT, D)
        v = v_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (BS, BT)

        q_pos = n_past + s_i * BS + jax.lax.broadcasted_iota(
            jnp.int32, (BS, BT), 0)
        k_pos = t_i * BT + jax.lax.broadcasted_iota(jnp.int32, (BS, BT), 1)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)

        m_prev = m_ref[:]  # (BS, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)  # (BS, BT)
        alpha = jnp.exp(m_prev - m_new)  # (BS, 1)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(t_i == pl.num_programs(3) - 1)
    def _():
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        o_ref[0, 0] = out.astype(o_ref.dtype)


def flash_mqa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, n_past,
              block_s: int = 256, block_t: int = 512,
              interpret: bool = False) -> jnp.ndarray:
    """Causal MQA/GQA attention. q (B,S,H,D); k/v (B,T,KV,D); n_past scalar
    or (B,). Returns (B,S,H,D) in q.dtype."""
    B, S, H, D = q.shape
    T, KV = k.shape[1], k.shape[2]
    G = H // KV
    BS = min(block_s, S)
    BT = min(block_t, T)
    scale = 1.0 / (D ** 0.5)
    np_vec = jnp.broadcast_to(
        jnp.asarray(n_past, jnp.int32).reshape(-1), (B,)).reshape(B, 1)

    # head-major layout: the block's trailing dims must be the (row, lane)
    # tile, so heads move to a leading (blocked-by-1) axis. For MQA (KV=1)
    # the cache transpose is a free reshape.
    qh = jnp.swapaxes(q, 1, 2)  # (B, H, S, D)
    kh = jnp.swapaxes(k, 1, 2)  # (B, KV, T, D)
    vh = jnp.swapaxes(v, 1, 2)

    grid = (B, H, pl.cdiv(S, BS), pl.cdiv(T, BT))
    kern = functools.partial(_kern, scale, BS, BT, True)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, BS, D), lambda b, h, s, t: (b, h, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BT, D), lambda b, h, s, t, _G=G: (b, h // _G, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BT, D), lambda b, h, s, t, _G=G: (b, h // _G, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda b, h, s, t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, BS, D), lambda b, h, s, t: (b, h, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((BS, 1), jnp.float32),  # running max
            pltpu.VMEM((BS, 1), jnp.float32),  # running denominator
            pltpu.VMEM((BS, D), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qh, kh, vh, np_vec)
    return jnp.swapaxes(out, 1, 2)
