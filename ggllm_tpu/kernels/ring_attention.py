"""Ring attention: causal attention over sequence-sharded KV.

The reference handles long context algorithmically on one device (NTK RoPE,
16k KV on one GPU, SURVEY §5.7); the TPU-native scaling path shards the KV
cache over a mesh axis and rotates K/V blocks around the ring
(lax.ppermute over ICI) while each device folds blocks into an
online-softmax accumulator — memory per device stays O(T/n), compute
overlaps communication across steps.

This is the jax-level building block (runs inside shard_map); engine
integration (sequence-parallel prefill) composes it with the TP plan.
Blockwise/flash semantics match models/falcon._attention exactly and are
test-verified against it on a multi-device host mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ring_attention(
    q: jnp.ndarray,  # (B, Sl, H, D) — this device's query block
    k: jnp.ndarray,  # (B, Tl, KV, D) — this device's KV block
    v: jnp.ndarray,
    axis_name: str,
    n_past=0,  # scalar or (B,) int32: global positions in cache before q
) -> jnp.ndarray:
    """Causal MQA/GQA attention with KV sharded over `axis_name`.

    Device i owns query positions [n_past + i*Sl, ...) and key positions
    [i*Tl, ...). n_past may be per-row (B,) — the continuous-batching row
    prefill. Returns this device's (B, Sl, H, D) output block.
    """
    B, Sl, H, D = q.shape
    Tl, KV = k.shape[1], k.shape[2]
    G = H // KV
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    scale = 1.0 / (D ** 0.5)
    n_past = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32).reshape(-1), (B,))

    qf = q.reshape(B, Sl, KV, G, D).astype(jnp.float32)
    q_pos = (n_past[:, None] + idx * Sl
             + jnp.arange(Sl, dtype=jnp.int32)[None, :])  # (B, Sl)

    acc = jnp.zeros((B, Sl, H, D), jnp.float32)
    m = jnp.full((B, KV, G, Sl, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((B, KV, G, Sl, 1), jnp.float32)

    def fold(carry, step):
        acc, m, l, k, v = carry
        owner = (idx - step) % n  # whose KV block we hold this step
        k_pos = owner * Tl + jnp.arange(Tl, dtype=jnp.int32)  # (Tl,)

        s = jnp.einsum("bskgd,btkd->bkgst", qf, k.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST) * scale
        mask = k_pos[None, None, :] <= q_pos[:, :, None]  # (B, Sl, Tl)
        s = jnp.where(mask[:, None, None], s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)  # (B, KV, G, Sl, Tl)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        upd = jnp.einsum("bkgst,btkd->bskgd", p, v.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)
        acc = acc * alpha.transpose(0, 3, 1, 2, 4).reshape(B, Sl, H, 1) \
            + upd.reshape(B, Sl, H, D)
        m = m_new

        # rotate KV blocks one hop around the ring
        perm = [(i, (i + 1) % n) for i in range(n)]
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        return (acc, m, l, k, v), None

    (acc, m, l, k, v), _ = jax.lax.scan(
        fold, (acc, m, l, k, v), jnp.arange(n), length=n)

    l_full = jnp.maximum(l, 1e-30).transpose(0, 3, 1, 2, 4).reshape(B, Sl, H, 1)
    return (acc / l_full).astype(q.dtype)
