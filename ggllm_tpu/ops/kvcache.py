"""KV-cache storage helpers: plain dtype or int8-quantized.

The reference keeps an fp16 KV option (-f16_kv); the TPU build adds an int8
mode (cfg.kv_dtype="int8") that halves KV memory vs bf16 — the lever for
long-context LLaMA-family models where KV is n_head-wide. Each cached
(position, head) vector carries one f32 scale (absmax/127); quantization
happens at append, dequantization at attention read. MQA Falcon KV is tiny
either way, so int8 mainly serves 16k+ contexts.

A cache is either a single array (L, 2, B, T, KV, D) or, in int8 mode, a
tuple (data int8, scales f32 (L, 2, B, T, KV, 1)); both are pytrees, so
scan slicing, jit donation, and shard_map specs work unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def new(shape: tuple, kv_dtype):
    """Allocate a cache. shape = (L, 2, B, T, KV, D)."""
    if kv_dtype == "int8":
        return (jnp.zeros(shape, jnp.int8),
                jnp.ones(shape[:-1] + (1,), jnp.float32))
    return jnp.zeros(shape, jnp.dtype(kv_dtype))


def quantize_new(kv_new: jnp.ndarray):
    """(2, B, S, KV, D) float -> (int8 codes, f32 scales (2,B,S,KV,1))."""
    f = kv_new.astype(jnp.float32)
    amax = jnp.max(jnp.abs(f), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(f / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _dus(tree, new_tree, idx):
    return jax.tree.map(
        lambda c, n: jax.lax.dynamic_update_slice(c, n.astype(c.dtype), idx),
        tree, new_tree)


def write(kv_cache, kv_new, n_past):
    """Append kv_new (2,B,S,KV,D) to a per-layer cache at per-row offsets."""
    is_q = isinstance(kv_cache, tuple)
    new_tree = quantize_new(kv_new) if is_q else kv_new
    n_past = jnp.asarray(n_past, jnp.int32)
    if n_past.ndim == 0:
        return _dus(kv_cache, new_tree, (0, 0, n_past, 0, 0))

    # per-row offsets: ONE scatter over (row, time) indices. A vmap'd
    # dynamic_update_slice here lowered to a cascade of full-cache copies
    # that dominated the batched decode profile (24 ms/step of XLA `copy`).
    B, S = kv_new.shape[1], kv_new.shape[2]
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]  # (B,1)
    pos = n_past[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]  # (B,S)

    def upd(c, n):
        # advanced indices on contiguous axes (1,2): update is (2,B,S,...)
        return c.at[:, rows, pos].set(n.astype(c.dtype), mode="drop")

    return jax.tree.map(upd, kv_cache, new_tree)


def write_layer(kv, kv_new, l: int, n_past):
    """Append kv_new into layer l of the stacked cache (minimal writes)."""
    is_q = isinstance(kv, tuple)
    new_tree = quantize_new(kv_new) if is_q else kv_new  # (2,B,S,KV,D) leaves
    n_past = jnp.asarray(n_past, jnp.int32)
    if n_past.ndim == 0:
        return _dus(kv, jax.tree.map(lambda n: n[None], new_tree),
                    (l, 0, 0, n_past, 0, 0))

    # per-row offsets: one scatter (see write()); layer + row + time advanced
    # indices land in front, so the update transposes to (B,S,2,...)
    B, S = kv_new.shape[1], kv_new.shape[2]
    l_arr = jnp.full((B, 1), l, jnp.int32)
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]  # (B,1)
    pos = n_past[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]  # (B,S)

    def upd(c, n):
        nt = jnp.moveaxis(n.astype(c.dtype), (1, 2), (0, 1))  # (B,S,2,...)
        return c.at[l_arr, :, rows, pos].set(nt, mode="drop")

    return jax.tree.map(upd, kv, new_tree)


def write_all_layers(kv, kv_new_stacked, n_past, local=None):
    """ONE scatter writing every layer's kv_new (L,2,B,S,KV,D) at per-row
    offsets. The batched decode path defers its per-layer writes here —
    32 separate scatters on the stacked cache each materialized copies in
    XLA; a single scatter is one (ideally in-place) update.

    local=(start, Tl): the cache is a time-shard holding GLOBAL rows
    [start, start+Tl) (sequence-parallel mode) — positions are rebased and
    out-of-window entries drop."""
    is_q = isinstance(kv, tuple)
    new_tree = kv_new_stacked
    if is_q:
        f = kv_new_stacked.astype(jnp.float32)
        amax = jnp.max(jnp.abs(f), axis=-1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        new_tree = (jnp.clip(jnp.round(f / scale), -127, 127).astype(jnp.int8),
                    scale)
    B, S = kv_new_stacked.shape[2], kv_new_stacked.shape[3]
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]  # (B,1)
    n_past = jnp.asarray(n_past, jnp.int32).reshape(-1)
    pos = n_past[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]  # (B,S)
    if local is not None:
        start, Tl = local
        pos = pos - start
        pos = jnp.where((pos >= 0) & (pos < Tl), pos, Tl)  # OOB -> dropped

    def upd(c, n):
        # advanced indices on contiguous axes (2,3): update keeps layout
        return c.at[:, :, rows, pos].set(n.astype(c.dtype), mode="drop")

    return jax.tree.map(upd, kv, new_tree)


def read_layer(kv, l, compute_dtype=jnp.bfloat16):
    """Layer l's (k, v) as dense arrays (dequantized for int8 caches)."""
    if isinstance(kv, tuple):
        data, scales = kv
        deq = (data[l].astype(jnp.float32) * scales[l]).astype(compute_dtype)
        return deq[0], deq[1]
    return kv[l, 0], kv[l, 1]


def read(kv_cache, compute_dtype=jnp.bfloat16):
    """Per-layer cache (2,B,T,KV,D) -> (k, v)."""
    if isinstance(kv_cache, tuple):
        data, scales = kv_cache
        deq = (data.astype(jnp.float32) * scales).astype(compute_dtype)
        return deq[0], deq[1]
    return kv_cache[0], kv_cache[1]
