"""Sequence-parallel engine mode: KV cache sharded along TIME over the mesh.

The reference's long-context answer is algorithmic (NTK RoPE + 16k KV on one
GPU, SURVEY §5.7); this module is the TPU-native scaling path beyond one
chip's HBM: the (L, 2, B, T, KV, D) cache shards on T across the `model`
axis, so per-chip KV memory is T/mp — contexts larger than any single chip's
budget.

Weights stay replicated (this mode trades weight replication for KV
capacity; compose with TP across a second axis when both are needed):

* prefill: activations shard on the sequence block — each device embeds and
  projects its S/mp slice, the new K/V rows all-gather (tiny: S x KV x D),
  land on their owning shard, and attention runs as RING ATTENTION
  (kernels/ring_attention.py): K/V blocks rotate around the ICI ring via
  ppermute while each device folds blocks into an online-softmax
  accumulator;
* decode: the single token replicates; each device computes a PARTIAL
  attention over its KV shard and the partials merge with a
  max/renormalize psum (flash-decoding style) — two tiny collectives.

Runs inside shard_map; the engine selects it via EngineConfig.kv_shard ==
"sequence". Falcon-family models only (the long-context target).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ggllm_tpu.kernels.layout import KernelQuant
from ggllm_tpu.kernels.ring_attention import ring_attention
from ggllm_tpu.models import falcon as fmod
from ggllm_tpu.ops import kvcache
from ggllm_tpu.ops.linear import linear

NEG_HALF = -5e29  # threshold under which a running max means "nothing seen"


def sp_param_specs(params: dict):
    """All-replicated PartitionSpec tree matching the param structure."""
    def leaf(w):
        if isinstance(w, KernelQuant):
            nd = next(iter(w.planes.values())).ndim
            return KernelQuant(w.gtype, w.shape, w.ck,
                               {k: P(*([None] * nd)) for k in w.planes})
        return P()

    out = {}
    for k, v in params.items():
        if k == "layers":
            out[k] = [{kk: leaf(vv) for kk, vv in lw.items()} for lw in v]
        else:
            out[k] = leaf(v)
    return out


def kv_spec() -> P:
    """(L, 2, B, T, KV, D): shard the time axis."""
    return P(None, None, None, "model", None, None)


def replicate_params(params: dict, mesh):
    spec = sp_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), NamedSharding(mesh, s)),
        params, spec)


def write_layer_local(kv, kv_new, l: int, n_past, idx, Tl: int):
    """Write kv_new (2,B,S,KV,D) at GLOBAL positions [n_past, n_past+S) into
    this device's local shard (rows [idx*Tl, (idx+1)*Tl)); out-of-shard rows
    drop. n_past may be per-row (B,) — continuous-batching row prefill."""
    is_q = isinstance(kv, tuple)
    new_tree = kvcache.quantize_new(kv_new) if is_q else kv_new
    B, S = kv_new.shape[1], kv_new.shape[2]
    n_past = jnp.asarray(n_past, jnp.int32)
    if n_past.ndim == 0:
        pos = n_past + jnp.arange(S, dtype=jnp.int32) - idx * Tl
        pos = jnp.where((pos >= 0) & (pos < Tl), pos, Tl)  # OOB -> dropped
        l_arr = jnp.full(pos.shape, l, jnp.int32)

        def upd(c, n):
            # two advanced indices (layer, time) broadcast to (S,) and land
            # in front: the update is (S, 2, B, KV, D)
            nt = jnp.moveaxis(n.astype(c.dtype), 2, 0)
            return c.at[l_arr, :, :, pos].set(nt, mode="drop")

        return jax.tree.map(upd, kv, new_tree)

    # per-row positions: (B, S) scatter into the local time window
    pos = (n_past[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
           - idx * Tl)  # (B, S)
    pos = jnp.where((pos >= 0) & (pos < Tl), pos, Tl)
    l_arr = jnp.full((B, S), l, jnp.int32)
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]

    def upd(c, n):
        nt = jnp.moveaxis(n.astype(c.dtype), (1, 2), (0, 1))  # (B,S,2,KV,D)
        return c.at[l_arr, :, rows, pos].set(nt, mode="drop")

    return jax.tree.map(upd, kv, new_tree)


def merged_attention(q, k, v, n_past, idx, Tl: int, axis: str,
                     append=None, append_valid=None):
    """Decode attention over time-sharded KV: local partial softmax stats,
    then a pmax/psum merge across shards.

    append (2, B, A, KV, D) + append_valid (scalar): chunk-deferred K/V not
    yet scattered into the shards — [current token; pending buffer], first
    append_valid entries real. The cache is then valid strictly below
    n_past - (append_valid - 1). Only device 0 counts the appended columns
    (they are masked off elsewhere), so the psum merge sees each exactly
    once."""
    B, S, H, D = q.shape
    KV = k.shape[2]
    G = H // KV
    scale = 1.0 / (D ** 0.5)

    qg = q.reshape(B, S, KV, G, D).astype(jnp.float32)
    s = jnp.einsum("bskgd,btkd->bkgst", qg, k.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST) * scale
    q_pos = fmod._positions(n_past, B, S)  # (B, S) global
    k_pos = idx * Tl + jnp.arange(Tl, dtype=jnp.int32)
    if append is not None:
        np_vec = jnp.broadcast_to(
            jnp.asarray(n_past, jnp.int32).reshape(-1), (B,))
        cache_start = np_vec - (append_valid - 1)
        mask = jnp.broadcast_to(
            k_pos[None, None, :] < cache_start[:, None, None], (B, S, Tl))
    else:
        mask = k_pos[None, None, :] <= q_pos[:, :, None]  # (B, S, Tl)
    s = jnp.where(mask[:, None, None], s, -1e30)
    if append is not None:
        A = append.shape[2]
        ka = append[0].astype(jnp.float32)
        va = append[1].astype(jnp.float32)
        sa = jnp.einsum("bskgd,btkd->bkgst", qg, ka,
                        precision=jax.lax.Precision.HIGHEST) * scale
        amask = jnp.broadcast_to(
            (jnp.arange(A, dtype=jnp.int32)[None, None, :] < append_valid)
            & (idx == 0), (B, S, A))
        sa = jnp.where(amask[:, None, None], sa, -1e30)
        s = jnp.concatenate([s, sa], axis=-1)
        v = jnp.concatenate([v.astype(jnp.float32), va], axis=1)

    m_loc = jnp.max(s, axis=-1, keepdims=True)  # (B,KV,G,S,1)
    seen = m_loc > NEG_HALF
    p = jnp.where(seen, jnp.exp(s - m_loc), 0.0)
    l_loc = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bkgst,btkd->bskgd", p, v.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)  # (B,S,KV,G,D)

    m_glob = jax.lax.pmax(m_loc, axis)
    coef = jnp.where(seen, jnp.exp(m_loc - m_glob), 0.0)  # (B,KV,G,S,1)
    l_glob = jax.lax.psum(l_loc * coef, axis)
    coef_acc = coef.transpose(0, 3, 1, 2, 4)  # (B,S,KV,G,1)
    acc_glob = jax.lax.psum(acc * coef_acc, axis)
    out = acc_glob / jnp.maximum(
        l_glob.transpose(0, 3, 1, 2, 4), 1e-30)
    return out.reshape(B, S, H, D).astype(q.dtype)


def sp_prefill(params, tokens_local, kv, n_past, inv_freq, st,
               axis: str = "model", logits_all: bool = False,
               compute_dtype=jnp.bfloat16, last_pos=0,
               output_hidden: bool = False):
    """Sequence-sharded prefill body (inside shard_map).

    tokens_local: (B, Sl) this device's block of the padded chunk. Returns
    (logits, kv): logits (B, Sl, V) local rows when logits_all (out_spec
    assembles the global (B, S, V)), else replicated (B, 1, V) at the global
    last_pos. output_hidden=True returns the final normed hidden state at
    last_pos instead of logits (the embedding path, engine.embed)."""
    idx = jax.lax.axis_index(axis)
    B, Sl = tokens_local.shape
    Tl = (kv[0] if isinstance(kv, tuple) else kv).shape[3]
    base = n_past + idx * Sl  # this device's first global position

    x = jnp.take(params["tok_embeddings"], tokens_local, axis=0).astype(compute_dtype)
    for l in range(st.n_layer):
        lw = params["layers"][l]
        q, kv_new, gf = fmod._layer_pre(x, lw, base, inv_freq, st)
        # everyone needs every device's new K/V rows: tiny all-gather
        kv_new_g = jax.tree.map(
            lambda a: jax.lax.all_gather(a, axis, axis=2, tiled=True), kv_new)
        kv = write_layer_local(kv, kv_new_g, l, n_past, idx, Tl)
        k, v = kvcache.read_layer(kv, l, q.dtype)
        attn = ring_attention(q, k, v, axis, n_past)
        x = fmod._layer_post(x, lw, attn, gf, st)

    x = fmod.layer_norm(x, params["output_norm"], params["output_norm_b"])
    if logits_all:
        return linear(params["lm_head"], x, preferred_dtype=jnp.float32), kv
    # global last_pos (scalar or per-row (B,)) -> owning device selects;
    # psum broadcasts the row
    lp = jnp.asarray(last_pos, jnp.int32)
    owner = jnp.broadcast_to((lp // Sl).reshape(-1), (B,))[:, None, None]
    local = jnp.clip(lp - idx * Sl, 0, Sl - 1)
    xl = fmod.select_last(x, local)
    if output_hidden:
        h = jnp.where(idx == owner, xl.astype(jnp.float32), 0.0)
        return jax.lax.psum(h, axis), kv
    logits = linear(params["lm_head"], xl, preferred_dtype=jnp.float32)
    logits = jnp.where(idx == owner, logits, 0.0)
    return jax.lax.psum(logits, axis), kv


def sp_decode_rows(params, tokens, kv, n_past_vec, inv_freq, st, pending,
                   n_pend, axis: str = "model", compute_dtype=jnp.bfloat16):
    """Per-row-position decode body (continuous batching) with chunk-deferred
    KV: attention reads the time-sharded cache (valid strictly below each
    row's chunk-start position) plus [current; pending] appended on device 0
    only (merged_attention append path). Returns (logits (B,1,V), kv_new
    (L,2,B,1,KV,D)) — the caller accumulates kv_new into pending and lands
    ONE local scatter per chunk (kvcache.write_all_layers local window)."""
    idx = jax.lax.axis_index(axis)
    Tl = (kv[0] if isinstance(kv, tuple) else kv).shape[3]

    x = jnp.take(params["tok_embeddings"], tokens, axis=0).astype(compute_dtype)
    deferred = []
    for l in range(st.n_layer):
        lw = params["layers"][l]
        q, kv_new, gf = fmod._layer_pre(x, lw, n_past_vec, inv_freq, st)
        k, v = kvcache.read_layer(kv, l, q.dtype)
        app = jnp.concatenate([kv_new, pending[l].astype(kv_new.dtype)],
                              axis=2)
        attn = merged_attention(q, k, v, n_past_vec, idx, Tl, axis,
                                append=app, append_valid=1 + n_pend)
        deferred.append(kv_new)
        x = fmod._layer_post(x, lw, attn, gf, st)

    x = fmod.layer_norm(x, params["output_norm"], params["output_norm_b"])
    logits = linear(params["lm_head"], x, preferred_dtype=jnp.float32)
    return logits, jnp.stack(deferred)


def sp_decode(params, tokens, kv, n_past, inv_freq, st, axis: str = "model",
              compute_dtype=jnp.bfloat16):
    """Single-position decode body (inside shard_map): token replicated,
    partial attention per KV shard + merge. Returns (logits (B,1,V), kv)."""
    idx = jax.lax.axis_index(axis)
    Tl = (kv[0] if isinstance(kv, tuple) else kv).shape[3]

    x = jnp.take(params["tok_embeddings"], tokens, axis=0).astype(compute_dtype)
    for l in range(st.n_layer):
        lw = params["layers"][l]
        q, kv_new, gf = fmod._layer_pre(x, lw, n_past, inv_freq, st)
        kv = write_layer_local(kv, kv_new, l, n_past, idx, Tl)
        k, v = kvcache.read_layer(kv, l, q.dtype)
        attn = merged_attention(q, k, v, n_past, idx, Tl, axis)
        x = fmod._layer_post(x, lw, attn, gf, st)

    x = fmod.layer_norm(x, params["output_norm"], params["output_norm_b"])
    logits = linear(params["lm_head"], x, preferred_dtype=jnp.float32)
    return logits, kv
