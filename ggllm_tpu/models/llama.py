"""LLaMA forward pass, TPU-native.

Re-implements llama_eval_internal (llama.cpp:1368-1660) in the same engine
framework as the Falcon model (same KV-cache layout, same jit/scan/unroll
discipline, same quant-kernel dispatch through ops/linear):

* RMSNorm (eps 1e-6, ggml_rms_norm) instead of layernorm;
* classic GPT-NeoX-free RoPE (ggml rope mode 0: adjacent pairs (2j, 2j+1)),
  applied to all n_rot = head_dim dims;
* sequential residuals: x += wo(attn(rmsnorm(x))); x += ffn(rmsnorm(x));
* SwiGLU FFN: w2(silu(w1 h) * w3 h);
* no GQA: n_head_kv == n_head.

Weight layouts: merged kernel path stacks [wq; wk; wv] rows -> "wqkv" and
[w1; w3] rows -> "w13" (both pairs share an input); wo and w2 stay separate
(sequential dependency). Split layout keeps all seven matrices for TP.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ggllm_tpu.core.config import LlamaHParams
from ggllm_tpu.models.falcon import (_attention, _attention_decode,
                                     _positions, select_last)
from ggllm_tpu.ops import kvcache
from ggllm_tpu.ops.linear import linear

RMS_EPS = 1e-6  # ggml_rms_norm epsilon


@dataclass(frozen=True)
class LlamaStatic:
    n_layer: int
    n_head: int
    n_head_kv: int
    head_dim: int
    n_embd: int
    n_ff: int
    n_vocab: int
    n_rot: int
    parallel_norms: bool = False  # interface parity with FalconStatic
    flash: bool = False

    @classmethod
    def from_hparams(cls, hp: LlamaHParams, flash: bool = False) -> "LlamaStatic":
        return cls(
            n_layer=hp.n_layer, n_head=hp.n_head, n_head_kv=hp.n_head,
            head_dim=hp.head_dim, n_embd=hp.n_embd, n_ff=hp.n_ff,
            n_vocab=hp.n_vocab, n_rot=hp.n_rot, flash=flash,
        )


def rms_norm(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + RMS_EPS)
    return (y * w.astype(jnp.float32)).astype(x.dtype)


def apply_rope_classic(x: jnp.ndarray, positions: jnp.ndarray,
                       inv_freq: jnp.ndarray, n_rot: int) -> jnp.ndarray:
    """ggml rope mode 0: rotate adjacent pairs (2j, 2j+1) of the first n_rot
    dims (ggml.c rope non-neox path). x: (B, S, H, D)."""
    theta = positions.astype(jnp.float32)[..., None] * inv_freq[: n_rot // 2]
    cos = jnp.cos(theta)[..., None, :]  # (B, S, 1, n_rot/2)
    sin = jnp.sin(theta)[..., None, :]
    xr = x[..., :n_rot].astype(jnp.float32)
    x0 = xr[..., 0::2]
    x1 = xr[..., 1::2]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    rot = jnp.stack([r0, r1], axis=-1).reshape(xr.shape).astype(x.dtype)
    if n_rot == x.shape[-1]:
        return rot
    return jnp.concatenate([rot, x[..., n_rot:]], axis=-1)


def _layer_pre(x, lw, n_past, inv_freq, st: LlamaStatic):
    """RMSNorm + QKV projection + RoPE. Returns (q, kv_new (2,B,S,H,D))."""
    B, S, E = x.shape
    H, D = st.n_head, st.head_dim
    h = rms_norm(x, lw["attn_norm"])
    if "wqkv" in lw:
        qkv = linear(lw["wqkv"], h).reshape(B, S, 3 * H, D)
    else:
        q_ = linear(lw["wq"], h).reshape(B, S, H, D)
        k_ = linear(lw["wk"], h).reshape(B, S, H, D)
        v_ = linear(lw["wv"], h).reshape(B, S, H, D)
        qkv = jnp.concatenate([q_, k_, v_], axis=2)

    positions = _positions(n_past, B, S)
    qk = apply_rope_classic(qkv[:, :, : 2 * H], positions, inv_freq, st.n_rot)
    q = qk[:, :, :H]
    kv_new = jnp.concatenate(
        [qk[:, :, H:][None], qkv[:, :, 2 * H :][None]], axis=0)
    return q, kv_new


def _ffn(x, lw, st: LlamaStatic):
    h = rms_norm(x, lw["ffn_norm"])
    if "w13" in lw:
        g = linear(lw["w13"], h)
        gate, up = g[..., : st.n_ff], g[..., st.n_ff :]
    else:
        gate = linear(lw["w1"], h)
        up = linear(lw["w3"], h)
    act = (jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up)
    return linear(lw["w2"], act)


def llama_layer(x, lw, kv_cache, n_past, inv_freq, st: LlamaStatic):
    q, kv_new = _layer_pre(x, lw, n_past, inv_freq, st)
    kv_cache = kvcache.write(kv_cache, kv_new, n_past)
    k, v = kvcache.read(kv_cache, q.dtype)
    attn = _attention(q, k, v, n_past, st)
    B, S, _ = x.shape
    x = x + linear(lw["wo"], attn.reshape(B, S, st.n_head * st.head_dim))
    return x + _ffn(x, lw, st), kv_cache


def llama_forward(
    params: dict[str, Any],
    tokens: jnp.ndarray,  # (B, S)
    kv: jnp.ndarray,  # (L, 2, B, T, H, D)
    n_past: jnp.ndarray,
    inv_freq: jnp.ndarray,
    st: LlamaStatic,
    logits_all: bool = False,
    compute_dtype=jnp.bfloat16,
    last_pos: jnp.ndarray | int = 0,
    unroll: bool = False,
    output_hidden: bool = False,
    psum_axis: str | None = None,
    pending: jnp.ndarray | None = None,
    n_pend: jnp.ndarray | None = None,
    kv_merged: jnp.ndarray | None = None,
):
    """Same contract as falcon_forward (engine-interchangeable), including
    the chunk-deferred decode mode (pending/n_pend — see falcon_forward:
    attention reads cache + the chunk's unwritten K/V and the new block is
    RETURNED instead of scattered). Under
    tensor parallelism (psum_axis set) wo and w2 are contraction-sharded and
    each residual add reduces the partial output (two collectives/layer —
    sequential residuals, unlike Falcon's single fused psum)."""
    x = jnp.take(params["tok_embeddings"], tokens, axis=0).astype(compute_dtype)

    layers = params["layers"]
    n_past_arr = jnp.asarray(n_past, jnp.int32)
    if isinstance(layers, (list, tuple)) or unroll:
        # ALL decode (scalar n_past too) defers KV writes to one scatter.
        # Unlike Falcon (1 MQA head), LLaMA's (KV=32, D=128) cache tail gives
        # XLA two tiling choices, and per-layer in-loop writes made it
        # ping-pong the WHOLE 1.3 GB cache between layouts ~3x per layer per
        # token (628 ms/token measured); reading the cache + appending the
        # current block, with one scatter at the end, keeps one layout.
        defer = tokens.shape[1] == 1
        chunked = pending is not None
        deferred = []
        for l in range(st.n_layer):
            lw = layers[l] if isinstance(layers, (list, tuple)) else \
                jax.tree.map(lambda a, _l=l: a[_l], layers)
            q, kv_new = _layer_pre(x, lw, n_past, inv_freq, st)
            if chunked:
                app = jnp.concatenate(
                    [kv_new, pending[l].astype(kv_new.dtype)], axis=2)
                attn = _attention_decode(kv, l, q, n_past, st, kv_append=app,
                                         append_valid=1 + n_pend,
                                         kv_merged=kv_merged)
                deferred.append(kv_new)
            elif defer:
                attn = _attention_decode(kv, l, q, n_past, st,
                                         kv_append=kv_new,
                                         kv_merged=kv_merged)
                deferred.append(kv_new)
            else:
                kv = kvcache.write_layer(kv, kv_new, l, n_past)
                k, v = kvcache.read_layer(kv, l, q.dtype)
                attn = _attention(q, k, v, n_past, st)
            B, S, _ = x.shape
            a_out = linear(lw["wo"], attn.reshape(B, S, st.n_head * st.head_dim))
            if psum_axis is not None:
                a_out = jax.lax.psum(a_out, psum_axis)
            x = x + a_out
            f_out = _ffn(x, lw, st)
            if psum_axis is not None:
                f_out = jax.lax.psum(f_out, psum_axis)
            x = x + f_out
        if chunked:
            kv = jnp.stack(deferred)  # returned for the caller to accumulate
        elif defer:
            kv = kvcache.write_all_layers(kv, jnp.stack(deferred), n_past_arr)
    else:
        assert psum_axis is None, "TP runs the unrolled (list) layer path"

        def body(carry, xs):
            h = carry
            lw, kvc = xs
            h, kvc = llama_layer(h, lw, kvc, n_past, inv_freq, st)
            return h, kvc

        x, kv = jax.lax.scan(body, x, (layers, kv))

    x = rms_norm(x, params["output_norm"])
    if not logits_all:
        x = select_last(x, last_pos)
    if output_hidden:
        # embedding path (reference examples/embedding: final normed hidden)
        return x.astype(jnp.float32), kv
    logits = linear(params["lm_head"], x, preferred_dtype=jnp.float32)
    return logits, kv
