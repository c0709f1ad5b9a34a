"""Falcon (7B/40B/180B) forward pass, TPU-native.

Re-implements the computation of falcon_eval_internal (libfalcon.cpp:2011-2588)
as a functional JAX program:

* the file's fused QKV projection (rows [all Q; all K; all V],
  libfalcon.cpp:2204-2226 / falcon_convert.py:155-179) is split at load time
  into wq/wk/wv: under tensor parallelism Q shards cleanly by row while the
  tiny MQA K/V projections replicate, which the fused matrix cannot express;
* NeoX RoPE with dynamic NTK scaling on Q and K (libfalcon.cpp:2229-2234);
* multi-query / grouped-query attention: n_head query heads share n_head_kv
  KV heads via broadcast (the reference's repeat2-vs-broadcast path,
  libfalcon.cpp:2285-2356);
* parallel attention + FFN residual: ``x = x + attn(ln_a(x)) + mlp(ln_m(x))``
  (libfalcon.cpp:2399-2403). Falcon-7B has ONE input layernorm feeding both;
  40B/180B have separate ln_attn / ln_mlp (libfalcon.cpp:2177-2188);
* GELU FFN (4x expansion), final layernorm, lm_head.

Instead of rebuilding a graph per token like the reference, layer weights are
stacked on a leading axis and the layer loop is a single lax.scan — one
compiled layer body, static shapes, KV cache updated functionally in the scan
carry (donated by the engine so XLA updates it in place).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.ops.linear import linear
from ggllm_tpu.ops.rope import apply_rope

NORM_EPS = 1e-5  # ggml_norm epsilon (ggml.c, const eps = 1e-5f)


@dataclass(frozen=True)
class FalconStatic:
    """Static (hashable) model description passed through jit."""

    n_layer: int
    n_head: int
    n_head_kv: int
    head_dim: int
    n_embd: int
    n_ff: int
    n_vocab: int
    parallel_norms: bool  # True for 40B/180B (separate ln_attn/ln_mlp)

    @classmethod
    def from_hparams(cls, hp: FalconHParams) -> "FalconStatic":
        return cls(
            n_layer=hp.n_layer,
            n_head=hp.n_head,
            n_head_kv=hp.n_head_kv,
            head_dim=hp.head_dim,
            n_embd=hp.n_embd,
            n_ff=hp.n_ff,
            n_vocab=hp.n_vocab,
            parallel_norms=hp.n_falcon_type >= 40,
        )


def layer_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + NORM_EPS)
    return (y * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _attention(
    q: jnp.ndarray,  # (B, S, H, D)
    k: jnp.ndarray,  # (B, T, KV, D) — full cache
    v: jnp.ndarray,  # (B, T, KV, D)
    n_past: jnp.ndarray,  # scalar int32
    st: FalconStatic,
) -> jnp.ndarray:
    """Causal MQA/GQA attention over a prefix-valid KV cache. f32 softmax."""
    B, S, H, D = q.shape
    T = k.shape[1]
    G = H // st.n_head_kv  # query heads per kv head

    qg = q.reshape(B, S, st.n_head_kv, G, D).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    # scores: (B, KV, G, S, T); f32 operands need HIGHEST for exact-mode parity
    scores = jnp.einsum(
        "bskgd,btkd->bkgst", qg, kf, precision=jax.lax.Precision.HIGHEST
    ) * (1.0 / jnp.sqrt(D).astype(jnp.float32))

    # causal + validity mask: key position t visible to query i iff t <= n_past + i
    q_pos = n_past + jnp.arange(S, dtype=jnp.int32)  # (S,)
    t_pos = jnp.arange(T, dtype=jnp.int32)  # (T,)
    mask = t_pos[None, :] <= q_pos[:, None]  # (S, T)
    scores = jnp.where(mask[None, None, None], scores, -jnp.inf)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgst,btkd->bskgd", probs, vf, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(B, S, H, D).astype(q.dtype)


def falcon_layer(
    x: jnp.ndarray,  # (B, S, E)
    lw: dict[str, Any],  # per-layer weights (leading L axis removed by scan)
    k_cache: jnp.ndarray,  # (B, T, KV, D)
    v_cache: jnp.ndarray,
    n_past: jnp.ndarray,
    inv_freq: jnp.ndarray,
    st: FalconStatic,
):
    B, S, E = x.shape
    H, KV, D = st.n_head, st.n_head_kv, st.head_dim

    ln_mlp = layer_norm(x, lw["input_ln_w"], lw["input_ln_b"])
    if st.parallel_norms:
        ln_attn = layer_norm(x, lw["attn_ln_w"], lw["attn_ln_b"])
    else:
        ln_attn = ln_mlp

    q = linear(lw["wq"], ln_attn).reshape(B, S, H, D)
    kc = linear(lw["wk"], ln_attn).reshape(B, S, KV, D)
    vc = linear(lw["wv"], ln_attn).reshape(B, S, KV, D)

    positions = n_past + jnp.arange(S, dtype=jnp.int32)[None, :]  # (1, S)
    q = apply_rope(q, positions, inv_freq)
    kc = apply_rope(kc, positions, inv_freq)

    # append to cache at n_past (static S, dynamic offset)
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, kc.astype(k_cache.dtype), (0, n_past, 0, 0)
    )
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, vc.astype(v_cache.dtype), (0, n_past, 0, 0)
    )

    attn = _attention(q, k_cache, v_cache, n_past, st)
    attn_out = linear(lw["wo"], attn.reshape(B, S, H * D))

    ff = linear(lw["ffn_up"], ln_mlp)
    ff = jax.nn.gelu(ff.astype(jnp.float32), approximate=True).astype(ff.dtype)
    ff_out = linear(lw["ffn_down"], ff)

    # parallel residual
    return x + attn_out + ff_out, k_cache, v_cache


def falcon_forward(
    params: dict[str, Any],
    tokens: jnp.ndarray,  # (B, S) int32
    kv_k: jnp.ndarray,  # (L, B, T, KV, D)
    kv_v: jnp.ndarray,
    n_past: jnp.ndarray,  # scalar int32
    inv_freq: jnp.ndarray,  # (D/2,) f32
    st: FalconStatic,
    logits_all: bool = False,
    compute_dtype=jnp.bfloat16,
    last_pos: jnp.ndarray | int = 0,
):
    """Run the full model. Returns (logits f32, new kv_k, new kv_v).

    logits_all=False returns logits for position `last_pos` only (decode /
    padded-prefill path); True returns (B, S, V) (perplexity path).
    """
    x = jnp.take(params["tok_embeddings"], tokens, axis=0).astype(compute_dtype)

    def body(carry, xs):
        h = carry
        lw, kc, vc = xs
        h, kc, vc = falcon_layer(h, lw, kc, vc, n_past, inv_freq, st)
        return h, (kc, vc)

    x, (kv_k, kv_v) = jax.lax.scan(body, x, (params["layers"], kv_k, kv_v))

    x = layer_norm(x, params["output_norm"], params["output_norm_b"])
    if not logits_all:
        B, S, E = x.shape
        x = jax.lax.dynamic_slice(x, (0, jnp.asarray(last_pos, jnp.int32), 0), (B, 1, E))
    logits = linear(params["lm_head"], x, preferred_dtype=jnp.float32)
    return logits, kv_k, kv_v
