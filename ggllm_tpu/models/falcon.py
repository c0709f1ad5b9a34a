"""Falcon (7B/40B/180B) forward pass, TPU-native.

Re-implements the computation of falcon_eval_internal (libfalcon.cpp:2011-2588)
as a functional JAX program:

* NeoX RoPE with dynamic NTK scaling on Q and K (libfalcon.cpp:2229-2234);
* multi-query / grouped-query attention: n_head query heads share n_head_kv
  KV heads via broadcast (the reference's repeat2-vs-broadcast path,
  libfalcon.cpp:2285-2356);
* parallel attention + FFN residual: ``x = x + attn(ln_a(x)) + mlp(ln_m(x))``
  (libfalcon.cpp:2399-2403). Falcon-7B has ONE input layernorm feeding both;
  40B/180B have separate ln_attn / ln_mlp (libfalcon.cpp:2177-2188);
* GELU FFN (4x expansion), final layernorm, lm_head.

Layer weights are stacked on a leading axis and the layer loop is a single
lax.scan — one compiled layer body, static shapes, KV cache updated
functionally in the scan carry (donated by the engine).

Two parameter layouts are supported (the loader picks per backend):

* **merged** (single-chip fused-kernel path): the file's fused QKV stays one
  matrix; on 7B (shared input layernorm) FFN-up is merged in as extra output
  rows ("wqkvu"), and wo / FFN-down merge along the contraction dim ("w_od",
  fed concat([attn, gelu(ff)])). One matmul launch instead of 3-4 per block
  halves the kernel count per layer — decode on this hardware is launch-bound,
  not FLOP-bound. RoPE runs once over the contiguous [Q; K] head block, and
  K/V append to a single (L, 2, B, T, KV, D) cache with one update.
* **split** (tensor-parallel path): wq/wk/wv/wo/ffn_up/ffn_down as separate
  (possibly sharded) matrices — Megatron TP needs the output-dim split that
  a fused matrix cannot express (parallel/sharding.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.ops import kvcache
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
    flash: bool = False  # Pallas flash attention (TPU single-chip path)

    @classmethod
    def from_hparams(cls, hp: FalconHParams, flash: bool = False) -> "FalconStatic":
        return cls(
            n_layer=hp.n_layer,
            n_head=hp.n_head,
            n_head_kv=hp.n_head_kv,
            head_dim=hp.head_dim,
            n_embd=hp.n_embd,
            n_ff=hp.n_ff,
            n_vocab=hp.n_vocab,
            parallel_norms=hp.n_falcon_type >= 40,
            flash=flash,
        )


def layer_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + NORM_EPS)
    return (y * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _positions(n_past, B: int, S: int) -> jnp.ndarray:
    """Per-row query positions (B, S). n_past: scalar or (B,) int32."""
    np_vec = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32).reshape(-1), (B,))
    return np_vec[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]


def _attention(
    q: jnp.ndarray,  # (B, S, H, D)
    k: jnp.ndarray,  # (B, T, KV, D) — full cache
    v: jnp.ndarray,  # (B, T, KV, D)
    n_past: jnp.ndarray,  # scalar or (B,) int32
    st: FalconStatic,
    kv_append: jnp.ndarray | None = None,  # (2, B, A, KV, D) unwritten block
    append_valid: jnp.ndarray | None = None,  # scalar: valid append entries
) -> jnp.ndarray:
    """Causal MQA/GQA attention over a prefix-valid KV cache. f32 softmax.

    kv_append: the current block's K/V NOT yet written to the cache
    (deferred-write decode path) — appended after the cache along T, with
    the cache masked STRICTLY before n_past (its entries at >= n_past may be
    stale) and the appended block causal within itself.

    append_valid (chunk-deferred decode, S == 1): kv_append is [current
    token; chunk pending buffer] of which the first `append_valid` entries
    are real (the current token plus append_valid-1 earlier in-chunk
    positions); the cache is then valid strictly below
    n_past - (append_valid - 1) (= the chunk-start position)."""
    B, S, H, D = q.shape
    T = k.shape[1]
    G = H // st.n_head_kv  # query heads per kv head

    if getattr(st, "flash", False) and S > 1 and kv_append is None:
        # prefill on TPU: flash kernel streams K/V tiles instead of
        # materializing (B, KV, G, S, T) scores in HBM; interpret mode off-TPU
        # so CPU mesh tests exercise the same path
        from ggllm_tpu.kernels.dispatch import _on_tpu
        from ggllm_tpu.kernels.flash_attention import flash_mqa

        return flash_mqa(q, k, v, n_past, interpret=not _on_tpu())

    q_pos = _positions(n_past, B, S)  # (B, S)
    t_pos = jnp.arange(T, dtype=jnp.int32)  # (T,)
    if kv_append is not None:
        A = kv_append.shape[2]
        k = jnp.concatenate([k, kv_append[0].astype(k.dtype)], axis=1)
        v = jnp.concatenate([v, kv_append[1].astype(v.dtype)], axis=1)
        np_vec = jnp.broadcast_to(
            jnp.asarray(n_past, jnp.int32).reshape(-1), (B,))
        if append_valid is not None:
            # chunk-deferred decode: cache valid strictly below chunk start
            cache_start = np_vec - (append_valid - 1)
            cache_mask = jnp.broadcast_to(
                t_pos[None, None, :] < cache_start[:, None, None], (B, S, T))
            app_mask = jnp.broadcast_to(
                jnp.arange(A, dtype=jnp.int32)[None, None, :] < append_valid,
                (B, S, A))
        else:
            cache_mask = jnp.broadcast_to(
                t_pos[None, None, :] < np_vec[:, None, None], (B, S, T))
            j = jnp.arange(S, dtype=jnp.int32)
            app_mask = jnp.broadcast_to(
                j[None, None, :] <= j[None, :, None], (B, S, S))
        mask = jnp.concatenate([cache_mask, app_mask], axis=-1)
    else:
        # key position t visible to query i iff t <= n_past + i
        mask = t_pos[None, None, :] <= q_pos[:, :, None]  # (B, S, T)

    qg = q.reshape(B, S, st.n_head_kv, G, D).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    # scores: (B, KV, G, S, T); f32 operands need HIGHEST for exact-mode parity
    scores = jnp.einsum(
        "bskgd,btkd->bkgst", qg, kf, precision=jax.lax.Precision.HIGHEST
    ) * (1.0 / jnp.sqrt(D).astype(jnp.float32))
    scores = jnp.where(mask[:, None, None], scores, -jnp.inf)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgst,btkd->bskgd", probs, vf, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(B, S, H, D).astype(q.dtype)


def _attention_decode(kv, l: int, q, n_past, st, kv_append=None,
                      append_valid=None, kv_merged=None):
    """S=1 attention for the unrolled decode loops: the Pallas flash-decode
    kernel reads only the valid cache prefix from the STACKED cache (no
    per-layer slice, no full-buffer f32 conversion — kernels/flash_decode);
    einsum fallback for int8 caches and non-flash engines.

    kv_merged: the cache as (L, 2, B, T, KV*D), reshaped ONCE per chunk by
    the caller (merged_cache_view) — XLA materializes the 6D->5D relayout
    (the whole cache; 4 ms per occurrence at LLaMA geometry), so the flash
    path requires the hoisted view instead of reshaping per layer-step."""
    if kv_merged is None:
        k, v = kvcache.read_layer(kv, l, q.dtype)
        return _attention(q, k, v, n_past, st, kv_append=kv_append,
                          append_valid=append_valid)
    from ggllm_tpu.kernels.dispatch import _on_tpu
    from ggllm_tpu.kernels.flash_decode import flash_decode

    return flash_decode(kv_merged, st.n_head_kv, l, q, n_past,
                        kv_append=kv_append, append_valid=append_valid,
                        interpret=not _on_tpu())


def merged_cache_view(kv, st):
    """Flash-decode cache operand, hoisted OUTSIDE the decode scan so the
    relayouts are paid once per chunk, not once per layer-step.

    Dense cache -> the (L, 2, B, T, KV*D) merged view. int8 cache (codes,
    scales) -> (codes merged, scales transposed to (L, 2, B, KV, T)) — the
    kernel dequantizes on the fly, which is what makes int8 KV + flash
    decode compose for long contexts. None = einsum fallback."""
    from ggllm_tpu.kernels.flash_decode import supported

    if not getattr(st, "flash", False):
        return None
    if not supported(st.n_head_kv, st.head_dim):
        return None
    if isinstance(kv, tuple):
        data, scales = kv
        L, _, B, T, KV, D = data.shape
        return (data.reshape(L, 2, B, T, KV * D),
                jnp.moveaxis(scales[..., 0], 3, 4).astype(jnp.float32))
    L, _, B, T, KV, D = kv.shape
    return kv.reshape(L, 2, B, T, KV * D)


def _project_merged(x_ln: jnp.ndarray, lw: dict, st: FalconStatic):
    """Merged wqkvu path -> (qkv (B,S,(H+2KV)*D), ff (B,S,F))."""
    n_qkv = (st.n_head + 2 * st.n_head_kv) * st.head_dim
    if "wqkvu" in lw:
        proj = linear(lw["wqkvu"], x_ln)
        return proj[..., :n_qkv], proj[..., n_qkv:]
    return None, None


def _layer_pre(x, lw, n_past, inv_freq, st: FalconStatic):
    """Everything before the KV-cache write: norms, projections, RoPE.

    Returns (q (B,S,H,D), kv_new (2,B,S,KV,D) pre-cast, gelu'd ff)."""
    B, S, E = x.shape
    H, KV, D = st.n_head, st.n_head_kv, st.head_dim

    ln_mlp = layer_norm(x, lw["input_ln_w"], lw["input_ln_b"])
    if st.parallel_norms:
        ln_attn = layer_norm(x, lw["attn_ln_w"], lw["attn_ln_b"])
    else:
        ln_attn = ln_mlp

    if "wqkvu" in lw:  # 7B merged: one launch for QKV + FFN-up
        qkv, ff = _project_merged(ln_attn, lw, st)
        qkv = qkv.reshape(B, S, H + 2 * KV, D)
    elif "wqkv" in lw:  # 40B merged: fused QKV, separate up (different norm)
        qkv = linear(lw["wqkv"], ln_attn).reshape(B, S, H + 2 * KV, D)
        ff = linear(lw["ffn_up"], ln_mlp)
    else:  # split (TP) layout
        q_ = linear(lw["wq"], ln_attn).reshape(B, S, H, D)
        k_ = linear(lw["wk"], ln_attn).reshape(B, S, KV, D)
        v_ = linear(lw["wv"], ln_attn).reshape(B, S, KV, D)
        qkv = jnp.concatenate([q_, k_, v_], axis=2)
        ff = linear(lw["ffn_up"], ln_mlp)

    # RoPE over the contiguous [Q; K] head block, V untouched
    positions = _positions(n_past, B, S)  # (B, S)
    qk = apply_rope(qkv[:, :, : H + KV], positions, inv_freq)
    q = qk[:, :, :H]
    kv_new = jnp.concatenate(
        [qk[:, :, H:][None], qkv[:, :, H + KV :][None]], axis=0
    )  # (2, B, S, KV, D)
    gf = jax.nn.gelu(ff.astype(jnp.float32), approximate=True).astype(ff.dtype)
    return q, kv_new, gf


def _layer_post(x, lw, attn, gf, st: FalconStatic, psum_axis: str | None = None):
    """Output projection + parallel residual. Under tensor parallelism the
    w_od contraction is device-sharded and `psum_axis` reduces the partial
    outputs — the layer's single collective."""
    B, S, E = x.shape
    if "w_od" in lw:  # merged wo+down along K: one launch, fed [attn; gelu]
        act = jnp.concatenate([attn.reshape(B, S, st.n_head * st.head_dim), gf],
                              axis=-1)
        out = linear(lw["w_od"], act)
    else:
        out = linear(lw["wo"], attn.reshape(B, S, st.n_head * st.head_dim)) \
            + linear(lw["ffn_down"], gf)
    if psum_axis is not None:
        out = jax.lax.psum(out, psum_axis)
    return x + out


def falcon_layer(
    x: jnp.ndarray,  # (B, S, E)
    lw: dict[str, Any],  # per-layer weights (leading L axis removed by scan)
    kv_cache: jnp.ndarray,  # (2, B, T, KV, D)
    n_past: jnp.ndarray,
    inv_freq: jnp.ndarray,
    st: FalconStatic,
):
    q, kv_new, gf = _layer_pre(x, lw, n_past, inv_freq, st)
    kv_cache = kvcache.write(kv_cache, kv_new, n_past)
    k, v = kvcache.read(kv_cache, q.dtype)
    attn = _attention(q, k, v, n_past, st)
    return _layer_post(x, lw, attn, gf, st), kv_cache


def falcon_forward(
    params: dict[str, Any],
    tokens: jnp.ndarray,  # (B, S) int32
    kv: jnp.ndarray,  # (L, 2, B, T, KV, D)
    n_past: jnp.ndarray,  # scalar int32
    inv_freq: jnp.ndarray,  # (D/2,) f32
    st: FalconStatic,
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
    """Run the full model. Returns (logits f32, new kv).

    kv_merged: hoisted (L, 2, B, T, KV*D) view of the cache for the
    flash-decode kernel (see merged_cache_view); when None the decode
    attention falls back to the einsum path.

    pending/n_pend (chunk-deferred decode, S == 1): `pending` is the decode
    chunk's K/V buffer (L, 2, B, P, KV, D) of which the first `n_pend`
    entries hold the chunk's earlier positions — NOT yet scattered into the
    cache. Attention reads cache (valid strictly below n_past - n_pend) +
    pending + the current token, and the return value is (logits, kv_new
    (L, 2, B, 1, KV, D)) for the CALLER to accumulate — the cache itself is
    untouched. One scatter at chunk end replaces one per step: the scatter's
    layout round-trip copies the whole cache twice, which at B=8 was 1.75 ms
    of an 11.7 ms step.

    logits_all=False returns logits for position `last_pos` only (decode /
    padded-prefill path); True returns (B, S, V) (perplexity path).

    unroll=True replaces the layer scan with a python loop: static slices of
    the stacked layer weights are buffer offsets (no copy), where the scan's
    dynamic slices materialize every plane each step — measurably dominant
    in the decode profile. Use for the decode loop; keep the scan for
    prefill/perplexity where compile time matters more.
    """
    x = jnp.take(params["tok_embeddings"], tokens, axis=0).astype(compute_dtype)

    layers = params["layers"]
    n_past_arr = jnp.asarray(n_past, jnp.int32)
    if isinstance(layers, (list, tuple)) or unroll:
        # Unrolled layer loop. The kernel path keeps layers UNSTACKED (a list
        # of per-layer weight dicts): each Pallas call reads its layer's
        # buffers directly. A scan over stacked planes would dynamic-slice
        # (i.e. copy) every weight every step — decode is HBM-bound, and that
        # copy doubles the bytes touched per token.
        #
        # Per-row n_past decode (continuous batching): per-layer scatters
        # into the stacked cache materialize XLA copies that dominated the
        # batched decode profile. DEFER the writes: attention reads the cache
        # (masked strictly before n_past) plus the current block appended,
        # and all layers' K/V land in ONE scatter at the end. Decode only —
        # a deferred prefill block would re-materialize (S, T) score tiles
        # that the flash kernel exists to avoid.
        defer = n_past_arr.ndim > 0 and tokens.shape[1] == 1
        chunked = pending is not None
        deferred = []
        for l in range(st.n_layer):
            lw = layers[l] if isinstance(layers, (list, tuple)) else \
                jax.tree.map(lambda a, _l=l: a[_l], layers)
            q, kv_new, gf = _layer_pre(x, lw, n_past, inv_freq, st)
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
            x = _layer_post(x, lw, attn, gf, st, psum_axis)
        if chunked:
            kv = jnp.stack(deferred)  # returned for the caller to accumulate
        elif defer:
            kv = kvcache.write_all_layers(kv, jnp.stack(deferred), n_past_arr)
    else:
        assert psum_axis is None, "TP runs the unrolled (list) layer path"

        def body(carry, xs):
            h = carry
            lw, kvc = xs
            h, kvc = falcon_layer(h, lw, kvc, n_past, inv_freq, st)
            return h, kvc

        x, kv = jax.lax.scan(body, x, (params["layers"], kv))

    x = layer_norm(x, params["output_norm"], params["output_norm_b"])
    if not logits_all:
        x = select_last(x, last_pos)
    if output_hidden:
        # embedding path (reference examples/embedding: final normed hidden)
        return x.astype(jnp.float32), kv
    logits = linear(params["lm_head"], x, preferred_dtype=jnp.float32)
    return logits, kv


def select_last(x: jnp.ndarray, last_pos) -> jnp.ndarray:
    """(B, S, E) -> (B, 1, E) at per-row (or shared scalar) position."""
    B, S, E = x.shape
    lp = jnp.asarray(last_pos, jnp.int32)
    if lp.ndim == 0:
        return jax.lax.dynamic_slice(x, (0, lp, 0), (B, 1, E))
    return jnp.take_along_axis(x, lp[:, None, None], axis=1)
