"""Flash-decode kernel (kernels/flash_decode) vs the einsum reference
(models/falcon._attention) — interpret mode, all head geometries and
deferred-append variants the decode loops use."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ggllm_tpu.kernels import flash_decode as fd_mod  # noqa: E402
from ggllm_tpu.models.falcon import FalconStatic, _attention  # noqa: E402


def flash_decode(kv5, layer, q, n_past, **kw):
    """Test adapter: merge the 6D cache the way the engine's hoisted
    merged_cache_view does, then call the kernel."""
    L, _, B, T, KV, D = kv5.shape
    return fd_mod.flash_decode(kv5.reshape(L, 2, B, T, KV * D), KV, layer,
                               q, n_past, **kw)


def _mk(B, T, KV, H, D, L=3, seed=0):
    rng = np.random.default_rng(seed)
    kv5 = rng.standard_normal((L, 2, B, T, KV, D)).astype(np.float32)
    q = rng.standard_normal((B, 1, H, D)).astype(np.float32)
    return jnp.asarray(kv5), jnp.asarray(q)


def _st(H, KV):
    return FalconStatic(
        n_layer=3, n_head=H, n_head_kv=KV, head_dim=8, n_embd=H * 8,
        n_ff=32, n_vocab=32, parallel_norms=False)


CASES = [
    ("mqa", 1, 5),     # Falcon-7B shape: 1 KV head, odd H
    ("gqa", 2, 6),     # Falcon-40B shape
    ("mha", 4, 4),     # LLaMA shape: KV == H
]


@pytest.mark.parametrize("name,KV,H", CASES)
def test_no_append_matches_einsum(name, KV, H):
    B, T, D, l = 2, 64, 8, 1
    kv5, q = _mk(B, T, KV, H, D)
    n_past = jnp.asarray([13, 0], jnp.int32)  # row 1: only its own token
    # reference: current token already written at position n_past
    st = _st(H, KV)
    k, v = kv5[l, 0], kv5[l, 1]
    ref = _attention(q, k, v, n_past, st)
    got = flash_decode(kv5, l, q, n_past, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("name,KV,H", CASES)
def test_defer_append_matches_einsum(name, KV, H):
    B, T, D, l = 2, 64, 8, 2
    kv5, q = _mk(B, T, KV, H, D, seed=1)
    rng = np.random.default_rng(2)
    kv_append = jnp.asarray(
        rng.standard_normal((2, B, 1, KV, D)).astype(np.float32))
    n_past = jnp.asarray([50, 7], jnp.int32)
    st = _st(H, KV)
    k, v = kv5[l, 0], kv5[l, 1]
    ref = _attention(q, k, v, n_past, st, kv_append=kv_append)
    got = flash_decode(kv5, l, q, n_past, kv_append=kv_append, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("name,KV,H", CASES)
def test_chunked_append_matches_einsum(name, KV, H):
    """[current; pending] block with append_valid entries real; cache valid
    strictly below the chunk start."""
    B, T, D, l, A = 2, 64, 8, 0, 9
    kv5, q = _mk(B, T, KV, H, D, seed=3)
    rng = np.random.default_rng(4)
    kv_append = jnp.asarray(
        rng.standard_normal((2, B, A, KV, D)).astype(np.float32))
    n_past = jnp.asarray([33, 4], jnp.int32)
    append_valid = jnp.int32(5)
    st = _st(H, KV)
    k, v = kv5[l, 0], kv5[l, 1]
    ref = _attention(q, k, v, n_past, st, kv_append=kv_append,
                     append_valid=append_valid)
    got = flash_decode(kv5, l, q, n_past, kv_append=kv_append,
                       append_valid=append_valid, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_empty_cache_with_append():
    """cache_valid = 0 rows: the whole answer comes from the append block."""
    B, T, KV, H, D, l = 1, 32, 1, 3, 8, 0
    kv5, q = _mk(B, T, KV, H, D, seed=5)
    rng = np.random.default_rng(6)
    kv_append = jnp.asarray(
        rng.standard_normal((2, B, 4, KV, D)).astype(np.float32))
    n_past = jnp.asarray([2], jnp.int32)
    append_valid = jnp.int32(3)  # cache valid below 2 - (3-1) = 0
    st = _st(H, KV)
    ref = _attention(q, kv5[l, 0], kv5[l, 1], n_past, st,
                     kv_append=kv_append, append_valid=append_valid)
    got = flash_decode(kv5, l, q, n_past, kv_append=kv_append,
                       append_valid=append_valid, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("KV,D", [(2, 64), (16, 8)])
def test_mha_single_dot_variant(KV, D):
    """G == 1 with (KV*D) % 128 == 0 routes to the block-diagonal all-heads
    kernel (_cache_partials_mha) — LLaMA's decode shape."""
    B, T, H, l = 2, 96, KV, 1
    rng = np.random.default_rng(11)
    kv5 = jnp.asarray(rng.standard_normal((3, 2, B, T, KV, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)).astype(np.float32))
    app = jnp.asarray(rng.standard_normal((2, B, 5, KV, D)).astype(np.float32))
    n_past = jnp.asarray([70, 9], jnp.int32)
    st = FalconStatic(n_layer=3, n_head=H, n_head_kv=KV, head_dim=D,
                      n_embd=H * D, n_ff=32, n_vocab=32, parallel_norms=False)
    ref = _attention(q, kv5[l, 0], kv5[l, 1], n_past, st, kv_append=app,
                     append_valid=jnp.int32(4))
    got = flash_decode(kv5, l, q, n_past, kv_append=app,
                       append_valid=jnp.int32(4), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # confirm the routing actually takes the MHA kernel for this geometry
    acc, m, lden = fd_mod.cache_partials(
        kv5.reshape(3, 2, B, T, KV * D), KV, l, q.reshape(B, KV, 1, D),
        jnp.asarray([70, 9], jnp.int32), interpret=True)
    assert acc.shape == (B, KV, 1, D)


@pytest.mark.parametrize("KV,H,D", [(1, 5, 8), (2, 6, 8), (2, 2, 64), (4, 4, 8)])
def test_int8_cache_matches_dequantized_einsum(KV, H, D):
    """int8 (codes, scales) caches: the kernel dequantizes on the fly; must
    equal the einsum reference on the exactly-dequantized cache. Covers the
    per-head path, HB>1, and the MHA block-diagonal variant (KV=2, D=64)."""
    from ggllm_tpu.models.falcon import merged_cache_view
    from ggllm_tpu.ops import kvcache

    B, T, L, l = 2, 96, 2, 1
    rng = np.random.default_rng(21)
    dense = rng.standard_normal((L, 2, B, T, KV, D)).astype(np.float32)
    q_, scl = kvcache.quantize_new(jnp.asarray(dense.reshape(2 * L, B, T, KV, D)))
    codes = jnp.asarray(q_).reshape(L, 2, B, T, KV, D)
    scales = jnp.asarray(scl).reshape(L, 2, B, T, KV, 1)
    deq = (codes.astype(jnp.float32) * scales)  # exact dequant, f32

    st = FalconStatic(n_layer=L, n_head=H, n_head_kv=KV, head_dim=D,
                      n_embd=H * D, n_ff=32, n_vocab=32, parallel_norms=False,
                      flash=True)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)).astype(np.float32))
    app = jnp.asarray(rng.standard_normal((2, B, 5, KV, D)).astype(np.float32))
    n_past = jnp.asarray([60, 9], jnp.int32)
    ref = _attention(q, deq[l, 0], deq[l, 1], n_past, st, kv_append=app,
                     append_valid=jnp.int32(3))

    merged = merged_cache_view((codes, scales), st)
    assert isinstance(merged, tuple)
    got = fd_mod.flash_decode(merged, KV, l, q, n_past, kv_append=app,
                              append_valid=jnp.int32(3), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_bf16_cache_small_blocks():
    """bf16 cache with a block smaller than T exercises multi-tile online
    softmax and the tile-aliasing index map."""
    B, T, KV, H, D, l = 3, 96, 2, 4, 8, 1
    rng = np.random.default_rng(7)
    kv5 = jnp.asarray(rng.standard_normal((2, 2, B, T, KV, D))).astype(jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)).astype(np.float32))
    n_past = jnp.asarray([90, 17, 33], jnp.int32)
    st = _st(H, KV)
    ref = _attention(q, kv5[l, 0].astype(q.dtype), kv5[l, 1].astype(q.dtype),
                     n_past, st)
    got = flash_decode(kv5, l, q, n_past, block_t=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
