"""Flash attention kernel vs the einsum reference (interpret mode)."""

import numpy as np
import pytest
import jax.numpy as jnp

from ggllm_tpu.kernels.flash_attention import flash_mqa
from ggllm_tpu.models.falcon import FalconStatic, _attention


def _static(H, KV, D):
    return FalconStatic(n_layer=1, n_head=H, n_head_kv=KV, head_dim=D,
                        n_embd=H * D, n_ff=0, n_vocab=0, parallel_norms=False)


@pytest.mark.parametrize("H,KV", [(8, 1), (8, 2), (4, 4)])
@pytest.mark.parametrize("n_past", [0, 7])
def test_flash_matches_einsum(H, KV, n_past):
    B, S, T, D = 1, 32, 128, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.zeros((B, T, KV, D), jnp.float32)
    v = jnp.zeros((B, T, KV, D), jnp.float32)
    # fill valid prefix + current block positions
    fill = n_past + S + 4
    k = k.at[:, :fill].set(jnp.asarray(rng.standard_normal((B, fill, KV, D)), jnp.float32))
    v = v.at[:, :fill].set(jnp.asarray(rng.standard_normal((B, fill, KV, D)), jnp.float32))

    ref = np.asarray(_attention(q, k, v, jnp.int32(n_past), _static(H, KV, D)))
    got = np.asarray(flash_mqa(q, k, v, jnp.int32(n_past),
                               block_s=16, block_t=64, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_flash_per_row_n_past():
    B, S, T, H, KV, D = 3, 16, 96, 4, 1, 64
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, KV, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, KV, D)), jnp.float32)
    n_past = jnp.asarray([0, 5, 40], jnp.int32)

    ref = np.asarray(_attention(q, k, v, n_past, _static(H, KV, D)))
    got = np.asarray(flash_mqa(q, k, v, n_past, block_s=16, block_t=32,
                               interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_flash_bf16():
    B, S, T, H, KV, D = 1, 64, 256, 8, 1, 64
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, T, KV, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, T, KV, D)), jnp.bfloat16)
    ref = np.asarray(_attention(q, k, v, jnp.int32(3), _static(H, KV, D)),
                     dtype=np.float32)
    got = np.asarray(flash_mqa(q, k, v, jnp.int32(3), block_s=32, block_t=64,
                               interpret=True), dtype=np.float32)
    np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)


def test_flash_ragged_tiles():
    # S and T not multiples of the block sizes
    B, S, T, H, KV, D = 1, 24, 80, 2, 1, 64
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, KV, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, KV, D)), jnp.float32)
    ref = np.asarray(_attention(q, k, v, jnp.int32(2), _static(H, KV, D)))
    got = np.asarray(flash_mqa(q, k, v, jnp.int32(2), block_s=16, block_t=32,
                               interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
