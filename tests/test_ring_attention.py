"""Ring attention over a sequence-sharded mesh vs single-device attention."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ggllm_tpu.kernels.ring_attention import ring_attention
from ggllm_tpu.models.falcon import FalconStatic, _attention

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")


def _static(H, KV, D):
    return FalconStatic(n_layer=1, n_head=H, n_head_kv=KV, head_dim=D,
                        n_embd=H * D, n_ff=0, n_vocab=0, parallel_norms=False)


@pytest.mark.parametrize("H,KV,n_dev", [(8, 1, 4), (8, 2, 4), (4, 4, 2)])
def test_ring_matches_full_attention(H, KV, n_dev):
    B, S, D = 1, 64, 32  # S shards into n_dev blocks
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.float32)

    ref = np.asarray(_attention(q, k, v, jnp.int32(0), _static(H, KV, D)))

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("seq",))
    ring = jax.jit(jax.shard_map(
        lambda q, k, v: ring_attention(q, k, v, "seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
        check_vma=False,
    ))
    got = np.asarray(ring(q, k, v))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_ring_with_n_past_offset():
    # queries appended after an existing prefix: KV holds prefix + new,
    # queries are only the new tokens
    B, S_new, T, H, KV, D, n_dev = 1, 16, 64, 4, 1, 32, 4
    n_past = T - S_new
    rng = np.random.default_rng(1)
    q_new = jnp.asarray(rng.standard_normal((B, S_new, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, KV, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, KV, D)), jnp.float32)

    ref = np.asarray(_attention(q_new, k, v, jnp.int32(n_past), _static(H, KV, D)))

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("seq",))
    # q_new shards into n_dev blocks of 4; its device offset handling uses
    # n_past + idx*Sl, matching the global layout
    ring = jax.jit(jax.shard_map(
        lambda q, k, v: ring_attention(q, k, v, "seq", n_past=n_past),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
        check_vma=False,
    ))
    got = np.asarray(ring(q_new, k, v))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
