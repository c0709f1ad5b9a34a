"""Gradient check (test-grad0.c analogue): jax.grad of the model loss vs
central finite differences on a tiny Falcon."""

import numpy as np
import jax
import jax.numpy as jnp

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.models.falcon import FalconStatic, falcon_forward
from ggllm_tpu.ops.rope import rope_angles
from ggllm_tpu.tools.train_demo import init_params


def test_grad_matches_finite_difference():
    hp = FalconHParams(n_vocab=64, n_embd=32, n_head=2, n_head_kv=1,
                       n_layer=1, n_falcon_type=7, n_bpe_merges=0)
    st = FalconStatic.from_hparams(hp)
    S = 6
    inv_freq = rope_angles(EngineConfig().rope, S, hp.head_dim)
    params = init_params(hp, jax.random.PRNGKey(0))
    tokens = jnp.asarray([[3, 9, 17, 33, 2, 60]], jnp.int32)
    tgt = jnp.asarray([[9, 17, 33, 2, 60, 5]], jnp.int32)

    def loss_fn(params):
        kv = jnp.zeros((hp.n_layer, 2, 1, S, 1, hp.head_dim), jnp.float32)
        logits, _ = falcon_forward(params, tokens, kv, jnp.int32(0), inv_freq,
                                   st, logits_all=True, compute_dtype=jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, tgt[..., None], axis=-1).mean()

    grads = jax.grad(loss_fn)(params)

    # spot-check a few coordinates per weight with central differences
    rng = np.random.default_rng(0)
    eps = 1e-3
    for path, leaf in [("lm_head", params["lm_head"]),
                       ("layers/wq", params["layers"]["wq"]),
                       ("layers/ffn_down", params["layers"]["ffn_down"]),
                       ("tok_embeddings", params["tok_embeddings"])]:
        g = {"lm_head": grads["lm_head"], "layers/wq": grads["layers"]["wq"],
             "layers/ffn_down": grads["layers"]["ffn_down"],
             "tok_embeddings": grads["tok_embeddings"]}[path]
        flat = np.asarray(leaf).reshape(-1)
        gflat = np.asarray(g).reshape(-1)
        # pick coordinates with non-negligible gradient
        order = np.argsort(-np.abs(gflat))
        for idx in order[[0, 3, 7]]:
            delta = np.zeros_like(flat)
            delta[idx] = eps

            def patched(v):
                arr = jnp.asarray((flat + v * delta).reshape(leaf.shape))
                p2 = jax.tree.map(lambda x: x, params)
                if "/" in path:
                    p2 = dict(params)
                    p2["layers"] = dict(params["layers"])
                    p2["layers"][path.split("/")[1]] = arr
                else:
                    p2 = dict(params)
                    p2[path] = arr
                return float(loss_fn(p2))

            fd = (patched(1.0) - patched(-1.0)) / (2 * eps)
            np.testing.assert_allclose(gflat[idx], fd, rtol=2e-2, atol=1e-5,
                                       err_msg=f"{path}[{idx}]")
