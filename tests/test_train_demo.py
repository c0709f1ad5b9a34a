"""Training demo (train-text-from-scratch analogue): loss decreases and the
resulting GGCC file loads and generates in the engine."""

import numpy as np

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.io.ggcc import read_model
from ggllm_tpu.io.loader import load_params
from ggllm_tpu.ops import sampling
from ggllm_tpu.tools import train_demo


def test_lbfgs_converges_least_squares():
    """L-BFGS path sanity (reference tests/test-opt.c analogue): optax.lbfgs
    through the same update pattern train_demo uses converges a synthetic
    least-squares problem to ~machine precision."""
    import jax
    import jax.numpy as jnp
    import optax

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((24, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(24), jnp.float32)

    def loss_fn(x):
        r = A @ x - b
        return jnp.mean(r * r)

    opt = optax.lbfgs()
    x = jnp.zeros(8, jnp.float32)
    state = opt.init(x)
    vg = optax.value_and_grad_from_state(loss_fn)

    @jax.jit
    def step(x, state):
        value, grad = vg(x, state=state)
        updates, state = opt.update(grad, state, x, value=value, grad=grad,
                                    value_fn=loss_fn)
        return optax.apply_updates(x, updates), state, value

    for _ in range(40):
        x, state, value = step(x, state)

    x_star, *_ = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)
    np.testing.assert_allclose(np.asarray(x), x_star, atol=1e-4)


def test_train_demo_lbfgs_reduces_loss():
    hp = FalconHParams(n_vocab=512, n_embd=32, n_head=2, n_head_kv=1,
                       n_layer=1, n_falcon_type=7, n_bpe_merges=0)
    text = b"abcabcabc" * 100
    params, losses = train_demo.train(text, hp, steps=12, seq_len=12,
                                      batch=4, log=lambda *a: None,
                                      optimizer="lbfgs")
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])


def test_training_reduces_loss_and_model_loads(tmp_path):
    hp = FalconHParams(n_vocab=512, n_embd=64, n_head=2, n_head_kv=1,
                       n_layer=1, n_falcon_type=7, n_bpe_merges=0)
    text = (b"abcabcabc" * 200)
    params, losses = train_demo.train(text, hp, steps=60, seq_len=24,
                                      batch=4, lr=1e-2, log=lambda *a: None)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    out = str(tmp_path / "trained.ggcc")
    train_demo.save_ggcc(out, hp, params)
    mf = read_model(out)
    cfg = EngineConfig(n_ctx=64, n_batch=16, kv_dtype="float32",
                       compute_dtype="float32")
    eng = FalconEngine(mf.hparams, load_params(mf, cfg), cfg)
    greedy = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)
    # byte ids are offset by 12 in the demo's byte tokenizer
    prompt = [c + 12 for c in b"abcab"]
    out_ids = eng.generate(prompt, n_predict=6, sampler=greedy)
    # the model must have learned the abc cycle
    text_out = bytes((t - 12) % 256 for t in out_ids)
    assert text_out == b"cabcab", text_out
