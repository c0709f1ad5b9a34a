"""Train a tiny Falcon from scratch (train-text-from-scratch analogue).

The reference carries a ggml autograd + Adam/L-BFGS stack used only by its
training examples (ggml.h:1338-1523, examples/train-text-from-scratch). On
TPU that capability is jax.grad + optax over the same model code: this tool
trains a byte-level tiny Falcon on a text file and writes a loadable GGCC
file.

  python -m ggllm_tpu.tools.train_demo -f input.txt -o out.ggcc \
      [--steps 200] [--n-embd 128] [--n-layer 2]
"""

from __future__ import annotations

import argparse
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.io.ggcc import GGCCWriter
from ggllm_tpu.models.falcon import FalconStatic, falcon_forward
from ggllm_tpu.ops.rope import rope_angles
from ggllm_tpu.utils.synthetic import make_tiny_vocab


def init_params(hp: FalconHParams, key) -> dict:
    E, H, KV, D, F, V, L = (hp.n_embd, hp.n_head, hp.n_head_kv, hp.head_dim,
                            hp.n_ff, hp.n_vocab, hp.n_layer)
    ks = jax.random.split(key, 8)

    def w(k, *shape):
        return jax.random.normal(k, shape, jnp.float32) / np.sqrt(shape[-1])

    layers = {
        "input_ln_w": jnp.ones((L, E)), "input_ln_b": jnp.zeros((L, E)),
        "wq": w(ks[0], L, H * D, E), "wk": w(ks[1], L, KV * D, E),
        "wv": w(ks[2], L, KV * D, E), "wo": w(ks[3], L, E, H * D),
        "ffn_up": w(ks[4], L, F, E), "ffn_down": w(ks[5], L, E, F),
    }
    return {
        "tok_embeddings": jax.random.normal(ks[6], (V, E)) * 0.02,
        "output_norm": jnp.ones(E), "output_norm_b": jnp.zeros(E),
        "lm_head": w(ks[7], V, E),
        "layers": layers,
    }


def train(text: bytes, hp: FalconHParams, steps: int, seq_len: int = 64,
          batch: int = 8, lr: float = 3e-3, seed: int = 0, log=print,
          optimizer: str = "adam"):
    """optimizer: "adam" (minibatch) or "lbfgs" (full-batch with line search,
    the reference's second optimizer — ggml.h:1417-1503 GGML_OPT_LBFGS)."""
    st = FalconStatic.from_hparams(hp)
    inv_freq = rope_angles(EngineConfig().rope, seq_len, hp.head_dim)
    data = np.frombuffer(text, dtype=np.uint8).astype(np.int32) + 12  # byte ids
    assert data.size > seq_len + 1, "need more training text"

    key = jax.random.PRNGKey(seed)
    params = init_params(hp, key)

    def loss_fn(params, tokens):
        B, S1 = tokens.shape
        inp, tgt = tokens[:, :-1], tokens[:, 1:]
        kv = jnp.zeros((hp.n_layer, 2, B, S1 - 1, hp.n_head_kv, hp.head_dim),
                       jnp.float32)
        logits, _ = falcon_forward(
            params, inp, kv, jnp.int32(0), inv_freq, st,
            logits_all=True, compute_dtype=jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
        return nll.mean()

    rng = np.random.default_rng(seed)

    def sample(b):
        starts = rng.integers(0, data.size - seq_len - 1, b)
        return jnp.asarray(np.stack([data[s : s + seq_len + 1] for s in starts]))

    losses = []
    if optimizer == "lbfgs":
        # L-BFGS is a deterministic full-batch method: fix ONE batch and run
        # the curvature/line-search loop on it (like the reference's
        # ggml_opt L-BFGS over a fixed dataset view, tests/test-opt.c)
        opt = optax.lbfgs()
        opt_state = opt.init(params)
        tokens = sample(batch)
        vg = optax.value_and_grad_from_state(loss_fn)

        @jax.jit
        def step(params, opt_state, tokens):
            loss, grads = vg(params, tokens, state=opt_state)
            updates, opt_state = opt.update(
                grads, opt_state, params, value=loss, grad=grads,
                value_fn=lambda p: loss_fn(p, tokens))
            return optax.apply_updates(params, updates), opt_state, loss

        for i in range(steps):
            params, opt_state, loss = step(params, opt_state, tokens)
            losses.append(float(loss))
            if i % max(1, steps // 10) == 0:
                log(f"step {i:5d}  loss {float(loss):.4f}")
        return params, losses

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, sample(batch))
        losses.append(float(loss))
        if i % max(1, steps // 10) == 0:
            log(f"step {i:5d}  loss {float(loss):.4f}")
    return params, losses


def save_ggcc(path: str, hp: FalconHParams, params: dict):
    vocab = make_tiny_vocab(hp.n_vocab)
    hp.n_bpe_merges = len(vocab.merges)
    writer = GGCCWriter(path, hp, vocab)
    p = jax.device_get(params)
    writer.write_array("transformer.word_embeddings.weight",
                       np.asarray(p["tok_embeddings"]), GGMLType.F32)
    writer.write_array("transformer.ln_f.weight", np.asarray(p["output_norm"]), GGMLType.F32)
    writer.write_array("transformer.ln_f.bias", np.asarray(p["output_norm_b"]), GGMLType.F32)
    writer.write_array("lm_head.weight", np.asarray(p["lm_head"]), GGMLType.F32)
    L = hp.n_layer
    lw = p["layers"]
    hd = hp.n_head * hp.head_dim
    for i in range(L):
        pre = f"transformer.h.{i}"
        writer.write_array(f"{pre}.input_layernorm.weight", np.asarray(lw["input_ln_w"][i]), GGMLType.F32)
        writer.write_array(f"{pre}.input_layernorm.bias", np.asarray(lw["input_ln_b"][i]), GGMLType.F32)
        qkv = np.concatenate([np.asarray(lw["wq"][i]), np.asarray(lw["wk"][i]),
                              np.asarray(lw["wv"][i])], axis=0)
        writer.write_array(f"{pre}.self_attention.query_key_value.weight", qkv, GGMLType.F32)
        writer.write_array(f"{pre}.self_attention.dense.weight", np.asarray(lw["wo"][i]), GGMLType.F32)
        writer.write_array(f"{pre}.mlp.dense_h_to_4h.weight", np.asarray(lw["ffn_up"][i]), GGMLType.F32)
        writer.write_array(f"{pre}.mlp.dense_4h_to_h.weight", np.asarray(lw["ffn_down"][i]), GGMLType.F32)
    writer.close()


def main(argv=None):
    ap = argparse.ArgumentParser(description="tiny-Falcon training demo")
    ap.add_argument("-f", "--file", required=True, help="training text")
    ap.add_argument("-o", "--out", required=True, help="output GGCC path")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--seq-len", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--optimizer", choices=("adam", "lbfgs"), default="adam",
                    help="adam (minibatch) or lbfgs (full-batch, line search)")
    ap.add_argument("--n-embd", type=int, default=128)
    ap.add_argument("--n-layer", type=int, default=2)
    ap.add_argument("--n-head", type=int, default=4)
    args = ap.parse_args(argv)

    hp = FalconHParams(n_vocab=512, n_embd=args.n_embd, n_head=args.n_head,
                       n_head_kv=1, n_layer=args.n_layer, n_falcon_type=7,
                       n_bpe_merges=0)
    with open(args.file, "rb") as f:
        text = f.read()
    params, losses = train(text, hp, args.steps, args.seq_len, args.batch,
                           args.lr, optimizer=args.optimizer)
    save_ggcc(args.out, hp, params)
    print(f"final loss {losses[-1]:.4f} (from {losses[0]:.4f}); wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
