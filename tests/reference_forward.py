"""Independent numpy reference of the Falcon forward pass.

Deliberately written as straightforward per-layer numpy (no shared code with
the JAX model) so tests catch layout/transpose/broadcast mistakes in
models/falcon.py. Mirrors falcon_eval_internal (libfalcon.cpp:2011-2443).
"""

import numpy as np


def layer_norm(x, w, b, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * w + b


def gelu_tanh(x):
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def rope_neox(x, positions, head_dim, alpha, freq_base=10000.0):
    # x: (S, H, D)
    d2 = head_dim // 2
    theta_scale = (alpha * freq_base) ** (-2.0 / head_dim)
    freqs = theta_scale ** np.arange(d2)  # (d2,)
    theta = positions[:, None] * freqs[None, :]  # (S, d2)
    cos = np.cos(theta)[:, None, :]
    sin = np.sin(theta)[:, None, :]
    x0, x1 = x[..., :d2], x[..., d2:]
    return np.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)


def forward(weights, hp, tokens, alpha=1.0):
    """Full-sequence forward (n_past=0). tokens: (S,). Returns (S, V) logits."""
    E, H, KV, D = hp.n_embd, hp.n_head, hp.n_head_kv, hp.head_dim
    S = len(tokens)
    x = weights["transformer.word_embeddings.weight"][tokens].astype(np.float64)
    positions = np.arange(S)

    for i in range(hp.n_layer):
        p = f"transformer.h.{i}"
        if hp.n_falcon_type >= 40:
            ln_mlp = layer_norm(x, weights[f"{p}.ln_mlp.weight"], weights[f"{p}.ln_mlp.bias"])
            ln_attn = layer_norm(x, weights[f"{p}.ln_attn.weight"], weights[f"{p}.ln_attn.bias"])
        else:
            ln_mlp = layer_norm(
                x,
                weights[f"{p}.input_layernorm.weight"],
                weights[f"{p}.input_layernorm.bias"],
            )
            ln_attn = ln_mlp

        qkv = ln_attn @ weights[f"{p}.self_attention.query_key_value.weight"].T  # (S, (H+2KV)D)
        q = qkv[:, : H * D].reshape(S, H, D)
        k = qkv[:, H * D : (H + KV) * D].reshape(S, KV, D)
        v = qkv[:, (H + KV) * D :].reshape(S, KV, D)

        q = rope_neox(q, positions, D, alpha)
        k = rope_neox(k, positions, D, alpha)

        group = H // KV
        attn_out = np.zeros((S, H, D))
        for h in range(H):
            kvh = h // group
            scores = (q[:, h] @ k[:, kvh].T) / np.sqrt(D)  # (S, S)
            mask = np.tril(np.ones((S, S), dtype=bool))
            scores = np.where(mask, scores, -np.inf)
            probs = np.exp(scores - scores.max(-1, keepdims=True))
            probs = probs / probs.sum(-1, keepdims=True)
            attn_out[:, h] = probs @ v[:, kvh]

        attn = attn_out.reshape(S, H * D) @ weights[f"{p}.self_attention.dense.weight"].T
        ff = gelu_tanh(ln_mlp @ weights[f"{p}.mlp.dense_h_to_4h.weight"].T)
        ff = ff @ weights[f"{p}.mlp.dense_4h_to_h.weight"].T
        x = x + attn + ff

    x = layer_norm(x, weights["transformer.ln_f.weight"], weights["transformer.ln_f.bias"])
    return x @ weights["lm_head.weight"].T
