"""Independent numpy reference of the LLaMA forward pass.

No shared code with models/llama.py; mirrors llama_eval_internal
(llama.cpp:1368-1660): RMSNorm, classic rope (adjacent pairs), sequential
residuals, SwiGLU FFN.
"""

import numpy as np


def rms_norm(x, w, eps=1e-6):
    return x / np.sqrt((x**2).mean(-1, keepdims=True) + eps) * w


def silu(x):
    return x / (1.0 + np.exp(-x))


def rope_classic(x, positions, n_rot, freq_base=10000.0):
    # x: (S, H, D); rotate adjacent pairs of the first n_rot dims
    d2 = n_rot // 2
    freqs = freq_base ** (-2.0 * np.arange(d2) / n_rot)
    theta = positions[:, None] * freqs[None, :]  # (S, d2)
    cos = np.cos(theta)[:, None, :]
    sin = np.sin(theta)[:, None, :]
    out = x.copy()
    x0 = x[..., 0:n_rot:2]
    x1 = x[..., 1:n_rot:2]
    out[..., 0:n_rot:2] = x0 * cos - x1 * sin
    out[..., 1:n_rot:2] = x0 * sin + x1 * cos
    return out


def forward(weights, hp, tokens):
    """Full-sequence forward (n_past=0). tokens: (S,). Returns (S, V)."""
    E, H, D = hp.n_embd, hp.n_head, hp.head_dim
    S = len(tokens)
    x = weights["tok_embeddings.weight"][tokens].astype(np.float64)
    positions = np.arange(S)

    for i in range(hp.n_layer):
        p = f"layers.{i}"
        h = rms_norm(x, weights[f"{p}.attention_norm.weight"])
        q = (h @ weights[f"{p}.attention.wq.weight"].T).reshape(S, H, D)
        k = (h @ weights[f"{p}.attention.wk.weight"].T).reshape(S, H, D)
        v = (h @ weights[f"{p}.attention.wv.weight"].T).reshape(S, H, D)
        q = rope_classic(q, positions, hp.n_rot)
        k = rope_classic(k, positions, hp.n_rot)

        attn_out = np.zeros((S, H, D))
        mask = np.tril(np.ones((S, S), dtype=bool))
        for hh in range(H):
            scores = (q[:, hh] @ k[:, hh].T) / np.sqrt(D)
            scores = np.where(mask, scores, -np.inf)
            probs = np.exp(scores - scores.max(-1, keepdims=True))
            probs = probs / probs.sum(-1, keepdims=True)
            attn_out[:, hh] = probs @ v[:, hh]

        x = x + attn_out.reshape(S, H * D) @ weights[f"{p}.attention.wo.weight"].T

        h2 = rms_norm(x, weights[f"{p}.ffn_norm.weight"])
        gate = silu(h2 @ weights[f"{p}.feed_forward.w1.weight"].T)
        up = h2 @ weights[f"{p}.feed_forward.w3.weight"].T
        x = x + (gate * up) @ weights[f"{p}.feed_forward.w2.weight"].T

    x = rms_norm(x, weights["norm.weight"])
    return x @ weights["output.weight"].T
