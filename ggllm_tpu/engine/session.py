"""Session (prompt-cache) save/restore.

The capability analogue of llama_{load,save}_session_file + falcon state
serialization (libfalcon.cpp:4226-4601): persist the evaluated token list and
full KV-cache state, and on load reuse the longest matching prompt prefix
(falcon_main.cpp:412-510, 763-784). Storage is an npz with a version/hparams
guard (the reference's 'ggsn' blob is a raw memcpy of ggml tensors — bytes are
engine-specific there too, so only the *semantics* carry over).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

SESSION_MAGIC = "ggsn-tpu"
SESSION_VERSION = 1


def save(path: str, engine, tokens: list[int]) -> None:
    np.savez_compressed(
        path,
        magic=SESSION_MAGIC,
        version=SESSION_VERSION,
        n_embd=engine.hp.n_embd,
        n_layer=engine.hp.n_layer,
        n_head_kv=engine.hp.n_head_kv,
        n_ctx=engine.cfg.n_ctx,
        n_past=engine.n_past,
        tokens=np.asarray(tokens, dtype=np.int32),
        # int8 caches persist dequantized; try_load re-quantizes them
        # through kvcache.quantize_new
        kv=np.asarray(_dense_kv(engine)).astype(np.float32),
    )


def _dense_kv(engine):
    kv = engine.kv
    if isinstance(kv, tuple):
        data, scales = kv
        return np.asarray(data, dtype=np.float32) * np.asarray(scales)
    return np.asarray(kv)


def try_load(path: str, engine, prompt_ids: list[int]) -> list[int]:
    """Restore engine state from a session; returns the prompt suffix that
    still needs evaluation. On any mismatch returns prompt_ids unchanged."""
    if not path or not os.path.exists(path):
        return list(prompt_ids)
    try:
        z = np.load(path, allow_pickle=False)
        if str(z["magic"]) != SESSION_MAGIC or int(z["version"]) != SESSION_VERSION:
            return list(prompt_ids)
        if (
            int(z["n_embd"]) != engine.hp.n_embd
            or int(z["n_layer"]) != engine.hp.n_layer
            or int(z["n_head_kv"]) != engine.hp.n_head_kv
            or int(z["n_ctx"]) != engine.cfg.n_ctx
        ):
            return list(prompt_ids)
        saved = z["tokens"]
        n_past = int(z["n_past"])
        if "kv" not in z:
            return list(prompt_ids)
    except Exception:
        return list(prompt_ids)

    # longest common prefix, capped at n_past and len(prompt)-1 so at least
    # one token is re-evaluated (we need fresh logits)
    n = 0
    limit = min(len(prompt_ids) - 1, saved.size, n_past)
    while n < limit and prompt_ids[n] == int(saved[n]):
        n += 1
    if n == 0:
        return list(prompt_ids)

    if engine.kv_dtype == "int8":
        from ggllm_tpu.ops import kvcache

        # quantize_new reduces over the last (head_dim) axis only, so the
        # full stacked cache quantizes in one call
        engine.kv = kvcache.quantize_new(jnp.asarray(z["kv"]))
    else:
        engine.kv = jnp.asarray(z["kv"]).astype(engine.kv_dtype)
    engine.n_past = n
    return list(prompt_ids[n:])
