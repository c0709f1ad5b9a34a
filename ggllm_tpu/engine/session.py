"""Session (prompt-cache) save/restore.

The capability analogue of llama_{load,save}_session_file + falcon state
serialization (libfalcon.cpp:4226-4601): persist the evaluated token list,
the KV-cache state, the sampler rng (host numpy Generator + device PRNG key
+ mirostat mu) and the last logits, and on load reuse the longest matching
prompt prefix (falcon_main.cpp:412-510, 763-784). With rng state restored, a
sampled continuation reproduces exactly across save/load — the reference's
falcon_copy_state_data contract (rng + logits + kv, libfalcon.cpp:4226-4477).

Storage is an npz with a version/hparams guard. The KV cache persists in its
NATIVE dtype (int8 codes+scales stay int8; bf16 stays 2 bytes/elt) and only
the first n_past positions are written — a 7B MQA session is ~128 KB per 1k
tokens instead of a dense-f32 full-T dump.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp

SESSION_MAGIC = "ggsn-tpu"
SESSION_VERSION = 2


def _np_view(a: np.ndarray) -> tuple[np.ndarray, str]:
    """bfloat16 (ml_dtypes) has no stable npz representation; store raw."""
    if a.dtype == jnp.bfloat16:
        return a.view(np.uint16), "bfloat16"
    return a, str(a.dtype)


def save(path: str, engine, tokens: list[int], sampler_state=None,
         rng_key=None, logits=None) -> None:
    n_past = engine.n_past
    arrays = dict(
        magic=SESSION_MAGIC,
        version=SESSION_VERSION,
        n_embd=engine.hp.n_embd,
        n_layer=engine.hp.n_layer,
        n_head_kv=engine.hp.n_head_kv,
        n_ctx=engine.cfg.n_ctx,
        batch=engine.batch,
        n_past=n_past,
        tokens=np.asarray(tokens, dtype=np.int32),
    )
    kv = engine.kv
    if isinstance(kv, tuple):  # int8 cache: codes + per-vector scales, as-is
        arrays["kv_q"] = np.asarray(kv[0][:, :, :, :n_past])
        arrays["kv_s"] = np.asarray(kv[1][:, :, :, :n_past])
        arrays["kv_dtype"] = "int8"
    else:
        a, dt = _np_view(np.asarray(kv[:, :, :, :n_past]))
        arrays["kv"] = a
        arrays["kv_dtype"] = dt
    if sampler_state is not None:
        arrays["rng_state"] = json.dumps(sampler_state.rng.bit_generator.state)
        arrays["mu"] = np.float64(sampler_state.mu)
    if rng_key is not None:
        arrays["rng_key"] = np.asarray(rng_key)
    if logits is not None:
        arrays["logits"] = np.asarray(logits, dtype=np.float32)
    np.savez_compressed(path, **arrays)


def try_load(path: str, engine, prompt_ids: list[int]) -> list[int]:
    """Restore engine KV state from a session; returns the prompt suffix that
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
            or int(z["batch"]) != engine.batch
        ):
            return list(prompt_ids)
        saved = z["tokens"]
        n_past = int(z["n_past"])
        kv_dtype = str(z["kv_dtype"])
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

    fresh = engine.new_kv()
    if kv_dtype == "int8":
        if engine.kv_dtype == "int8":
            loaded = (jnp.asarray(z["kv_q"]), jnp.asarray(z["kv_s"]))
        else:  # dequantize into the engine's dense dtype
            dense = z["kv_q"].astype(np.float32) * z["kv_s"]
            loaded = jnp.asarray(dense).astype(engine.kv_dtype)
    else:
        raw = z["kv"]
        if kv_dtype == "bfloat16":
            raw = raw.view(jnp.bfloat16)
        if engine.kv_dtype == "int8":
            from ggllm_tpu.ops import kvcache

            loaded = kvcache.quantize_new(jnp.asarray(raw))
        else:
            loaded = jnp.asarray(raw).astype(engine.kv_dtype)

    def put(buf, vals):
        if isinstance(buf, tuple):
            return tuple(put(b, v) for b, v in zip(buf, vals))
        return buf.at[:, :, :, : vals.shape[3]].set(vals.astype(buf.dtype))

    engine.kv = put(fresh, loaded)
    if engine._kv_sharding is not None:
        import jax

        engine.kv = jax.tree.map(
            lambda a: jax.device_put(a, engine._kv_sharding), engine.kv)
    engine.n_past = n
    return list(prompt_ids[n:])


def load_sampler_state(path: str, sampler):
    """Restore (SamplerState, device rng_key, last_logits) from a session;
    (fresh-state, None, None) on any mismatch. Restoring the rng makes a
    sampled continuation reproduce exactly (libfalcon.cpp:4254 rng string)."""
    from ggllm_tpu.ops import sampling

    state = sampling.SamplerState.init(sampler)
    if not path or not os.path.exists(path):
        return state, None, None
    try:
        z = np.load(path, allow_pickle=False)
        if str(z["magic"]) != SESSION_MAGIC or int(z["version"]) != SESSION_VERSION:
            return state, None, None
        rng_key = jnp.asarray(z["rng_key"]) if "rng_key" in z else None
        logits = np.asarray(z["logits"]) if "logits" in z else None
        if "rng_state" in z:
            st = json.loads(str(z["rng_state"]))
            bg = getattr(np.random, st["bit_generator"])()
            bg.state = st
            state.rng = np.random.Generator(bg)
            state.mu = float(z["mu"])
        return state, rng_key, logits
    except Exception:
        return state, None, None
