"""On-device sampling for the fused decode loop.

Covers the hot subset of the sampling cascade (greedy, temperature, top-k,
top-p) as pure jnp so the whole decode step — forward, sample, KV append —
compiles into one program and multiple tokens run per host dispatch. The
full host cascade (ops/sampling.py: penalties, tfs, typical, mirostat)
remains the reference path for the long tail of sampler configs; the engine
falls back to it automatically (see FalconEngine.generate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def device_samplable(sampler) -> bool:
    """True if SamplerParams is within the fused device cascade's coverage.

    Covers bias -> repeat/frequency/presence penalties (ring buffer of the
    last repeat_last_n tokens lives on device) -> top-k -> top-p -> temp ->
    categorical; mirostat and the tfs/typical truncations stay host-only."""
    return (
        sampler.mirostat == 0
        and sampler.tfs_z >= 1.0
        and sampler.typical_p >= 1.0
        # top_k <= 0 means full-vocab in the reference cascade
        # (falcon_main.cpp sampling); the device path caps at 1024, so
        # route those to the host for exact semantics (greedy exempt)
        and (sampler.temp <= 0.0 or 0 < sampler.top_k <= 1024)
    )


def penalty_spec(sampler, n_vocab: int) -> tuple:
    """Hashable static spec of the penalty/bias stage for jit cache keys."""
    return (
        float(sampler.repeat_penalty), int(sampler.repeat_last_n),
        float(sampler.frequency_penalty), float(sampler.presence_penalty),
        bool(sampler.penalize_nl),
        tuple(sorted((int(t), float(b)) for t, b in sampler.logit_bias.items()
                     if 0 <= int(t) < n_vocab)),
    )


def apply_penalties(logits: jnp.ndarray, ring: jnp.ndarray, spec: tuple,
                    nl_token: int = 193) -> jnp.ndarray:
    """Logit bias + repetition/frequency/presence penalties against a device
    ring buffer of recent token ids (out-of-vocab entries = empty slots).

    Mirrors the host cascade head (ops/sampling.py sample(), i.e.
    falcon_main.cpp:899-946): bias first, then penalties over the last-n
    window, then the optional newline restore."""
    rp, rln, fp, pp, penalize_nl, bias = spec
    if rln <= 0:  # empty penalty window: only bias applies
        rp, fp, pp = 1.0, 0.0, 0.0
    V = logits.shape[-1]
    if bias:
        ids = jnp.array([t for t, _ in bias], jnp.int32)
        vals = jnp.array([b for _, b in bias], jnp.float32)
        logits = logits.at[ids].add(vals)
    if rp == 1.0 and fp == 0.0 and pp == 0.0:
        return logits
    nl_logit = logits[nl_token] if V > nl_token else 0.0
    # occurrence counts of the window tokens (empty slots scatter-drop)
    counts = jnp.zeros((V,), jnp.float32).at[ring].add(
        1.0, mode="drop", indices_are_sorted=False, unique_indices=False)
    hit = counts > 0
    if rp != 1.0:
        logits = jnp.where(
            hit, jnp.where(logits <= 0, logits * rp, logits / rp), logits)
    if fp != 0.0 or pp != 0.0:
        logits = logits - counts * fp - hit.astype(jnp.float32) * pp
    if not penalize_nl and V > nl_token:
        logits = logits.at[nl_token].set(nl_logit)
    return logits


def apply_penalties_rows(logits: jnp.ndarray, rings: jnp.ndarray,
                         rp: jnp.ndarray, fp: jnp.ndarray,
                         pp: jnp.ndarray) -> jnp.ndarray:
    """Per-row repetition/frequency/presence penalties with DYNAMIC per-row
    strengths (the batched-serving analogue of apply_penalties).

    logits (B, V); rings (B, L) recent-token ids (out-of-vocab = empty slot);
    rp/fp/pp (B,). Rows with rp=1, fp=pp=0 pass through exactly (x*1 and x/1
    are fp-exact), so mixed batches need no branching."""
    B, V = logits.shape
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    counts = jnp.zeros((B, V), jnp.float32).at[rows, rings].add(
        1.0, mode="drop")
    hit = counts > 0
    rp_ = rp[:, None]
    logits = jnp.where(
        hit, jnp.where(logits <= 0, logits * rp_, logits / rp_), logits)
    return logits - counts * fp[:, None] - hit.astype(jnp.float32) * pp[:, None]


def sample_logits_rows(logits: jnp.ndarray, keys, temp: jnp.ndarray,
                       top_p: jnp.ndarray, top_k: int,
                       top_k_rows: jnp.ndarray | None = None) -> jnp.ndarray:
    """Batched per-row sampling with DYNAMIC per-row temp/top_p (traced
    arrays) and a shared static top-k cap; top_k_rows (B,) optionally
    tightens the cutoff per row (exact for k <= cap). temp[b] <= 0 ->
    greedy for row b.

    logits (B, V), keys (B, 2) PRNG keys, temp/top_p (B,). Returns (B,) ids.
    """
    B, V = logits.shape
    k = min(max(top_k, 1), V)
    vals, idx = jax.lax.top_k(logits, k)  # (B, k), descending
    if top_k_rows is not None:
        rank = jnp.arange(k, dtype=jnp.int32)[None, :]
        vals = jnp.where(rank < top_k_rows[:, None], vals, -jnp.inf)
    scaled = vals / jnp.maximum(temp[:, None], 1e-6)
    probs = jax.nn.softmax(scaled, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = jnp.concatenate(
        [jnp.ones((B, 1), bool), cum[:, :-1] < top_p[:, None]], axis=1)
    masked = jnp.where(keep, scaled, -jnp.inf)
    choice = jax.vmap(jax.random.categorical)(keys, masked)  # (B,)
    choice = jnp.where(temp <= 0.0, 0, choice)  # greedy = argmax = rank 0
    return jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0].astype(jnp.int32)


def sample_logits(logits: jnp.ndarray, key, temp: float, top_k: int,
                  top_p: float) -> jnp.ndarray:
    """One token id from (n_vocab,) f32 logits. temp<=0 -> greedy."""
    if temp <= 0.0:
        return jnp.argmax(logits).astype(jnp.int32)
    k = top_k if 0 < top_k < logits.shape[-1] else min(logits.shape[-1], 1024)
    vals, idx = jax.lax.top_k(logits, k)  # descending
    vals = vals / jnp.float32(temp)
    if top_p < 1.0:
        probs = jax.nn.softmax(vals)
        cum = jnp.cumsum(probs)
        # keep tokens while the cumulative mass BEFORE them is < top_p
        # (reference keeps at least one, llama_sample_top_p libfalcon.cpp:3122)
        keep = jnp.concatenate([jnp.ones((1,), bool), cum[:-1] < top_p])
        vals = jnp.where(keep, vals, -jnp.inf)
    choice = jax.random.categorical(key, vals)
    return idx[choice].astype(jnp.int32)
