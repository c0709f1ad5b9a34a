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


def apply_bias_rows(logits: jnp.ndarray, bias_ids: jnp.ndarray,
                    bias_vals: jnp.ndarray) -> jnp.ndarray:
    """Per-row sparse logit bias: bias_ids (B, NB) token ids (out-of-vocab
    = empty slot), bias_vals (B, NB). Applied BEFORE penalties, matching
    the host cascade head (falcon_main.cpp:899-906)."""
    B = logits.shape[0]
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    return logits.at[rows, bias_ids].add(bias_vals, mode="drop")


def _masked_softmax(vals: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Row softmax over masked (kept) entries; dropped entries -> 0."""
    neg = jnp.where(mask, vals, -jnp.inf)
    m = jnp.max(neg, axis=-1, keepdims=True)
    e = jnp.where(mask, jnp.exp(neg - m), 0.0)
    return e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-38)


def _draw(probs: jnp.ndarray, mask: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Inverse-CDF draw over kept entries — ops/sampling.sample_token's
    std::discrete_distribution semantics, vectorized: first kept index whose
    cumulative mass exceeds u * total (clamped to the last kept)."""
    B, k = probs.shape
    cum = jnp.cumsum(probs, axis=-1)
    v = u[:, None] * cum[:, -1:]
    sel = (cum > v) & mask
    first = jnp.argmax(sel, axis=-1)
    last_kept = (k - 1) - jnp.argmax(mask[:, ::-1], axis=-1)
    return jnp.where(jnp.any(sel, axis=-1), first, last_kept).astype(jnp.int32)


def cascade_mask_probs(vals: jnp.ndarray, temp: jnp.ndarray,
                       top_p: jnp.ndarray, top_k_rows: jnp.ndarray,
                       tfs_z: jnp.ndarray | None = None,
                       typical_p: jnp.ndarray | None = None
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The truncation+temperature stages of cascade_rows WITHOUT the draw:
    returns (probs, mask) over the descending top-k slice, where probs is
    the final temp-scaled masked softmax (dropped entries = 0). Speculative
    decoding uses this to get the post-cascade distributions of both the
    draft and the target for the accept/resample identity."""
    B, k = vals.shape
    rank = jnp.arange(k, dtype=jnp.int32)[None, :]
    mask = rank < jnp.maximum(top_k_rows, 1)[:, None]

    if tfs_z is not None:
        # host tail_free: second derivative of the sorted prob sequence,
        # normalized; truncate at the first index (>= min_keep 1) whose
        # cumulative exceeds z. Skipped when z >= 1 or <= 2 candidates.
        probs = _masked_softmax(vals, mask)
        first = probs[:, :-1] - probs[:, 1:]
        second = jnp.abs(first[:, :-1] - first[:, 1:])
        # host diffs run over the COMPACTED kept array: a second-derivative
        # entry exists only where all three source entries are kept
        second = jnp.where(mask[:, 2:], second, 0.0)
        ssum = jnp.sum(second, axis=-1, keepdims=True)
        second = jnp.where(ssum != 0, second / jnp.maximum(ssum, 1e-38), second)
        cum = jnp.cumsum(second, axis=-1)
        over = (cum > tfs_z[:, None]) & (rank[:, : k - 2] >= 1)
        lastx = jnp.where(jnp.any(over, axis=-1), jnp.argmax(over, axis=-1),
                          jnp.sum(mask, axis=-1))
        lastx = jnp.maximum(lastx, 1)
        n_kept = jnp.sum(mask, axis=-1)
        apply = (tfs_z < 1.0) & (n_kept > 2)
        mask = mask & jnp.where(apply[:, None], rank < lastx[:, None], True)

    if typical_p is not None:
        # host typical: entropy of the kept distribution; candidates ordered
        # by |-log p - H| ascending; keep until cumulative prob > p
        # (inclusive). Produces a non-prefix keep set.
        probs = _masked_softmax(vals, mask)
        logp = jnp.log(jnp.maximum(probs, 1e-38))
        entropy = -jnp.sum(jnp.where(mask, probs * logp, 0.0), axis=-1,
                           keepdims=True)
        shifted = jnp.where(mask, jnp.abs(-logp - entropy), jnp.inf)
        order = jnp.argsort(shifted, axis=-1, stable=True)  # (B, k)
        p_ord = jnp.take_along_axis(probs, order, axis=-1)
        cum = jnp.cumsum(p_ord, axis=-1)
        pos = jnp.arange(k, dtype=jnp.int32)[None, :]
        over = cum > typical_p[:, None]  # min_keep=1: pos >= 0 always true
        lastx = jnp.where(jnp.any(over, axis=-1),
                          jnp.argmax(over, axis=-1) + 1, k)
        keep_ord = pos < lastx[:, None]  # keep the first lastx in order
        keep = jnp.zeros_like(mask).at[
            jnp.arange(B, dtype=jnp.int32)[:, None], order].set(keep_ord)
        mask = mask & jnp.where((typical_p < 1.0)[:, None], keep, True)

    # top_p over the UNSCALED kept distribution (temperature comes after,
    # as in the reference cascade): rank 0 always kept; kept rank i >= 1
    # survives iff cumulative through i stays <= p.
    probs = _masked_softmax(vals, mask)
    cum = jnp.cumsum(probs, axis=-1)
    is_first = jnp.cumsum(mask.astype(jnp.int32), axis=-1) == 1  # first kept
    mask = mask & jnp.where((top_p < 1.0)[:, None],
                            is_first | (cum <= top_p[:, None]), True)

    scaled = vals / jnp.maximum(temp, 1e-6)[:, None]
    probs = _masked_softmax(scaled, mask)
    return probs, mask


def cascade_rows(vals: jnp.ndarray, u: jnp.ndarray, temp: jnp.ndarray,
                 top_p: jnp.ndarray, top_k_rows: jnp.ndarray,
                 tfs_z: jnp.ndarray | None = None,
                 typical_p: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-row sampling cascade over a descending top-k slice, mirroring the
    host order exactly (falcon_main.cpp:946-986 via ops/sampling.sample):
    top_k -> tail_free -> typical -> top_p -> temperature -> inverse-CDF.

    vals (B, k) logits sorted descending (the static top-k slice);
    u (B,) uniform draws; temp/top_p/top_k_rows/tfs_z/typical_p (B,).
    temp[b] <= 0 -> rank 0 (greedy). Returns (B,) RANKS into the slice.
    """
    probs, mask = cascade_mask_probs(vals, temp, top_p, top_k_rows,
                                     tfs_z, typical_p)
    choice = _draw(probs, mask, u)
    return jnp.where(temp <= 0.0, 0, choice)


def mirostat_rows(vals: jnp.ndarray, u: jnp.ndarray, temp: jnp.ndarray,
                  mode: jnp.ndarray, tau: jnp.ndarray, eta: jnp.ndarray,
                  mu: jnp.ndarray, lse: jnp.ndarray, n_vocab: int
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row mirostat v1/v2 over a descending top-k slice (ops/sampling
    mirostat_v1/mirostat_v2 vectorized).

    vals (B, k): top-k TEMP-SCALED logits (host applies temperature before
    mirostat); lse (B,): logsumexp of the FULL scaled logits row, so slice
    probabilities equal the host's full-vocab softmax. Exact while the host
    keep-set stays within the slice (k=512 covers v1's 100-pair s_hat fit
    and practical v2 mu ranges). Returns (ranks, new_mu).
    """
    B, k = vals.shape
    rank = jnp.arange(k, dtype=jnp.int32)[None, :]
    probs = jnp.exp(vals - lse[:, None])  # true full-vocab probabilities

    # ---- v1: fit Zipf s_hat over the first 100 prob ratios, derive k
    n = min(100 - 1, k - 1)
    i = jnp.arange(n, dtype=jnp.float32)
    t_i = jnp.log((i + 2.0) / (i + 1.0))
    b_i = jnp.log(jnp.maximum(probs[:, :n], 1e-38)
                  / jnp.maximum(probs[:, 1:n + 1], 1e-38))
    s_hat = jnp.sum(t_i * b_i, axis=-1) / jnp.sum(t_i * t_i)
    eps_hat = s_hat - 1.0
    k_dyn = ((eps_hat * jnp.exp2(mu))
             / (1.0 - jnp.float32(n_vocab) ** (-eps_hat))) ** (1.0 / s_hat)
    k1 = jnp.clip(k_dyn.astype(jnp.int32), 1, k)
    mask1 = rank < k1[:, None]
    # renormalize over the kept set and draw (host: top_k then sample_token)
    p1 = jnp.where(mask1, probs, 0.0)
    p1 = p1 / jnp.maximum(jnp.sum(p1, axis=-1, keepdims=True), 1e-38)
    c1 = _draw(p1, mask1, u)
    s1 = -jnp.log2(jnp.maximum(
        jnp.take_along_axis(p1, c1[:, None], axis=1)[:, 0], 1e-38))

    # ---- v2: truncate at the first candidate whose surprise exceeds mu
    over = -jnp.log2(jnp.maximum(probs, 1e-38)) > mu[:, None]
    lastx = jnp.where(jnp.any(over, axis=-1),
                      jnp.maximum(jnp.argmax(over, axis=-1), 1), k)
    mask2 = rank < lastx[:, None]
    p2 = jnp.where(mask2, probs, 0.0)
    p2 = p2 / jnp.maximum(jnp.sum(p2, axis=-1, keepdims=True), 1e-38)
    c2 = _draw(p2, mask2, u)
    s2 = -jnp.log2(jnp.maximum(
        jnp.take_along_axis(p2, c2[:, None], axis=1)[:, 0], 1e-38))

    is1 = mode == 1
    choice = jnp.where(is1, c1, c2)
    surprise = jnp.where(is1, s1, s2)
    new_mu = mu - eta * (surprise - tau)
    # greedy short-circuit: the host cascade never reaches mirostat at
    # temp <= 0 (no draw, no mu update)
    active = (mode > 0) & (temp > 0.0)
    return (jnp.where(temp <= 0.0, 0, choice),
            jnp.where(active, new_mu, mu))


def sample_rows_u(logits: jnp.ndarray, u: jnp.ndarray, temp: jnp.ndarray,
                  top_p: jnp.ndarray, top_k: int,
                  top_k_rows: jnp.ndarray | None = None,
                  tfs_z: jnp.ndarray | None = None,
                  typical_p: jnp.ndarray | None = None,
                  miro_mode: jnp.ndarray | None = None,
                  miro_tau: jnp.ndarray | None = None,
                  miro_eta: jnp.ndarray | None = None,
                  miro_mu: jnp.ndarray | None = None,
                  miro_k: int = 512, n_vocab: int | None = None):
    """Batched per-row sampling from explicit uniform draws u (B,): host-
    cascade order with DYNAMIC per-row knobs. Returns (ids, new_mu);
    new_mu is miro_mu passed through when mirostat is off/absent."""
    B, V = logits.shape
    k = min(max(top_k, 1), V)
    vals, idx = jax.lax.top_k(logits, k)  # (B, k), descending
    tkr = top_k_rows if top_k_rows is not None \
        else jnp.full((B,), k, jnp.int32)
    choice = cascade_rows(vals, u, temp, top_p, tkr, tfs_z, typical_p)
    toks = jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]

    if miro_mode is None:
        return toks.astype(jnp.int32), miro_mu

    km = min(miro_k, V)
    scaled = logits / jnp.maximum(temp, 1e-6)[:, None]
    mvals, midx = jax.lax.top_k(scaled, km)
    lse = jax.scipy.special.logsumexp(scaled, axis=-1)
    mchoice, new_mu = mirostat_rows(mvals, u, temp, miro_mode, miro_tau,
                                    miro_eta, miro_mu, lse,
                                    n_vocab or V)
    mtoks = jnp.take_along_axis(midx, mchoice[:, None], axis=1)[:, 0]
    use_miro = miro_mode > 0
    return jnp.where(use_miro, mtoks, toks).astype(jnp.int32), new_mu


def sample_logits_rows(logits: jnp.ndarray, keys, temp: jnp.ndarray,
                       top_p: jnp.ndarray, top_k: int,
                       top_k_rows: jnp.ndarray | None = None,
                       tfs_z: jnp.ndarray | None = None,
                       typical_p: jnp.ndarray | None = None,
                       miro_mode: jnp.ndarray | None = None,
                       miro_tau: jnp.ndarray | None = None,
                       miro_eta: jnp.ndarray | None = None,
                       miro_mu: jnp.ndarray | None = None,
                       miro_k: int = 512, n_vocab: int | None = None,
                       ) -> jnp.ndarray | tuple:
    """sample_rows_u with the uniform drawn from PRNG keys (B, 2). With
    miro_mode given, returns (ids, new_mu, u); else ids."""
    u = jax.vmap(lambda kk: jax.random.uniform(kk, ()))(keys)
    toks, new_mu = sample_rows_u(
        logits, u, temp, top_p, top_k, top_k_rows, tfs_z, typical_p,
        miro_mode, miro_tau, miro_eta, miro_mu, miro_k, n_vocab)
    if miro_mode is None:
        return toks
    return toks, new_mu, u


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
