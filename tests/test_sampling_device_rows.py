"""Per-row device sampling cascade vs the host reference cascade.

The batched device loop (ops/sampling_device) must reproduce the host
cascade (ops/sampling.sample — the parity-tested falcon_main order) token-
for-token when fed the same uniform draw: same truncation sets (top-k, tail-
free, typical, top-p), temperature AFTER top-p, inverse-CDF draw, and the
mirostat v1/v2 adaptive state."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ggllm_tpu.ops import sampling, sampling_device  # noqa: E402

V = 2000


class _ReplayRng:
    """np.random.Generator stand-in replaying preset uniform draws."""

    def __init__(self, us):
        self.us = list(us)

    def random(self):
        return self.us.pop(0)


def _host(logits, params, u, mu=None):
    state = sampling.SamplerState(
        rng=_ReplayRng([u]),
        mu=2.0 * params.mirostat_tau if mu is None else mu)
    tok = sampling.sample(np.asarray(logits), [], params, state)
    return tok, state.mu


def _logits(seed, rows):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((rows, V)) * 3.0).astype(np.float32)


CASES = [
    dict(temp=0.0),                                   # greedy
    dict(temp=0.8, top_k=40, top_p=1.0),              # top-k only
    dict(temp=0.7, top_k=40, top_p=0.6),              # + top-p
    dict(temp=1.3, top_k=64, top_p=0.9),              # temp > 1 after top-p
    dict(temp=0.8, top_k=50, top_p=1.0, tfs_z=0.7),   # tail-free
    dict(temp=0.8, top_k=50, top_p=1.0, typical_p=0.6),  # typical
    dict(temp=0.9, top_k=60, top_p=0.8, tfs_z=0.85, typical_p=0.85),
]


def test_cascade_rows_matches_host():
    B = len(CASES)
    logits = _logits(0, B)
    us = np.linspace(0.05, 0.95, B)
    k = 64
    vals, idx = jax.lax.top_k(jnp.asarray(logits), k)
    temp = jnp.asarray([c.get("temp", 0.8) for c in CASES], jnp.float32)
    top_p = jnp.asarray([c.get("top_p", 1.0) for c in CASES], jnp.float32)
    tkr = jnp.asarray([c.get("top_k", k) for c in CASES], jnp.int32)
    tfs = jnp.asarray([c.get("tfs_z", 1.0) for c in CASES], jnp.float32)
    typ = jnp.asarray([c.get("typical_p", 1.0) for c in CASES], jnp.float32)
    choice = sampling_device.cascade_rows(
        vals, jnp.asarray(us, jnp.float32), temp, top_p, tkr, tfs, typ)
    toks = np.asarray(jnp.take_along_axis(idx, choice[:, None], axis=1))[:, 0]

    for b, c in enumerate(CASES):
        params = sampling.SamplerParams(
            temp=c.get("temp", 0.8), top_k=c.get("top_k", k),
            top_p=c.get("top_p", 1.0), tfs_z=c.get("tfs_z", 1.0),
            typical_p=c.get("typical_p", 1.0),
            repeat_penalty=1.0, repeat_last_n=0)
        want, _ = _host(logits[b], params, float(us[b]))
        assert toks[b] == want, (b, c, toks[b], want)


@pytest.mark.parametrize("mode", [1, 2])
def test_mirostat_rows_matches_host(mode):
    B = 4
    logits = _logits(7 + mode, B)
    us = np.asarray([0.12, 0.4, 0.73, 0.91])
    taus, etas = [5.0, 3.0, 5.0, 4.0], [0.1, 0.2, 0.05, 0.1]
    mus = [10.0, 6.0, 8.0, 7.5]
    temps = [0.8, 1.0, 1.2, 0.9]

    keysim = jnp.asarray(us, jnp.float32)
    scaled = jnp.asarray(logits) / jnp.asarray(temps, jnp.float32)[:, None]
    km = 512
    mvals, midx = jax.lax.top_k(scaled, km)
    lse = jax.scipy.special.logsumexp(scaled, axis=-1)
    choice, new_mu = sampling_device.mirostat_rows(
        mvals, keysim, jnp.asarray(temps, jnp.float32),
        jnp.full((B,), mode, jnp.int32), jnp.asarray(taus, jnp.float32),
        jnp.asarray(etas, jnp.float32), jnp.asarray(mus, jnp.float32),
        lse, V)
    toks = np.asarray(jnp.take_along_axis(midx, choice[:, None], axis=1))[:, 0]

    for b in range(B):
        params = sampling.SamplerParams(
            temp=temps[b], mirostat=mode, mirostat_tau=taus[b],
            mirostat_eta=etas[b], repeat_penalty=1.0, repeat_last_n=0)
        want, want_mu = _host(logits[b], params, float(us[b]), mu=mus[b])
        assert toks[b] == want, (b, toks[b], want)
        np.testing.assert_allclose(float(new_mu[b]), want_mu, atol=2e-3)


def test_bias_rows():
    B = 2
    logits = jnp.zeros((B, V), jnp.float32)
    ids = jnp.asarray([[3, 7, V], [1, V, V]], jnp.int32)  # V = empty slot
    vals = jnp.asarray([[2.0, 5.0, 9.0], [4.0, 9.0, 9.0]], jnp.float32)
    out = np.asarray(sampling_device.apply_bias_rows(logits, ids, vals))
    assert out[0, 3] == 2.0 and out[0, 7] == 5.0 and out[1, 1] == 4.0
    assert out.sum() == 11.0  # out-of-vocab slots dropped


def test_sample_logits_rows_mixed_miro_and_cascade():
    """One call covers both modes: miro rows draw from the mirostat path and
    update mu; cascade rows keep mu untouched."""
    B = 3
    logits = jnp.asarray(_logits(42, B))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    temp = jnp.asarray([0.8, 0.0, 0.9], jnp.float32)
    mode = jnp.asarray([2, 0, 0], jnp.int32)
    mu0 = jnp.asarray([9.0, 10.0, 10.0], jnp.float32)
    toks, new_mu, u = sampling_device.sample_logits_rows(
        logits, keys, temp, jnp.ones(B), 64,
        top_k_rows=jnp.full((B,), 40, jnp.int32),
        tfs_z=jnp.ones(B), typical_p=jnp.ones(B),
        miro_mode=mode, miro_tau=jnp.full((B,), 5.0),
        miro_eta=jnp.full((B,), 0.1), miro_mu=mu0, n_vocab=V)
    toks = np.asarray(toks)
    assert toks.shape == (B,)
    assert float(new_mu[0]) != 9.0  # miro row updated
    assert float(new_mu[1]) == 10.0 and float(new_mu[2]) == 10.0
    # greedy row = plain argmax
    assert toks[1] == int(np.argmax(np.asarray(logits)[1]))
    # u replay determinism: same keys -> same u
    toks2, _, u2 = sampling_device.sample_logits_rows(
        logits, keys, temp, jnp.ones(B), 64,
        top_k_rows=jnp.full((B,), 40, jnp.int32),
        tfs_z=jnp.ones(B), typical_p=jnp.ones(B),
        miro_mode=mode, miro_tau=jnp.full((B,), 5.0),
        miro_eta=jnp.full((B,), 0.1), miro_mu=mu0, n_vocab=V)
    assert np.array_equal(np.asarray(u), np.asarray(u2))
    assert np.array_equal(toks, np.asarray(toks2))


def test_mirostat_beyond_slice_is_graceful():
    """Documented cap: mirostat is exact only while the dynamic keep-set
    stays within the 512-candidate device slice (engine/batching.py docs).
    Probe a VIOLATION — near-uniform logits over V=1024 with a huge mu so
    the host keep-set exceeds 512 — and assert the device path degrades
    gracefully: finite probabilities, a token drawn from the top-512 slice
    (a valid renormalized truncation), and a finite mu update."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ggllm_tpu.ops import sampling_device

    V, B = 1024, 2
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 1e-3, size=(B, V)).astype(np.float32))
    toks, new_mu = sampling_device.sample_rows_u(
        logits, jnp.asarray([0.999, 0.5]), temp=jnp.asarray([1.0, 1.0]),
        top_p=jnp.asarray([1.0, 1.0]), top_k=64,
        miro_mode=jnp.asarray([2, 2], jnp.int32),
        miro_tau=jnp.asarray([100.0, 100.0]),  # mu huge -> keep-set > 512
        miro_eta=jnp.asarray([0.1, 0.1]),
        miro_mu=jnp.asarray([200.0, 200.0]), miro_k=512, n_vocab=V)
    toks = np.asarray(toks)
    new_mu = np.asarray(new_mu)
    assert np.all(np.isfinite(new_mu))
    # the drawn ids must come from the top-512 slice of each row
    order = np.argsort(-np.asarray(logits), axis=-1)
    for b in range(B):
        assert toks[b] in order[b, :512]
