"""Speculative decoding: exact-output guarantees and KV bookkeeping.

The committed stream must be distributed exactly as target-only sampling —
for greedy that means BIT-IDENTICAL tokens whatever the draft proposes
(good, bad, or truncated); for stochastic sampling the accept/resample
helpers must reproduce p regardless of q (statistical check).
"""

import numpy as np
import pytest

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.engine.speculative import (
    SpeculativeDecoder, spec_accept, spec_resample, truncate_params)
from ggllm_tpu.io.ggcc import read_model
from ggllm_tpu.io.loader import load_params
from ggllm_tpu.ops import sampling


@pytest.fixture(scope="module")
def engines(tmp_path_factory):
    from ggllm_tpu.utils.synthetic import write_tiny_model

    d = tmp_path_factory.mktemp("spec")
    cfg = EngineConfig(n_ctx=96, n_batch=32, kv_dtype="float32",
                       compute_dtype="float32")
    out = {}
    for name, seed in (("target", 3), ("other", 11)):
        path = str(d / f"{name}.ggcc")
        hp = FalconHParams.tiny()
        write_tiny_model(path, hp, ftype_2d=GGMLType.Q8_0, seed=seed)
        mf = read_model(path)
        out[name] = (mf, cfg)
    return out


def _make(engines, which):
    mf, cfg = engines[which]
    return FalconEngine(mf.hparams, load_params(mf, cfg), cfg)


def _target_only_greedy(eng, prompt, sampler, n):
    state = sampling.SamplerState.init(sampler)
    logits = eng.eval(prompt)
    last = list(prompt)
    out = []
    for _ in range(n):
        tok = sampling.sample(logits, last, sampler, state, eng.cfg.n_ctx)
        out.append(tok)
        last.append(tok)
        logits = eng.eval([tok])
    return out


PROMPT = [5, 9, 2, 14, 3]
GREEDY = sampling.SamplerParams(temp=0.0)


def test_greedy_matches_target_only_bad_draft(engines):
    """Draft is a DIFFERENT random model: acceptance is poor, output must
    still equal target-only greedy decode exactly."""
    ref = _target_only_greedy(_make(engines, "target"), PROMPT, GREEDY, 24)
    spec = SpeculativeDecoder(_make(engines, "target"),
                              _make(engines, "other"), k=4)
    out = spec.generate(PROMPT, 24, GREEDY)
    assert out == ref
    assert spec.stats.n_drafted > 0


def test_greedy_matches_target_only_perfect_draft(engines):
    """Draft == target: everything accepted, k+1 tokens per round."""
    ref = _target_only_greedy(_make(engines, "target"), PROMPT, GREEDY, 20)
    spec = SpeculativeDecoder(_make(engines, "target"),
                              _make(engines, "target"), k=4)
    out = spec.generate(PROMPT, 20, GREEDY)
    assert out == ref
    assert spec.stats.acceptance == 1.0
    assert spec.stats.n_rounds == 4  # 20 tokens / (k+1) per round


def test_truncated_self_draft(engines):
    """Depth-truncated view of the target's own params as the draft: shares
    device buffers, still exact greedy output."""
    mf, cfg = engines["target"]
    params = load_params(mf, cfg)
    target = FalconEngine(mf.hparams, params, cfg)
    hp_d = FalconHParams.tiny()
    hp_d.n_layer = 1
    draft = FalconEngine(hp_d, truncate_params(params, 1), cfg)
    ref = _target_only_greedy(_make(engines, "target"), PROMPT, GREEDY, 16)
    spec = SpeculativeDecoder(target, draft, k=3)
    assert spec.generate(PROMPT, 16, GREEDY) == ref


def test_penalties_respected(engines):
    """Cascade samplers (penalties active) must survive the spec path."""
    sampler = sampling.SamplerParams(temp=0.0, repeat_penalty=1.3,
                                     repeat_last_n=8)
    ref = _target_only_greedy(_make(engines, "target"), PROMPT, sampler, 20)
    spec = SpeculativeDecoder(_make(engines, "target"),
                              _make(engines, "other"), k=4)
    assert spec.generate(PROMPT, 20, sampler) == ref


def test_kv_bookkeeping_consistent(engines):
    """After a speculative run the target's KV/n_past must be equivalent to
    having evaluated the committed stream directly: the next-step logits
    must match a fresh engine's."""
    target = _make(engines, "target")
    spec = SpeculativeDecoder(target, _make(engines, "other"), k=4)
    out = spec.generate(PROMPT, 12, GREEDY)
    stream = PROMPT + out
    assert target.n_past == len(stream) - 1
    logits_spec = target.eval([stream[-1]])

    fresh = _make(engines, "target")
    logits_ref = fresh.eval(stream)
    np.testing.assert_allclose(logits_spec, logits_ref, rtol=2e-4, atol=2e-4)


FUSED = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)


def test_fused_round_matches_target_only(engines):
    """Penalty-free greedy takes the single-dispatch device round; output
    must still equal target-only greedy with a mismatched draft."""
    ref = _target_only_greedy(_make(engines, "target"), PROMPT, FUSED, 24)
    spec = SpeculativeDecoder(_make(engines, "target"),
                              _make(engines, "other"), k=4)
    assert spec._fused_ok(FUSED)
    out = spec.generate(PROMPT, 24, FUSED)
    assert out == ref
    assert spec.stats.n_rounds > 0


def test_fused_matches_host_path(engines):
    """The fused device round and the host-orchestrated round must emit
    identical streams (greedy, same models)."""
    host = SpeculativeDecoder(_make(engines, "target"),
                              _make(engines, "other"), k=3)
    host._fused_ok = lambda sampler: False  # force host rounds
    ref = host.generate(PROMPT, 18, FUSED)
    fused = SpeculativeDecoder(_make(engines, "target"),
                               _make(engines, "other"), k=3)
    assert fused.generate(PROMPT, 18, FUSED) == ref
    # same drafts, same verdicts => identical acceptance accounting
    assert fused.stats.n_accepted == host.stats.n_accepted


def test_fused_perfect_draft_accepts_everything(engines):
    spec = SpeculativeDecoder(_make(engines, "target"),
                              _make(engines, "target"), k=4)
    out = spec.generate(PROMPT, 20, FUSED)
    assert len(out) == 20
    assert spec.stats.acceptance == 1.0


def test_fused_kv_consistent(engines):
    target = _make(engines, "target")
    spec = SpeculativeDecoder(target, _make(engines, "other"), k=4)
    out = spec.generate(PROMPT, 11, FUSED)
    stream = PROMPT + out
    assert target.n_past == len(stream) - 1
    logits_spec = target.eval([stream[-1]])
    fresh = _make(engines, "target")
    logits_ref = fresh.eval(stream)
    np.testing.assert_allclose(logits_spec, logits_ref, rtol=2e-4, atol=2e-4)


def test_mirostat_rejected(engines):
    spec = SpeculativeDecoder(_make(engines, "target"),
                              _make(engines, "other"), k=2)
    with pytest.raises(ValueError):
        spec.generate(PROMPT, 4, sampling.SamplerParams(temp=0.8, mirostat=2))


def test_accept_resample_identity():
    """The rejection-sampling identity: draw x~q, accept w.p. min(1,p/q),
    else resample from norm(max(p-q,0)) — the committed token is exactly
    p-distributed for ANY q. Checked empirically on a small vocab."""
    rng = np.random.default_rng(0)
    V = 8
    for trial in range(3):
        p = rng.dirichlet(np.ones(V)).astype(np.float32)
        q = rng.dirichlet(np.ones(V) * (0.3 + trial)).astype(np.float32)
        n = 60_000
        xs = rng.choice(V, size=n, p=q)
        u = rng.random(n)
        counts = np.zeros(V)
        ratio = np.minimum(1.0, p / np.maximum(q, 1e-20))
        for x, accept_u in zip(xs, u):
            if accept_u < ratio[x]:
                counts[x] += 1
            else:
                counts[spec_resample(p, q, rng, greedy=False)] += 1
        emp = counts / n
        assert np.abs(emp - p).max() < 0.015, (emp, p)


def test_accept_helper_greedy():
    p = np.array([0.1, 0.7, 0.2], np.float32)
    q = np.array([0.5, 0.4, 0.1], np.float32)
    rng = np.random.default_rng(0)
    assert spec_accept(p, q, 1, rng, greedy=True)
    assert not spec_accept(p, q, 0, rng, greedy=True)
    assert spec_resample(p, q, rng, greedy=True) == 1


# ---------------------------------------------- stochastic fused rounds

STOCH = sampling.SamplerParams(temp=0.9, top_k=40, top_p=0.95,
                               repeat_penalty=1.0, seed=7)


def _replay_rounds(engines, prompt, sampler, rounds, k):
    """Host mirror of the device stochastic round: same cascade
    (ops/sampling.cascade_probs), same inverse-CDF draw order (logits
    descending), same accept (u*q[x] < p[x]) and residual resample — driven
    by the uniforms the device consumed. Returns the committed stream."""
    tgt = _make(engines, "target")
    dr = _make(engines, "other")
    n_ctx = tgt.cfg.n_ctx
    if len(prompt) > 1:
        tgt.eval_tokens(prompt[:-1])
        dr.eval_tokens(prompt[:-1])
    t0 = prompt[-1]
    out = []

    def cdf_id_order(dist, u):
        cum = np.cumsum(dist)
        sel = cum > u * cum[-1]
        if sel.any():
            return int(np.argmax(sel))
        return int(np.max(np.nonzero(dist > 0)[0]))

    for _, _, us in rounds:
        n0 = tgt.n_past
        u_draft, u_acc, u_fin = us[: k + 1], us[k + 1: 2 * k + 1], us[-1]
        xs, qs = [], []
        x = t0
        for j in range(k + 1):
            lg = dr.eval_tokens([x])
            q = sampling.cascade_probs(lg, [], sampler, n_ctx)
            x = cdf_id_order(q, u_draft[j])
            xs.append(x)
            qs.append(q)
        rows = tgt.eval_tokens([t0] + xs[:k], logits_all=True)
        ps = [sampling.cascade_probs(rows[i], [], sampler, n_ctx)
              for i in range(k + 1)]
        n_acc = 0
        for i in range(k):
            if u_acc[i] * qs[i][xs[i]] < ps[i][xs[i]]:
                n_acc += 1
            else:
                break
        p_sel = ps[n_acc]
        q_sel = qs[n_acc] if n_acc < k else np.zeros_like(p_sel)
        resid = np.maximum(p_sel - q_sel, 0.0)
        tot = float(resid.sum())
        dist = resid / tot if tot > 0 else p_sel
        final = cdf_id_order(dist, u_fin)
        emitted = xs[:n_acc] + [final]
        tgt.rollback(n0 + n_acc + 1)
        dr.rollback(n0 + n_acc + 1)
        out.extend(emitted)
        t0 = final
    return out


def test_fused_stochastic_replay(engines):
    """The fused stochastic round must be the exact device transcription of
    the host accept/resample math: replaying the recorded uniforms through
    host cascade_probs reproduces the committed stream token-for-token."""
    spec = SpeculativeDecoder(_make(engines, "target"),
                              _make(engines, "other"), k=3,
                              rounds_per_dispatch=2)
    assert spec._fused_ok(STOCH)
    out = spec.generate(PROMPT, 16, STOCH)
    assert spec.stats.n_rounds > 0 and len(out) > 0
    rounds = spec.last_rounds
    replay = _replay_rounds(engines, PROMPT, STOCH, rounds, k=3)
    n = sum(len(e) for e, _, _ in rounds)
    assert replay[:n] == [t for e, _, _ in rounds for t in e]


def test_fused_stochastic_truncations_replay(engines):
    """tfs + typical + top-p active in the fused stochastic round."""
    samp = sampling.SamplerParams(temp=0.8, top_k=64, top_p=0.9, tfs_z=0.92,
                                  typical_p=0.85, repeat_penalty=1.0, seed=13)
    spec = SpeculativeDecoder(_make(engines, "target"),
                              _make(engines, "other"), k=3,
                              rounds_per_dispatch=2)
    assert spec._fused_ok(samp)
    out = spec.generate(PROMPT, 12, samp)
    assert len(out) > 0
    rounds = spec.last_rounds
    replay = _replay_rounds(engines, PROMPT, samp, rounds, k=3)
    n = sum(len(e) for e, _, _ in rounds)
    assert replay[:n] == [t for e, _, _ in rounds for t in e]


def test_fused_stochastic_kv_consistent(engines):
    """After stochastic fused rounds the target KV equals having evaluated
    the committed stream directly."""
    target = _make(engines, "target")
    spec = SpeculativeDecoder(target, _make(engines, "other"), k=4)
    out = spec.generate(PROMPT, 11, STOCH)
    stream = PROMPT + out
    assert target.n_past == len(stream) - 1
    logits_spec = target.eval([stream[-1]])
    fresh = _make(engines, "target")
    logits_ref = fresh.eval(stream)
    np.testing.assert_allclose(logits_spec, logits_ref, rtol=2e-4, atol=2e-4)


def test_fused_stochastic_first_token_distribution(engines):
    """The identity end-to-end on device: over many seeds, the FIRST
    committed token's empirical distribution must match the target's
    cascade distribution p (regardless of the mismatched draft q)."""
    sampler = sampling.SamplerParams(temp=1.2, top_k=8, top_p=1.0,
                                     repeat_penalty=1.0)
    tgt = _make(engines, "target")
    dr = _make(engines, "other")
    ref = _make(engines, "target")
    p = sampling.cascade_probs(ref.eval(PROMPT), [], sampler, ref.cfg.n_ctx)
    spec = SpeculativeDecoder(tgt, dr, k=2, rounds_per_dispatch=1)
    counts: dict[int, int] = {}
    n = 400
    for s in range(n):
        tgt.reset()
        dr.reset()
        out = spec.generate(
            PROMPT, 3,
            sampling.SamplerParams(temp=1.2, top_k=8, top_p=1.0,
                                   repeat_penalty=1.0, seed=1000 + s))
        counts[out[0]] = counts.get(out[0], 0) + 1
    kept = np.nonzero(p > 0)[0]
    assert set(counts) <= set(int(t) for t in kept)
    emp = np.array([counts.get(int(t), 0) / n for t in kept])
    assert np.abs(emp - p[kept]).max() < 0.08, (emp, p[kept])


# ----------------------------------------------- arch neutrality (LLaMA)

@pytest.fixture(scope="module")
def llama_engines(tmp_path_factory):
    from ggllm_tpu.utils.synthetic import write_tiny_llama

    d = tmp_path_factory.mktemp("spec_llama")
    cfg = EngineConfig(n_ctx=96, n_batch=32, kv_dtype="float32",
                       compute_dtype="float32", kernel_layout=True)
    out = {}
    for name, seed in (("target", 7), ("other", 19)):
        path = str(d / f"{name}.ggjt")
        write_tiny_llama(path, seed=seed)
        out[name] = (read_model(path), cfg)
    return out


def _make_llama(llama_engines, which):
    mf, cfg = llama_engines[which]
    return FalconEngine(mf.hparams, load_params(mf, cfg), cfg)


def test_llama_fused_speculative_greedy(llama_engines):
    """The fused device rounds are arch-neutral: LLaMA target + mismatched
    LLaMA draft, greedy output identical to target-only decode."""
    ref = _target_only_greedy(_make_llama(llama_engines, "target"),
                              PROMPT, FUSED, 18)
    spec = SpeculativeDecoder(_make_llama(llama_engines, "target"),
                              _make_llama(llama_engines, "other"), k=3)
    assert spec._fused_ok(FUSED)
    assert spec.generate(PROMPT, 18, FUSED) == ref
    assert spec.stats.n_rounds > 0


def test_llama_fused_speculative_stochastic_replay(llama_engines):
    """Stochastic fused rounds on LLaMA replay exactly on host."""
    spec = SpeculativeDecoder(_make_llama(llama_engines, "target"),
                              _make_llama(llama_engines, "other"), k=3,
                              rounds_per_dispatch=2)
    out = spec.generate(PROMPT, 12, STOCH)
    assert len(out) > 0 and spec.stats.n_rounds > 0

    # host mirror on fresh llama engines
    tgt = _make_llama(llama_engines, "target")
    dr = _make_llama(llama_engines, "other")
    n_ctx = tgt.cfg.n_ctx
    if len(PROMPT) > 1:
        tgt.eval_tokens(PROMPT[:-1])
        dr.eval_tokens(PROMPT[:-1])
    t0 = PROMPT[-1]
    replay = []
    for _, _, us in spec.last_rounds:
        n0 = tgt.n_past
        k = 3
        u_draft, u_acc, u_fin = us[: k + 1], us[k + 1: 2 * k + 1], us[-1]
        xs, qs = [], []
        x = t0
        for j in range(k + 1):
            lg = dr.eval_tokens([x])
            q = sampling.cascade_probs(lg, [], STOCH, n_ctx)
            cum = np.cumsum(q)
            sel = cum > u_draft[j] * cum[-1]
            x = int(np.argmax(sel)) if sel.any() \
                else int(np.max(np.nonzero(q > 0)[0]))
            xs.append(x)
            qs.append(q)
        rows = tgt.eval_tokens([t0] + xs[:k], logits_all=True)
        ps = [sampling.cascade_probs(rows[i], [], STOCH, n_ctx)
              for i in range(k + 1)]
        n_acc = 0
        for i in range(k):
            if u_acc[i] * qs[i][xs[i]] < ps[i][xs[i]]:
                n_acc += 1
            else:
                break
        p_sel = ps[n_acc]
        q_sel = qs[n_acc] if n_acc < k else np.zeros_like(p_sel)
        resid = np.maximum(p_sel - q_sel, 0.0)
        tot = float(resid.sum())
        dist = resid / tot if tot > 0 else p_sel
        cum = np.cumsum(dist)
        sel = cum > u_fin * cum[-1]
        final = int(np.argmax(sel)) if sel.any() \
            else int(np.max(np.nonzero(dist > 0)[0]))
        replay.extend(xs[:n_acc] + [final])
        tgt.rollback(n0 + n_acc + 1)
        dr.rollback(n0 + n_acc + 1)
        t0 = final
    committed = [t for e, _, _ in spec.last_rounds for t in e]
    assert replay[: len(committed)] == committed


def test_fused_speculative_int8_kv(engines):
    """Fused rounds over int8 (codes, scales) KV caches on BOTH engines:
    greedy output equals target-only greedy on the same cache dtype."""
    mf_t, _ = engines["target"]
    mf_o, _ = engines["other"]
    cfg = EngineConfig(n_ctx=96, n_batch=32, kv_dtype="int8",
                       compute_dtype="float32", kernel_layout=True)

    def make(mf):
        return FalconEngine(mf.hparams, load_params(mf, cfg), cfg)

    ref = _target_only_greedy(make(mf_t), PROMPT, FUSED, 16)
    spec = SpeculativeDecoder(make(mf_t), make(mf_o), k=3)
    assert isinstance(spec.target.kv, tuple)
    assert spec.generate(PROMPT, 16, FUSED) == ref
    assert spec.stats.n_rounds > 0


# ------------------------------------------------- batched fused rounds

def test_generate_rows_matches_sequential(engines):
    """Batched speculative rounds (B rows, per-row positions, one device
    program) must give EACH row exactly its single-stream greedy stream —
    including ragged advancement with a mismatched draft."""
    mf_t, cfg = engines["target"]
    mf_o, _ = engines["other"]
    prompts = [[5, 9, 2, 14, 3], [7, 1, 4], [11, 30, 8, 2, 6, 40]]
    B = len(prompts)

    refs = [
        _target_only_greedy(_make(engines, "target"), p, FUSED, 12)
        for p in prompts
    ]
    tgt = FalconEngine(mf_t.hparams, load_params(mf_t, cfg), cfg,
                       batch_size=B)
    dr = FalconEngine(mf_o.hparams, load_params(mf_o, cfg), cfg,
                      batch_size=B)
    spec = SpeculativeDecoder(tgt, dr, k=3, rounds_per_dispatch=2)
    outs = spec.generate_rows(prompts, 12)
    # exact equality up to provable fp ties: the B-row verify program and
    # the per-token reference are DIFFERENT XLA programs, and CPU intra-op
    # partitioning varies run-to-run, so a near-tie argmax can flip. At
    # the first divergence, require the two candidates' logits to be an
    # fp tie in the reference engine; past a tie the streams legitimately
    # differ.
    for b, (out, ref) in enumerate(zip(outs, refs)):
        if out == ref:
            continue
        i = next(j for j in range(len(ref)) if out[j] != ref[j])
        probe = _make(engines, "target")
        lg = probe.eval(prompts[b] + ref[:i])
        gap = abs(float(lg[out[i]]) - float(lg[ref[i]]))
        assert gap < 1e-3, (b, i, out[i], ref[i], gap)
    assert spec.stats.n_rounds > 0


def test_generate_rows_perfect_draft(engines):
    """Draft == target at B rows: drafts overwhelmingly accepted. (Not
    asserted exactly 1.0: the draft runs the decode-style chunk-deferred
    forward while the verify runs the prefill path — equal weights, but
    different fp reduction orders, so a near-tie argmax can rarely flip.
    The exact-output guarantee is covered by the sequential-match test,
    which holds for ANY acceptance.)"""
    mf_t, cfg = engines["target"]
    prompts = [[5, 9, 2], [7, 1, 4, 30]]
    tgt = FalconEngine(mf_t.hparams, load_params(mf_t, cfg), cfg,
                       batch_size=2)
    dr = FalconEngine(mf_t.hparams, load_params(mf_t, cfg), cfg,
                      batch_size=2)
    spec = SpeculativeDecoder(tgt, dr, k=3, rounds_per_dispatch=1)
    outs = spec.generate_rows(prompts, 12)
    assert all(len(o) == 12 for o in outs)
    assert spec.stats.acceptance > 0.8
