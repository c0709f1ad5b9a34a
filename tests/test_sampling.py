"""Sampler tests: the reference's golden cases (tests/test-sampling.cpp:176-199)
plus cascade behavior."""

import numpy as np
import pytest

from ggllm_tpu.ops import sampling as S


def _cands(probs):
    return S.Candidates.from_logits(np.log(np.asarray(probs, dtype=np.float32)))


def _check(c, expected, atol=1e-5):
    S.softmax(c)
    np.testing.assert_allclose(c.probs, np.asarray(expected, np.float32), atol=atol)


@pytest.mark.parametrize(
    "probs,expected,k",
    [
        ([0.1, 0.2, 0.3, 0.4], [0.4], 1),
        ([0.1, 0.2, 0.3, 0.4], [0.4, 0.3, 0.2], 3),
    ],
)
def test_top_k(probs, expected, k):
    c = _cands(probs)
    S.top_k(c, k)
    _check(c, np.asarray(expected) / np.sum(expected))


@pytest.mark.parametrize(
    "probs,expected,p",
    [
        ([0.1, 0.2, 0.3, 0.4], [0.4], 0.0),
        ([0.1, 0.2, 0.3, 0.4], [0.4, 0.3], 0.7),
        ([0.1, 0.2, 0.3, 0.4], [0.4, 0.3, 0.2, 0.1], 1.0),
    ],
)
def test_top_p(probs, expected, p):
    c = _cands(probs)
    S.top_p(c, p)
    _check(c, np.asarray(expected) / np.sum(expected), atol=1e-4)


@pytest.mark.parametrize(
    "probs,expected,z",
    [
        ([0.1, 0.15, 0.2, 0.25, 0.3], [0.3], 0.25),
        ([0.1, 0.15, 0.2, 0.25, 0.3], [0.3, 0.25], 0.75),
        ([0.1, 0.15, 0.2, 0.25, 0.3], [0.3, 0.25], 0.99),
    ],
)
def test_tfs(probs, expected, z):
    c = _cands(probs)
    S.tail_free(c, z)
    _check(c, np.asarray(expected) / np.sum(expected), atol=1e-4)


@pytest.mark.parametrize(
    "probs,expected,p",
    [
        ([0.97, 0.01, 0.01, 0.01], [0.97], 0.5),
        ([0.4, 0.2, 0.2, 0.2], [0.2, 0.2, 0.2], 0.5),
    ],
)
def test_typical(probs, expected, p):
    c = _cands(probs)
    S.typical(c, p)
    _check(c, np.asarray(expected) / np.sum(expected), atol=1e-3)


@pytest.mark.parametrize(
    "probs,last,expected,penalty",
    [
        ([0.2] * 5, [0], [0.25, 0.25, 0.25, 0.25, 0.0], 50.0),
        ([0.2] * 5, [0, 1, 2], [0.5, 0.5, 0, 0, 0], 50.0),
        ([0.2] * 5, [0, 1, 2, 0, 0], [0.5, 0.5, 0, 0, 0], 50.0),
    ],
)
def test_repetition_penalty(probs, last, expected, penalty):
    # expected is in sorted-descending order, like the reference's candidate
    # array after softmax (tests/test-sampling.cpp compares data[i].p)
    c = _cands(probs)
    S.repetition_penalty(c, np.asarray(last), penalty)
    S.softmax(c)
    np.testing.assert_allclose(c.probs, expected, atol=1e-5)


@pytest.mark.parametrize(
    "probs,last,expected,af,ap",
    [
        ([0.2] * 5, [0], [0.249997, 0.249997, 0.249997, 0.249997, 0.000011], 5.0, 5.0),
        ([0.2] * 5, [0, 1, 2], [0.499966, 0.499966, 0.000023, 0.000023, 0.000023], 5.0, 5.0),
        ([0.2] * 5, [0, 1, 2, 0, 0], [0.499977, 0.499977, 0.000023, 0.000023, 0.0], 5.0, 5.0),
    ],
)
def test_frequency_presence(probs, last, expected, af, ap):
    c = _cands(probs)
    S.frequency_presence_penalties(c, np.asarray(last), af, ap)
    S.softmax(c)
    np.testing.assert_allclose(c.probs, expected, atol=1e-5)


def test_greedy():
    c = _cands([0.1, 0.5, 0.4])
    assert S.greedy(c) == 1


def test_sample_token_distribution():
    rng = np.random.default_rng(0)
    counts = np.zeros(3)
    for _ in range(4000):
        c = _cands([0.2, 0.5, 0.3])
        counts[S.sample_token(c, rng)] += 1
    np.testing.assert_allclose(counts / counts.sum(), [0.2, 0.5, 0.3], atol=0.03)


def test_cascade_greedy_when_temp_zero():
    logits = np.zeros(300, np.float32)
    logits[42] = 5.0
    p = S.SamplerParams(temp=0.0)
    st = S.SamplerState.init(p)
    assert S.sample(logits, [], p, st) == 42


def test_cascade_seeded_reproducible():
    logits = np.random.default_rng(1).standard_normal(300).astype(np.float32)
    p = S.SamplerParams(seed=123)
    out1 = [S.sample(logits, [], p, S.SamplerState.init(p)) for _ in range(5)]
    out2 = [S.sample(logits, [], p, S.SamplerState.init(p)) for _ in range(5)]
    assert out1 == out2


def test_mirostat_v2_runs():
    logits = np.random.default_rng(2).standard_normal(300).astype(np.float32)
    p = S.SamplerParams(mirostat=2, seed=7)
    st = S.SamplerState.init(p)
    toks = [S.sample(logits, [], p, st) for _ in range(10)]
    assert all(0 <= t < 300 for t in toks)
    assert st.mu != 2.0 * p.mirostat_tau  # mu adapted


def test_mirostat_v1_runs():
    logits = np.random.default_rng(3).standard_normal(300).astype(np.float32)
    p = S.SamplerParams(mirostat=1, seed=7)
    st = S.SamplerState.init(p)
    toks = [S.sample(logits, [], p, st) for _ in range(10)]
    assert all(0 <= t < 300 for t in toks)
