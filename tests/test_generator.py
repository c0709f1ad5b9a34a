"""Shared Generator (CLI/server generation driver) + device-penalty parity.

The fused decode loop now covers repetition/frequency/presence penalties and
logit bias on device; under greedy decoding it must match the per-token host
cascade (ops/sampling.py == falcon_main.cpp:899-986) token for token.
"""

import numpy as np
import pytest

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.engine.generator import Generator
from ggllm_tpu.io.ggcc import read_model
from ggllm_tpu.io.loader import load_params
from ggllm_tpu.ops import sampling
from ggllm_tpu.ops.sampling_device import device_samplable
from ggllm_tpu.utils.stream import StopStream


@pytest.fixture(scope="module")
def engine_factory(tmp_path_factory):
    from ggllm_tpu.utils.synthetic import write_tiny_model

    path = str(tmp_path_factory.mktemp("gen") / "tiny.ggcc")
    hp = FalconHParams.tiny()
    write_tiny_model(path, hp, ftype_2d=GGMLType.Q8_0, seed=3)
    mf = read_model(path)
    cfg = EngineConfig(n_ctx=96, n_batch=32, kv_dtype="float32",
                       compute_dtype="float32")

    def make():
        return FalconEngine(mf.hparams, load_params(mf, cfg), cfg)

    return make


def _host_generate(eng, prompt, sampler, n):
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


PENALTY_SAMPLERS = [
    sampling.SamplerParams(temp=0.0),  # default penalties (rp=1.1)
    sampling.SamplerParams(temp=0.0, repeat_penalty=1.4, repeat_last_n=8),
    sampling.SamplerParams(temp=0.0, repeat_penalty=1.0,
                           frequency_penalty=0.7, presence_penalty=0.4),
    sampling.SamplerParams(temp=0.0, penalize_nl=False),
    sampling.SamplerParams(temp=0.0, repeat_penalty=1.0,
                           logit_bias={7: 100.0, 3: float("-inf")}),
]


@pytest.mark.parametrize("idx", range(len(PENALTY_SAMPLERS)))
def test_fused_penalties_match_host_greedy(engine_factory, idx):
    sampler = PENALTY_SAMPLERS[idx]
    assert device_samplable(sampler)
    prompt = [5, 17, 130, 42, 99]
    fused = engine_factory().generate(prompt, n_predict=20, sampler=sampler)
    host = _host_generate(engine_factory(), prompt, sampler, 20)
    assert fused == host


def test_default_sampler_is_device_coverable():
    # the headline: the CLI/server DEFAULT config now runs the fused loop
    assert device_samplable(sampling.SamplerParams())


def test_generator_matches_engine_generate(engine_factory):
    sampler = sampling.SamplerParams(temp=0.0)
    prompt = [5, 17, 130, 42]
    ref = engine_factory().generate(prompt, n_predict=16, sampler=sampler)

    eng = engine_factory()
    gen = Generator(eng, sampler, eos_id=-1)
    logits = gen.prefill(prompt)
    got = []
    gen.generate(logits, 16, lambda t: (got.append(t), True)[1])
    assert got == ref
    # invariant: the last sampled token is pending, everything else is in KV
    assert gen.pending_feed == [got[-1]]
    assert eng.n_past == len(prompt) + len(got) - 1


def test_generator_context_swap_continues(engine_factory):
    """Generation far past n_ctx keeps producing tokens via context swap."""
    eng = engine_factory()
    sampler = sampling.SamplerParams(temp=0.0)
    gen = Generator(eng, sampler, eos_id=-1, n_keep=2)
    logits = gen.prefill(list(range(5, 85)))  # n_ctx = 96
    got = []
    reason = gen.generate(logits, 60, lambda t: (got.append(t), True)[1])
    assert reason == "limit"
    assert len(got) == 60
    assert gen.swapped
    assert eng.n_past <= eng.cfg.n_ctx


def test_generator_multi_turn_prefill(engine_factory):
    """Interactive pattern: generate, prefill more input, generate again —
    must equal one flat host run over the same token sequence."""
    sampler = sampling.SamplerParams(temp=0.0)
    eng = engine_factory()
    gen = Generator(eng, sampler, eos_id=-1)
    out1 = []
    gen.generate(gen.prefill([5, 17, 130]), 6, lambda t: (out1.append(t), True)[1])
    out2 = []
    gen.generate(gen.prefill([42, 99]), 6, lambda t: (out2.append(t), True)[1])

    # flat host reference over the identical history
    eng2 = engine_factory()
    state = sampling.SamplerState.init(sampler)
    hist = [5, 17, 130]
    logits = eng2.eval(hist)
    ref1 = []
    for _ in range(6):
        tok = sampling.sample(logits, hist, sampler, state, eng2.cfg.n_ctx)
        ref1.append(tok)
        hist.append(tok)
        logits = eng2.eval([tok])
    assert out1 == ref1
    # host ref fed the last sampled token already; the generator's second
    # turn feeds it lazily — histories align
    hist.extend([42, 99])
    logits = eng2.eval([42, 99])
    ref2 = []
    for _ in range(6):
        tok = sampling.sample(logits, hist, sampler, state, eng2.cfg.n_ctx)
        ref2.append(tok)
        hist.append(tok)
        logits = eng2.eval([tok])
    assert out2 == ref2


# ---------------------------------------------------------------- StopStream


def test_stopstream_holds_back_partial_stop():
    ss = StopStream(stops=[b"<|endoftext|>"])
    assert ss.push(b"hello ") == b"hello "
    assert ss.push(b"<|endo") == b""  # held: could become the stop string
    assert ss.push(b"world") == b"<|endoworld"  # not the stop after all
    assert not ss.stopped


def test_stopstream_suppresses_stopword():
    ss = StopStream(stops=[b"STOP"])
    assert ss.push(b"abc ST") == b"abc "
    assert ss.push(b"OP xyz") == b""
    assert ss.stop_reason == "stopword"
    assert ss.flush() == b""


def test_stopstream_antiprompt_is_emitted():
    ss = StopStream(antiprompts=[b"User:"])
    out = ss.push(b"hello User:")
    assert out == b"hello User:"
    assert ss.stop_reason == "antiprompt"


def test_stopstream_flush_releases_tail():
    ss = StopStream(stops=[b"XYZ"])
    assert ss.push(b"abcX") == b"abc"
    assert ss.flush() == b"X"
