"""Fused on-device decode loop vs per-token host path (must match exactly
under greedy decoding — same forward, same argmax)."""

import numpy as np
import pytest

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.io.ggcc import read_model
from ggllm_tpu.io.loader import load_params
from ggllm_tpu.ops import sampling
from ggllm_tpu.ops.sampling_device import device_samplable
from ggllm_tpu.utils.synthetic import write_tiny_model


@pytest.fixture(scope="module")
def engine_factory(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("eng") / "tiny.ggcc")
    hp = FalconHParams.tiny()
    write_tiny_model(path, hp, ftype_2d=GGMLType.Q8_0, seed=11)
    mf = read_model(path)
    cfg = EngineConfig(n_ctx=96, n_batch=32, kv_dtype="float32",
                       compute_dtype="float32")

    def make(batch_size: int = 1):
        return FalconEngine(mf.hparams, load_params(mf, cfg), cfg,
                            batch_size=batch_size)

    return make


def test_device_samplable_classification():
    greedy = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)
    assert device_samplable(greedy)
    assert device_samplable(sampling.SamplerParams())  # penalties run on device
    assert not device_samplable(sampling.SamplerParams(mirostat=2, repeat_penalty=1.0))
    assert not device_samplable(sampling.SamplerParams(tfs_z=0.9))
    assert not device_samplable(sampling.SamplerParams(typical_p=0.9))


def test_fused_greedy_matches_host_loop(engine_factory):
    prompt = [5, 17, 130, 42, 99, 260, 31, 7]
    greedy = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)
    assert device_samplable(greedy)

    eng = engine_factory()
    fused = eng.generate(prompt, n_predict=24, sampler=greedy)

    eng2 = engine_factory()
    logits = eng2.eval(prompt)
    host = []
    for _ in range(24):
        tok = int(np.argmax(logits))
        host.append(tok)
        logits = eng2.eval([tok])

    assert fused == host


def test_fused_stop_token_rollback(engine_factory):
    prompt = [5, 17, 130, 42]
    greedy = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)
    eng = engine_factory()
    ref = eng.generate(prompt, n_predict=24, sampler=greedy)
    stop = ref[5]  # force a stop mid-chunk

    eng2 = engine_factory()
    out = eng2.generate(prompt, n_predict=24, sampler=greedy, stop_ids={stop})
    assert out == ref[: out.index(stop) + 1]
    assert out[-1] == stop
    # n_past = prompt + forwarded tokens (everything before the stop token)
    assert eng2.n_past == len(prompt) + len(out) - 1

    # continuing from the rolled-back state stays consistent with ref
    nxt = eng2.generate([stop], n_predict=4, sampler=greedy)
    i = out.index(stop)
    assert nxt == ref[i + 1 : i + 5]


def test_fused_sampled_reproducible(engine_factory):
    prompt = [5, 17, 130]
    s = sampling.SamplerParams(temp=0.8, top_k=20, top_p=0.9,
                               repeat_penalty=1.0, seed=42)
    a = engine_factory().generate(prompt, n_predict=16, sampler=s)
    b = engine_factory().generate(prompt, n_predict=16, sampler=s)
    assert a == b
    assert len(a) == 16


def test_fused_generate_on_batch_engine(engine_factory):
    """Single-stream fused generation on a batch_size>1 engine (regression:
    decode_chunk once reshaped the token to (1,1) against a B-row cache)."""
    greedy = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)
    ref = engine_factory().generate([5, 17, 130], n_predict=10, sampler=greedy)
    got = engine_factory(batch_size=2).generate([5, 17, 130], n_predict=10,
                                                sampler=greedy)
    assert got == ref


def test_full_vocab_top_k_stays_on_host(engine_factory):
    """top_k <= 0 means full-vocab in the reference cascade; the device loop
    caps at 1024, so such samplers must take the host path."""
    from ggllm_tpu.ops.sampling_device import device_samplable

    assert not device_samplable(
        sampling.SamplerParams(temp=0.8, top_k=0, repeat_penalty=1.0))
    assert device_samplable(
        sampling.SamplerParams(temp=0.0, top_k=0, repeat_penalty=1.0))  # greedy


def test_pipelined_matches_chained_chunks(engine_factory):
    """decode_pipelined == chained decode_chunk calls exactly (same tokens,
    same final n_past), sampled as well as greedy."""
    prompt = [5, 17, 130, 42, 99]
    for sampler in (sampling.SamplerParams(temp=0.0, repeat_penalty=1.0),
                    sampling.SamplerParams(temp=0.9, top_k=40, seed=7)):
        eng_a = engine_factory()
        logits = eng_a.eval(prompt)
        first = int(np.argmax(logits))
        chained = []
        tok, rng = first, None
        window = prompt + [first]
        for _ in range(4):
            toks, rng = eng_a.decode_chunk(tok, 4, sampler, rng_key=rng,
                                           last_tokens=window)
            chained.extend(int(t) for t in toks)
            window.extend(int(t) for t in toks)
            tok = int(toks[-1])

        eng_b = engine_factory()
        eng_b.eval(prompt)
        chunks = []
        piped, _ = eng_b.decode_pipelined(
            first, 16, 4, sampler, last_tokens=prompt + [first],
            on_tokens=lambda a: chunks.append(a))
        assert [int(t) for t in piped] == chained
        assert sum(len(c) for c in chunks) == 16
        assert eng_b.n_past == eng_a.n_past


def test_pipelined_early_stop_advances_then_rolls_back(engine_factory):
    prompt = [5, 17, 130, 42]
    eng = engine_factory()
    logits = eng.eval(prompt)
    first = int(np.argmax(logits))
    base = eng.n_past
    seen = []

    def on_tokens(a):
        seen.append(a)
        return False  # stop after the first fetched chunk

    out, _ = eng.decode_pipelined(first, 16, 4, last_tokens=prompt + [first],
                                  on_tokens=on_tokens)
    assert len(out) == 4 and len(seen) == 1
    # two chunks were dispatched before the stop was seen
    assert eng.n_past == base + 8
    eng.rollback(base + 4)
    assert eng.n_past == base + 4
