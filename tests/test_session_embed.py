"""Session (prompt-cache) save/restore and embedding extraction
(reference: llama_{load,save}_session_file, examples/embedding,
examples/save-load-state)."""

import numpy as np
import pytest

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine import session as session_mod
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.io.ggcc import read_model
from ggllm_tpu.io.loader import load_params
from ggllm_tpu.utils.synthetic import write_tiny_model


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sess") / "tiny.ggcc")
    write_tiny_model(path, FalconHParams.tiny(), ftype_2d=GGMLType.Q8_0, seed=6)
    return read_model(path)


def _cfg():
    return EngineConfig(n_ctx=64, n_batch=16, kv_dtype="float32",
                        compute_dtype="float32")


def test_session_roundtrip_matches_fresh(model, tmp_path):
    """Resume from a saved session == evaluating the full prompt fresh
    (save-load-state example's assertion)."""
    prompt = [5, 17, 130, 42, 99, 260]
    sess = str(tmp_path / "s.npz")

    e1 = FalconEngine(model.hparams, load_params(model, _cfg()), _cfg())
    e1.eval(prompt)
    session_mod.save(sess, e1, prompt)

    e2 = FalconEngine(model.hparams, load_params(model, _cfg()), _cfg())
    remaining = session_mod.try_load(sess, e2, prompt + [7, 8])
    assert remaining == [7, 8]
    assert e2.n_past == len(prompt)

    l_resumed = e2.eval([7, 8])
    e3 = FalconEngine(model.hparams, load_params(model, _cfg()), _cfg())
    l_fresh = e3.eval(prompt + [7, 8])
    np.testing.assert_allclose(l_resumed, l_fresh, atol=1e-5)


def test_session_mismatch_falls_back(model, tmp_path):
    sess = str(tmp_path / "s2.npz")
    e1 = FalconEngine(model.hparams, load_params(model, _cfg()), _cfg())
    e1.eval([1, 2, 3])
    session_mod.save(sess, e1, [1, 2, 3])

    e2 = FalconEngine(model.hparams, load_params(model, _cfg()), _cfg())
    # completely different prompt: no prefix reuse
    out = session_mod.try_load(sess, e2, [9, 9, 9])
    assert out == [9, 9, 9] and e2.n_past == 0


def test_embedding_long_prompt_chunks(model):
    """Prompts longer than one prefill bucket chunk through eval first."""
    e = FalconEngine(model.hparams, load_params(model, _cfg()), _cfg())
    long_prompt = list(range(5, 45))  # 40 tokens > n_batch=16
    emb = e.embed(long_prompt)
    assert emb.shape == (model.hparams.n_embd,)
    # equals eval-then-embed of the same sequence
    e2 = FalconEngine(model.hparams, load_params(model, _cfg()), _cfg())
    e2.eval(long_prompt[:-3])
    emb2 = e2.embed(long_prompt[-3:])
    np.testing.assert_allclose(emb, emb2, atol=1e-5)


def test_embedding(model):
    e = FalconEngine(model.hparams, load_params(model, _cfg()), _cfg())
    emb = e.embed([5, 17, 130])
    assert emb.shape == (model.hparams.n_embd,)
    assert np.all(np.isfinite(emb))
    # embedding equals the normed hidden that produced the logits:
    # lm_head(emb) == eval logits at the same position
    e2 = FalconEngine(model.hparams, load_params(model, _cfg()), _cfg())
    logits = e2.eval([5, 17, 130])
    w = model.tensor_f32("lm_head.weight")
    np.testing.assert_allclose(emb @ w.T, logits, atol=2e-3)


def test_session_native_kv_dtypes(model, tmp_path):
    """KV persists in its native dtype (int8 codes+scales, bf16 raw) and only
    the first n_past positions — no dense-f32 blowup."""
    prompt = [5, 17, 130, 42]
    for kvd in ("int8", "bfloat16"):
        cfg = EngineConfig(n_ctx=64, n_batch=16, kv_dtype=kvd,
                           compute_dtype="float32")
        sess = str(tmp_path / f"s_{kvd}.npz")
        e1 = FalconEngine(model.hparams, load_params(model, cfg), cfg)
        e1.eval(prompt)
        session_mod.save(sess, e1, prompt)
        z = np.load(sess)
        assert str(z["kv_dtype"]) == kvd
        arr = z["kv_q"] if kvd == "int8" else z["kv"]
        assert arr.shape[3] == len(prompt)  # truncated to n_past
        assert arr.itemsize <= 2  # native width, not f32

        e2 = FalconEngine(model.hparams, load_params(model, cfg), cfg)
        rest = session_mod.try_load(sess, e2, prompt + [7])
        assert rest == [7]
        np.testing.assert_allclose(
            e2.eval([7]), e1.eval([7]), atol=2e-2)


def test_session_cross_dtype_restore(model, tmp_path):
    """An int8 session restores into a f32 engine (dequantized) and back."""
    prompt = [5, 17, 130, 42]
    cfg8 = EngineConfig(n_ctx=64, n_batch=16, kv_dtype="int8",
                        compute_dtype="float32")
    e1 = FalconEngine(model.hparams, load_params(model, cfg8), cfg8)
    e1.eval(prompt)
    sess = str(tmp_path / "cross.npz")
    session_mod.save(sess, e1, prompt)

    cfgf = _cfg()
    e2 = FalconEngine(model.hparams, load_params(model, cfgf), cfgf)
    assert session_mod.try_load(sess, e2, prompt + [9]) == [9]
    np.testing.assert_allclose(e2.eval([9]), e1.eval([9]), atol=2e-2)


def test_session_sampled_continuation_reproduces(model, tmp_path):
    """Full state parity: rng (host + device) persists, so a SAMPLED
    continuation after save/load equals the uninterrupted run
    (falcon_copy_state_data semantics, libfalcon.cpp:4226-4477)."""
    from ggllm_tpu.engine.generator import Generator
    from ggllm_tpu.ops import sampling

    prompt = [5, 17, 130, 42]
    sampler = sampling.SamplerParams(temp=0.9, top_k=40, top_p=0.95, seed=7)
    sess = str(tmp_path / "repro.npz")

    # run A: prompt -> 6 tokens -> save -> 6 more (the uninterrupted tail)
    eA = FalconEngine(model.hparams, load_params(model, _cfg()), _cfg())
    genA = Generator(eA, sampler, eos_id=-1)
    outA = []
    genA.generate(genA.prefill(prompt), 6, lambda t: (outA.append(t), True)[1])
    session_mod.save(sess, eA, genA.all_tokens[: eA.n_past],
                     sampler_state=genA.state, rng_key=genA.rng)
    saved_tokens = list(genA.all_tokens)
    tailA = []
    genA.generate(genA.prefill([]), 6, lambda t: (tailA.append(t), True)[1])

    # run B: restore, continue
    eB = FalconEngine(model.hparams, load_params(model, _cfg()), _cfg())
    rest = session_mod.try_load(sess, eB, saved_tokens)
    genB = Generator(eB, sampler, eos_id=-1)
    genB.state, rng_key, _ = session_mod.load_sampler_state(sess, sampler)
    if rng_key is not None:
        genB.rng = rng_key
    genB.all_tokens = saved_tokens[: len(saved_tokens) - len(rest)]
    tailB = []
    genB.generate(genB.prefill(rest), 6, lambda t: (tailB.append(t), True)[1])
    assert tailB == tailA
