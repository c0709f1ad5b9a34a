"""End-to-end model tests: GGCC round-trip, forward correctness vs an
independent numpy reference, KV-cache decode consistency."""

import numpy as np
import pytest

import jax.numpy as jnp

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.io.ggcc import read_model
from ggllm_tpu.io.loader import load_params
from ggllm_tpu.utils.synthetic import random_falcon_weights, write_tiny_model

from . import reference_forward


@pytest.fixture(scope="module", params=["7b", "40b"])
def tiny_model(request, tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / f"tiny_{request.param}.ggcc"
    hp = FalconHParams.tiny() if request.param == "7b" else FalconHParams.tiny_gqa()
    write_tiny_model(str(path), hp, ftype_2d=GGMLType.F32, seed=7)
    return str(path), hp


def _f32_engine(path, hp, n_ctx=64, batch=1):
    cfg = EngineConfig(
        n_ctx=n_ctx, n_batch=32, kv_dtype="float32", compute_dtype="float32",
        weight_mode="dequant",
    )
    cfg.rope.dynamic_ntk = True  # n_ctx < 2048 -> alpha 1, vanilla rope
    mf = read_model(path)
    params = load_params(mf, cfg)
    return FalconEngine(mf.hparams, params, cfg, batch_size=batch), mf


def test_ggcc_roundtrip(tiny_model):
    path, hp = tiny_model
    mf = read_model(path)
    assert mf.hparams.n_embd == hp.n_embd
    assert mf.hparams.n_head_kv == hp.n_head_kv
    assert mf.vocab.n_vocab == hp.n_vocab
    ws = random_falcon_weights(hp, seed=7)
    for name, ref in ws.items():
        got = mf.tensor_f32(name)
        assert got.shape == ref.shape, name
        np.testing.assert_array_equal(got, ref.astype(np.float32), err_msg=name)


def test_forward_matches_numpy_reference(tiny_model):
    path, hp = tiny_model
    engine, mf = _f32_engine(path, hp)
    tokens = np.array([13, 300, 42, 77, 105, 9, 255, 31], dtype=np.int32)

    logits = engine.eval(tokens, logits_all=True)  # (S, V)

    ws = random_falcon_weights(hp, seed=7)
    ref = reference_forward.forward(ws, hp, tokens.tolist())

    # f32 JAX vs f64 numpy: tolerances cover accumulation-order differences
    np.testing.assert_allclose(logits, ref, rtol=2e-3, atol=2e-3)


def test_decode_matches_prefill(tiny_model):
    """Token-by-token decode through the KV cache == full-sequence prefill."""
    path, hp = tiny_model
    tokens = [13, 300, 42, 77, 105, 9]

    engine, _ = _f32_engine(path, hp)
    full = engine.eval(tokens, logits_all=True)

    engine2, _ = _f32_engine(path, hp)
    step_logits = []
    for t in tokens:
        step_logits.append(engine2.eval([t]))
    step = np.stack(step_logits)

    np.testing.assert_allclose(step, full, rtol=1e-4, atol=1e-4)


def test_prefill_chunking_consistent(tiny_model):
    """Chunked prefill (n_batch splits) == one-shot prefill."""
    path, hp = tiny_model
    tokens = list(range(20, 60))  # 40 tokens, n_batch=32 -> 2 chunks

    e1, _ = _f32_engine(path, hp)
    one = e1.eval(tokens, logits_all=True)

    e2, _ = _f32_engine(path, hp)
    first = e2.eval(tokens[:7], logits_all=True)
    rest = e2.eval(tokens[7:], logits_all=True)
    two = np.concatenate([first, rest], axis=0)

    np.testing.assert_allclose(two, one, rtol=1e-4, atol=1e-4)


def test_greedy_generation_deterministic(tiny_model):
    path, hp = tiny_model
    from ggllm_tpu.ops.sampling import SamplerParams

    engine, _ = _f32_engine(path, hp)
    out1 = engine.generate([5, 6, 7], n_predict=8, sampler=SamplerParams(temp=0.0))
    engine.reset()
    out2 = engine.generate([5, 6, 7], n_predict=8, sampler=SamplerParams(temp=0.0))
    assert out1 == out2
    assert len(out1) == 8
    assert all(0 <= t < hp.n_vocab for t in out1)


def test_quantized_model_close_to_f32(tiny_model):
    """Q8_0-quantized weights produce logits close to f32 (loader+planar path)."""
    path, hp = tiny_model
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        qpath = os.path.join(td, "tiny_q8.ggcc")
        write_tiny_model(qpath, hp, ftype_2d=GGMLType.Q8_0, seed=7)
        tokens = [13, 300, 42, 77]

        ef, _ = _f32_engine(path, hp)
        lf = ef.eval(tokens, logits_all=True)

        cfg = EngineConfig(
            n_ctx=64, n_batch=32, kv_dtype="float32", compute_dtype="float32",
            weight_mode="fused",
        )
        mf = read_model(qpath)
        params = load_params(mf, cfg)
        eq = FalconEngine(mf.hparams, params, cfg)
        lq = eq.eval(tokens, logits_all=True)

        # Q8_0 is ~0.3% relative error per weight; logits stay close
        assert np.abs(lq - lf).max() / (np.abs(lf).max() + 1e-9) < 0.05
