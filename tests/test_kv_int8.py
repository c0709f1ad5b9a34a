"""int8-quantized KV cache: close to the f32 cache, end-to-end decode works,
sessions round-trip (the TPU-native extension of the reference's -f16_kv)."""

import numpy as np
import pytest

from ggllm_tpu.core.config import EngineConfig, FalconHParams, LlamaHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine import session as session_mod
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.io.ggcc import read_model
from ggllm_tpu.io.loader import load_params
from ggllm_tpu.ops import kvcache, sampling
from ggllm_tpu.utils.synthetic import write_tiny_llama, write_tiny_model


def test_quantize_roundtrip():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    kv = jnp.asarray(rng.standard_normal((2, 1, 5, 2, 64)) * 3.0, jnp.float32)
    q, s = kvcache.quantize_new(kv)
    deq = np.asarray(q, dtype=np.float32) * np.asarray(s)
    err = np.abs(deq - np.asarray(kv)).max() / np.abs(kv).max()
    assert err < 0.01  # int8 per-vector: <1% relative


@pytest.mark.parametrize("family", ["falcon", "llama"])
def test_int8_kv_close_to_f32(tmp_path, family):
    if family == "falcon":
        path = str(tmp_path / "m.ggcc")
        write_tiny_model(path, FalconHParams.tiny(), ftype_2d=GGMLType.Q8_0, seed=3)
    else:
        path = str(tmp_path / "m.ggjt")
        write_tiny_llama(path, ftype_2d=GGMLType.Q8_0, seed=3)
    mf = read_model(path)

    def make(kvd):
        cfg = EngineConfig(n_ctx=64, n_batch=16, kv_dtype=kvd,
                           compute_dtype="float32")
        return FalconEngine(mf.hparams, load_params(mf, cfg), cfg), cfg

    prompt = [5, 300, 42, 17, 99]
    e32, _ = make("float32")
    e8, _ = make("int8")
    assert isinstance(e8.kv, tuple)
    l32 = e32.eval(prompt)
    l8 = e8.eval(prompt)
    scale = np.abs(l32).max()
    np.testing.assert_allclose(l8 / scale, l32 / scale, atol=2e-2)

    # fused decode loop runs on the quantized cache
    greedy = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)
    out = e8.generate([7], n_predict=8, sampler=greedy)
    assert len(out) == 8


def test_int8_session_roundtrip(tmp_path):
    path = str(tmp_path / "m.ggcc")
    write_tiny_model(path, FalconHParams.tiny(), ftype_2d=GGMLType.Q8_0, seed=4)
    mf = read_model(path)
    cfg = EngineConfig(n_ctx=64, n_batch=16, kv_dtype="int8",
                       compute_dtype="float32")
    prompt = [5, 17, 130, 42]

    e1 = FalconEngine(mf.hparams, load_params(mf, cfg), cfg)
    e1.eval(prompt)
    sess = str(tmp_path / "s.npz")
    session_mod.save(sess, e1, prompt)

    e2 = FalconEngine(mf.hparams, load_params(mf, cfg), cfg)
    remaining = session_mod.try_load(sess, e2, prompt + [9])
    assert remaining == [9]
    l_resumed = e2.eval([9])
    l_direct = e1.eval([9])
    np.testing.assert_allclose(l_resumed, l_direct, atol=1e-4)


@pytest.mark.skipif(
    __import__("jax").device_count() < 4, reason="needs 4 devices")
@pytest.mark.parametrize("kv_shard", ["heads", "sequence"])
def test_int8_kv_under_mesh(tmp_path, kv_shard):
    """int8 cache composes with both mesh modes (TP head sharding and
    sequence sharding): logits stay close to the single-device f32 engine."""
    from ggllm_tpu.parallel.mesh import make_mesh

    path = str(tmp_path / "m.ggcc")
    write_tiny_model(path, FalconHParams.tiny(), ftype_2d=GGMLType.Q8_0, seed=44)
    mf = read_model(path)

    cfg_ref = EngineConfig(n_ctx=64, n_batch=16, kv_dtype="float32",
                           compute_dtype="float32", kernel_layout=True)
    ref = FalconEngine(mf.hparams, load_params(mf, cfg_ref), cfg_ref)

    mesh = make_mesh(data=1, model=2)
    cfg = EngineConfig(n_ctx=64, n_batch=16, kv_dtype="int8",
                       compute_dtype="float32", kernel_layout=True,
                       kv_shard=kv_shard)
    params = load_params(mf, cfg) if kv_shard == "sequence" else \
        load_params(mf, cfg, mesh=mesh)
    eng = FalconEngine(mf.hparams, params, cfg, mesh=mesh)

    prompt = [5, 17, 130, 42, 99, 260]
    l_ref = ref.eval(prompt)
    l_int8 = eng.eval(prompt)
    scale = np.abs(l_ref).max() + 1e-6
    # int8 KV quantization noise bounds the difference
    np.testing.assert_allclose(l_int8 / scale, l_ref / scale, atol=2e-2)
    # decode steps work on the quantized mesh-sharded cache
    t = int(np.argmax(l_int8))
    assert np.all(np.isfinite(eng.eval([t])))
