"""Tensor-parallel sharding tests on a virtual 8-device CPU mesh.

Checks that a TP-sharded engine produces the same logits as single-device,
for both the MQA (kv=1, replicated KV) and GQA (kv=2+, sharded KV) layouts,
and for quantized (planar) weights.
"""

import numpy as np
import pytest

import jax

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.io.ggcc import read_model
from ggllm_tpu.io.loader import load_params
from ggllm_tpu.parallel.mesh import make_mesh
from ggllm_tpu.utils.synthetic import write_tiny_model


requires_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _cfg(weight_mode="dequant"):
    return EngineConfig(
        n_ctx=64, n_batch=32, kv_dtype="float32", compute_dtype="float32",
        weight_mode=weight_mode,
    )


def _build(path, hp, gtype, seed=11):
    write_tiny_model(path, hp, ftype_2d=gtype, seed=seed)


@requires_8dev
@pytest.mark.parametrize("variant", ["7b", "40b"])
@pytest.mark.parametrize("gtype", [GGMLType.F32, GGMLType.Q4_K])
def test_tp_matches_single_device(tmp_path, variant, gtype):
    hp = FalconHParams.tiny() if variant == "7b" else FalconHParams.tiny_gqa()
    if gtype == GGMLType.Q4_K:
        hp.n_embd = 256  # K-quants need dims divisible by 256
        hp.n_head = 8 if variant == "7b" else 8
        hp.n_head_kv = 1 if variant == "7b" else 2
    path = str(tmp_path / "m.ggcc")
    _build(path, hp, gtype)
    cfg = _cfg("fused" if gtype != GGMLType.F32 else "dequant")
    tokens = [3, 140, 25, 99, 271]

    mf = read_model(path)
    params = load_params(mf, cfg)
    e1 = FalconEngine(mf.hparams, params, cfg)
    ref = e1.eval(tokens, logits_all=True)

    mesh = make_mesh(data=2, model=4)
    mf2 = read_model(path)
    params2 = load_params(mf2, cfg)
    e2 = FalconEngine(mf2.hparams, params2, cfg, mesh=mesh)
    got = e2.eval(tokens, logits_all=True)

    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@requires_8dev
def test_tp_decode_matches(tmp_path):
    hp = FalconHParams.tiny_gqa()
    path = str(tmp_path / "m.ggcc")
    _build(path, hp, GGMLType.F32)
    cfg = _cfg()
    mesh = make_mesh(data=1, model=8)

    mf = read_model(path)
    e1 = FalconEngine(mf.hparams, load_params(mf, cfg), cfg)
    e2 = FalconEngine(mf.hparams, load_params(read_model(path), cfg), cfg, mesh=mesh)

    toks = [7, 8, 9, 10]
    l1 = [np.asarray(e1.eval([t])) for t in toks]
    l2 = [np.asarray(e2.eval([t])) for t in toks]
    np.testing.assert_allclose(np.stack(l2), np.stack(l1), rtol=2e-4, atol=2e-4)


@requires_8dev
def test_param_shard_layout(tmp_path):
    """wq output dim is sharded over 'model'; wk replicated for MQA."""
    hp = FalconHParams.tiny()
    path = str(tmp_path / "m.ggcc")
    _build(path, hp, GGMLType.F32)
    cfg = _cfg()
    mesh = make_mesh(data=2, model=4)
    mf = read_model(path)
    e = FalconEngine(mf.hparams, load_params(mf, cfg), cfg, mesh=mesh)

    wq = e.params["layers"]["wq"]
    assert "model" in str(wq.sharding.spec)
    wk = e.params["layers"]["wk"]
    assert wk.sharding.spec == jax.sharding.PartitionSpec() or all(
        a is None for a in wk.sharding.spec
    )
