"""LLaMA (GGJT) quantizer support: GGJT v3 output path + the reference's
mixed K-type per-tensor policy (llama.cpp:2441-2513)."""

import numpy as np
import pytest

from ggllm_tpu.core.config import EngineConfig, LlamaHParams
from ggllm_tpu.core.dtypes import FType, GGMLType
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.io.ggcc import read_model
from ggllm_tpu.io.loader import load_params
from ggllm_tpu.tools.quantize import _LlamaMixedPolicy, quantize_file
from ggllm_tpu.utils.synthetic import write_tiny_llama


def _cfg():
    return EngineConfig(n_ctx=64, n_batch=16, kv_dtype="float32",
                        compute_dtype="float32")


@pytest.fixture()
def llama_f16(tmp_path):
    path = str(tmp_path / "l.ggjt")
    hp = LlamaHParams(n_vocab=512, n_embd=128, n_mult=32, n_head=4,
                      n_layer=2, n_rot=32)
    write_tiny_llama(path, hp=hp, ftype_2d=GGMLType.F16, seed=33)
    return path


@pytest.mark.parametrize("ftype", ["q4_0", "q8_0"])
def test_quantize_llama_roundtrip(tmp_path, ftype):
    hp = LlamaHParams(n_vocab=512, n_embd=128, n_mult=32, n_head=4,
                      n_layer=2, n_rot=32)
    src = str(tmp_path / "f32.ggjt")
    write_tiny_llama(src, hp=hp, ftype_2d=GGMLType.F32, seed=33)
    out = str(tmp_path / f"l_{ftype}.ggjt")
    quantize_file(src, out, ftype, log=lambda *a: None)

    mf = read_model(out)
    assert mf.arch == "llama"
    assert mf.version >= 4  # GGJT v3
    assert mf.hparams.ftype == int(
        {"q4_0": FType.MOSTLY_Q4_0, "q8_0": FType.MOSTLY_Q8_0}[ftype])
    gt = {"q4_0": GGMLType.Q4_0, "q8_0": GGMLType.Q8_0}[ftype]
    assert mf.tensors["layers.0.attention.wq.weight"].gtype == gt
    assert mf.tensors["output.weight"].gtype == GGMLType.F32  # kept

    # byte-identical to quantizing the same f32 weights at write time
    direct = str(tmp_path / f"direct_{ftype}.ggjt")
    write_tiny_llama(direct, hp=hp, ftype_2d=gt, seed=33)
    mf_d = read_model(direct)
    for name in ("layers.0.attention.wq.weight", "layers.1.feed_forward.w2.weight"):
        np.testing.assert_array_equal(
            np.asarray(mf.tensor_blob(name)), np.asarray(mf_d.tensor_blob(name)),
            err_msg=name)

    # the quantized file runs through the engine
    eng = FalconEngine(mf.hparams, load_params(mf, _cfg()), _cfg())
    assert np.all(np.isfinite(eng.eval([5, 300, 42, 17])))


def test_quantize_llama_k_quants(tmp_path):
    """K-quant llama quantization needs 256-divisible dims."""
    path = str(tmp_path / "big.ggjt")
    hp = LlamaHParams(n_vocab=512, n_embd=256, n_mult=256, n_head=4,
                      n_layer=2, n_rot=64)
    assert hp.n_ff % 256 == 0
    write_tiny_llama(path, hp=hp, ftype_2d=GGMLType.F16, seed=35)
    out = str(tmp_path / "big_q6k.ggjt")
    quantize_file(path, out, "q6_k", quantize_output=True, log=lambda *a: None)
    mf = read_model(out)
    assert mf.tensors["layers.0.attention.wq.weight"].gtype == GGMLType.Q6_K
    assert mf.tensors["output.weight"].gtype == GGMLType.Q6_K
    cfg = _cfg()
    eng = FalconEngine(mf.hparams, load_params(mf, cfg), cfg)
    assert np.all(np.isfinite(eng.eval([5, 300, 42])))


def test_mixed_policy_matches_reference_rules():
    """The per-tensor upgrade table follows llama.cpp:2495-2513."""
    names = [f"layers.{i}.attention.wv.weight" for i in range(8)] + \
            [f"layers.{i}.feed_forward.w2.weight" for i in range(8)] + \
            ["layers.0.attention.wo.weight", "output.weight",
             "layers.0.attention.wq.weight"]

    pol = _LlamaMixedPolicy(names, FType.MOSTLY_Q3_K_M)
    assert pol.pick("layers.0.attention.wv.weight", GGMLType.Q3_K) == GGMLType.Q4_K
    assert pol.pick("layers.0.feed_forward.w2.weight", GGMLType.Q3_K) == GGMLType.Q4_K
    assert pol.pick("layers.0.attention.wo.weight", GGMLType.Q3_K) == GGMLType.Q4_K
    assert pol.pick("output.weight", GGMLType.Q3_K) == GGMLType.Q6_K
    assert pol.pick("layers.0.attention.wq.weight", GGMLType.Q3_K) == GGMLType.Q3_K

    pol = _LlamaMixedPolicy(names, FType.MOSTLY_Q3_K_L)
    assert pol.pick("layers.0.attention.wv.weight", GGMLType.Q3_K) == GGMLType.Q5_K

    # Q4_K_M: wv upgrades to Q6_K for first/last 8th and every 3rd in between
    pol = _LlamaMixedPolicy(names, FType.MOSTLY_Q4_K_M)
    picks = [pol.pick(f"layers.{i}.attention.wv.weight", GGMLType.Q4_K)
             for i in range(8)]
    # n=8: i<1 or i>=7 or (i-1)%3==2 -> i in {0, 3, 6, 7}
    expect = [GGMLType.Q6_K if i in (0, 3, 6, 7) else GGMLType.Q4_K
              for i in range(8)]
    assert picks == expect


def test_mixed_policy_falls_back_on_indivisible_dims(llama_f16, tmp_path):
    """Tiny (128-wide) llama: policy upgrades to K-quants don't apply, the
    base legacy type is kept instead of erroring."""
    out = str(tmp_path / "l_q4k.ggjt")
    with pytest.raises(ValueError, match="not divisible"):
        quantize_file(llama_f16, out, "q4_k", log=lambda *a: None)
