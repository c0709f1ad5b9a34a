"""LoRA ('ggla') round-trip and application tests (libfalcon.cpp:3927-4172)."""

import numpy as np
import pytest

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.io import lora as lora_mod
from ggllm_tpu.io.ggcc import read_model
from ggllm_tpu.io.loader import load_params
from ggllm_tpu.utils.synthetic import write_tiny_model


def test_ggla_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    path = str(tmp_path / "adapter.ggla")
    a = rng.standard_normal((4, 128)).astype(np.float32)
    b = rng.standard_normal((64, 4)).astype(np.float16)
    lora_mod.write_lora(path, r=4, alpha=8, tensors={"some.weight": {"loraA": a, "loraB": b}})
    lf = lora_mod.read_lora(path)
    assert lf.r == 4 and lf.alpha == 8 and lf.scaling == 2.0
    np.testing.assert_array_equal(lf.tensors["some.weight"]["loraA"], a)
    np.testing.assert_array_equal(lf.tensors["some.weight"]["loraB"], b.astype(np.float16))
    expected = (b.astype(np.float32) @ a) * 2.0
    np.testing.assert_allclose(lf.delta("some.weight"), expected, rtol=1e-6)


def test_lora_apply_through_loader(tmp_path):
    model_path = str(tmp_path / "tiny.ggcc")
    hp = FalconHParams.tiny()
    write_tiny_model(model_path, hp, ftype_2d=GGMLType.Q8_0, seed=9)
    mf = read_model(model_path)

    rng = np.random.default_rng(1)
    r = 2
    name = "transformer.h.0.mlp.dense_h_to_4h.weight"
    a = (rng.standard_normal((r, hp.n_embd)) * 0.1).astype(np.float32)
    b = (rng.standard_normal((hp.n_ff, r)) * 0.1).astype(np.float32)
    lora_path = str(tmp_path / "adapter.ggla")
    lora_mod.write_lora(lora_path, r=r, alpha=r, tensors={name: {"loraA": a, "loraB": b}})

    cfg = EngineConfig(compute_dtype="float32", kernel_layout=False)
    patched = load_params(mf, cfg, lora=lora_path)

    w_base = mf.tensor_f32(name)  # dequantized base weight
    w_patched = np.asarray(patched["layers"]["ffn_up"][0])
    np.testing.assert_allclose(w_patched - w_base, b @ a, atol=1e-4)

    # the patched key densifies in ALL layers (scan stacking); other keys
    # stay quantized
    assert patched["layers"]["ffn_up"].shape == (hp.n_layer, hp.n_ff, hp.n_embd)
    from ggllm_tpu.ops.linear import QuantTensor
    assert isinstance(patched["layers"]["ffn_down"], QuantTensor)


def test_lora_shape_mismatch(tmp_path):
    path = str(tmp_path / "bad.ggla")
    lora_mod.write_lora(path, 2, 2, {
        "w.weight": {"loraA": np.zeros((2, 8), np.float32),
                     "loraB": np.zeros((16, 2), np.float32)}})
    lf = lora_mod.read_lora(path)
    with pytest.raises(ValueError):
        lora_mod.apply_to_matrix(np.zeros((4, 8), np.float32), lf, "w.weight")


def test_lora_base_model_supplies_base_weights(tmp_path):
    """--lora-base: the delta is added to the f32 base model's tensor, not
    the quantized model's dequantized one (libfalcon.cpp:4091-4110)."""
    hp = FalconHParams.tiny()
    q_path = str(tmp_path / "quant.ggcc")
    f_path = str(tmp_path / "f32.ggcc")
    # same seed -> same underlying weights; one file quantized, one dense
    write_tiny_model(q_path, hp, ftype_2d=GGMLType.Q4_0, seed=9)
    write_tiny_model(f_path, hp, ftype_2d=GGMLType.F32, seed=9)
    mf_q, mf_f = read_model(q_path), read_model(f_path)

    rng = np.random.default_rng(2)
    r = 2
    name = "transformer.h.0.mlp.dense_h_to_4h.weight"
    a = (rng.standard_normal((r, hp.n_embd)) * 0.1).astype(np.float32)
    b = (rng.standard_normal((hp.n_ff, r)) * 0.1).astype(np.float32)
    lora_path = str(tmp_path / "adapter.ggla")
    lora_mod.write_lora(lora_path, r=r, alpha=r,
                        tensors={name: {"loraA": a, "loraB": b}})

    cfg = EngineConfig(compute_dtype="float32", kernel_layout=False)
    with_base = load_params(mf_q, cfg, lora=lora_path, lora_base=f_path)
    w = np.asarray(with_base["layers"]["ffn_up"][0])
    # base came from the f32 file: delta on the EXACT weights, no quant noise
    np.testing.assert_allclose(w - mf_f.tensor_f32(name), b @ a, atol=1e-4)

    # without a base, the quantized model warns and uses dequantized values
    with pytest.warns(UserWarning, match="lora-base"):
        no_base = load_params(mf_q, cfg, lora=lora_path)
    w2 = np.asarray(no_base["layers"]["ffn_up"][0])
    np.testing.assert_allclose(w2 - mf_q.tensor_f32(name), b @ a, atol=1e-4)
    # the two differ by the quantization error of the base weight
    assert not np.allclose(w, w2)
