"""Merged kernel-path weight layout (wqkvu / w_od) vs split layout.

The single-chip fused path merges QKV+FFN-up rows and wo+FFN-down columns
into single launches (io/loader._merge_kernel_weights). Logits must match
the split XLA path to fp tolerance — same math, different launch grouping.
Runs the Pallas kernels in interpret mode on CPU.
"""

import numpy as np
import pytest

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.io.ggcc import read_model
from ggllm_tpu.io.loader import load_params
from ggllm_tpu.utils.synthetic import write_tiny_model


@pytest.mark.parametrize("hp_name", ["tiny", "tiny_gqa"])
def test_merged_matches_split(tmp_path, hp_name):
    hp = getattr(FalconHParams, hp_name)()
    path = str(tmp_path / "m.ggcc")
    write_tiny_model(path, hp, ftype_2d=GGMLType.Q4_0, seed=3)
    mf = read_model(path)
    cfg_split = EngineConfig(n_ctx=64, n_batch=16, kv_dtype="float32",
                             compute_dtype="float32", kernel_layout=False)
    cfg_merged = EngineConfig(n_ctx=64, n_batch=16, kv_dtype="float32",
                              compute_dtype="float32", kernel_layout=True)

    params_split = load_params(mf, cfg_split)
    params_merged = load_params(mf, cfg_merged)
    assert isinstance(params_merged["layers"], list)  # unstacked kernel path
    l0 = params_merged["layers"][0]
    if hp_name == "tiny":
        assert "wqkvu" in l0
    else:
        assert "wqkv" in l0
    assert "w_od" in l0

    prompt = [5, 17, 130, 42, 99]
    e1 = FalconEngine(mf.hparams, params_split, cfg_split)
    e2 = FalconEngine(mf.hparams, params_merged, cfg_merged)
    l1 = e1.eval(prompt)
    l2 = e2.eval(prompt)
    scale = np.abs(l1).max() + 1e-6
    np.testing.assert_allclose(l2 / scale, l1 / scale, atol=5e-5)

    # decode step parity too (exercises the KV cache through both layouts)
    t1 = int(np.argmax(l1))
    np.testing.assert_allclose(
        e2.eval([t1]) / scale, e1.eval([t1]) / scale, atol=5e-5)
