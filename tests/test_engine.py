

def test_plane_layout_prefill_identical_logits(tmp_path):
    """cfg.plane_layout='prefill' (row-major quant planes for the MXU
    kernels) must be numerically IDENTICAL to the default decode layout —
    it is a physical relayout only."""
    import numpy as np

    from ggllm_tpu.core.config import EngineConfig, FalconHParams
    from ggllm_tpu.core.dtypes import GGMLType
    from ggllm_tpu.engine.engine import FalconEngine
    from ggllm_tpu.io.ggcc import read_model
    from ggllm_tpu.io.loader import load_params
    from ggllm_tpu.utils.synthetic import write_tiny_model

    path = str(tmp_path / "m.ggcc")
    write_tiny_model(path, FalconHParams.tiny(), ftype_2d=GGMLType.Q4_0,
                     seed=9)
    mf = read_model(path)
    prompt = [5, 17, 130, 42, 99, 260, 31, 7]
    outs = []
    for pl in ("decode", "prefill"):
        cfg = EngineConfig(n_ctx=64, n_batch=16, kv_dtype="float32",
                           compute_dtype="float32", kernel_layout=True,
                           plane_layout=pl)
        eng = FalconEngine(mf.hparams, load_params(mf, cfg), cfg)
        outs.append(eng.eval(prompt))
    np.testing.assert_array_equal(outs[0], outs[1])
