"""Perplexity protocol + the on-device NLL path (engine.eval_logprobs)."""

import numpy as np
import pytest

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.engine.perplexity import perplexity
from ggllm_tpu.io.ggcc import read_model
from ggllm_tpu.io.loader import load_params
from ggllm_tpu.utils.synthetic import write_tiny_model


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ppl") / "tiny.ggcc")
    write_tiny_model(path, FalconHParams.tiny(), ftype_2d=GGMLType.Q8_0, seed=12)
    return read_model(path)


def _cfg(n_ctx=64):
    return EngineConfig(n_ctx=n_ctx, n_batch=16, kv_dtype="float32",
                        compute_dtype="float32")


def test_eval_logprobs_matches_host_log_softmax(model):
    rng = np.random.default_rng(4)
    ids = rng.integers(0, 512, size=40).tolist()

    e1 = FalconEngine(model.hparams, load_params(model, _cfg()), _cfg())
    lp = e1.eval_logprobs(ids)
    assert lp.shape == (len(ids) - 1,)

    e2 = FalconEngine(model.hparams, load_params(model, _cfg()), _cfg())
    logits = e2.eval(ids, logits_all=True).astype(np.float64)
    lsm = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) \
        - logits.max(-1, keepdims=True)
    ref = np.array([lsm[j, ids[j + 1]] for j in range(len(ids) - 1)])
    np.testing.assert_allclose(lp, ref, atol=1e-4)


def test_perplexity_protocol(model):
    """ppl == exp(mean(-log p)) over the window, computed from the device
    logprob path; cross-check against manual host math on the same logits."""
    rng = np.random.default_rng(5)
    n_ctx = 64
    ids = rng.integers(0, 512, size=2 * n_ctx).tolist()

    eng = FalconEngine(model.hparams, load_params(model, _cfg(n_ctx)), _cfg(n_ctx))
    res = perplexity(eng, ids)
    assert res.n_chunks == 2
    first_j = min(512, n_ctx // 2)
    assert res.count == 2 * (n_ctx - 1 - first_j)

    # manual host computation from full logits
    e2 = FalconEngine(model.hparams, load_params(model, _cfg(n_ctx)), _cfg(n_ctx))
    nll = 0.0
    for c in range(2):
        chunk = ids[c * n_ctx:(c + 1) * n_ctx]
        e2.reset()
        logits = e2.eval(chunk, logits_all=True).astype(np.float64)
        for j in range(first_j, n_ctx - 1):
            row = logits[j] - logits[j].max()
            p = np.exp(row) / np.exp(row).sum()
            nll += -np.log(p[chunk[j + 1]])
    ref_ppl = np.exp(nll / res.count)
    np.testing.assert_allclose(res.ppl, ref_ppl, rtol=1e-4)
