"""Training demo (train-text-from-scratch analogue): loss decreases and the
resulting GGCC file loads and generates in the engine."""

import numpy as np

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.io.ggcc import read_model
from ggllm_tpu.io.loader import load_params
from ggllm_tpu.ops import sampling
from ggllm_tpu.tools import train_demo


def test_training_reduces_loss_and_model_loads(tmp_path):
    hp = FalconHParams(n_vocab=512, n_embd=64, n_head=2, n_head_kv=1,
                       n_layer=1, n_falcon_type=7, n_bpe_merges=0)
    text = (b"abcabcabc" * 200)
    params, losses = train_demo.train(text, hp, steps=60, seq_len=24,
                                      batch=4, lr=1e-2, log=lambda *a: None)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    out = str(tmp_path / "trained.ggcc")
    train_demo.save_ggcc(out, hp, params)
    mf = read_model(out)
    cfg = EngineConfig(n_ctx=64, n_batch=16, kv_dtype="float32",
                       compute_dtype="float32")
    eng = FalconEngine(mf.hparams, load_params(mf, cfg), cfg)
    greedy = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)
    # byte ids are offset by 12 in the demo's byte tokenizer
    prompt = [c + 12 for c in b"abcab"]
    out_ids = eng.generate(prompt, n_predict=6, sampler=greedy)
    # the model must have learned the abc cycle
    text_out = bytes((t - 12) % 256 for t in out_ids)
    assert text_out == b"cabcab", text_out
