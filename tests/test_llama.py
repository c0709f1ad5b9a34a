"""LLaMA family tests: GGJT round-trip, arch detection, SP tokenizer,
model forward vs independent numpy reference, merged kernel layout."""

import numpy as np
import pytest

from ggllm_tpu.core.config import EngineConfig, LlamaHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.io.ggcc import read_model
from ggllm_tpu.io.loader import load_params
from ggllm_tpu.tokenizer import spm
from ggllm_tpu.tokenizer.bpe import Vocab
from ggllm_tpu.utils import synthetic
from tests import reference_llama


@pytest.fixture(scope="module")
def llama_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("llm") / "tiny.ggjt")
    hp = synthetic.write_tiny_llama(path, ftype_2d=GGMLType.F16, seed=21)
    return path, hp


def test_ggjt_roundtrip_and_arch_detect(llama_file):
    path, hp = llama_file
    mf = read_model(path)
    assert mf.arch == "llama"
    assert mf.hparams.n_embd == hp.n_embd
    assert mf.hparams.n_rot == hp.n_rot
    assert mf.hparams.n_ff == hp.n_ff
    assert "layers.0.attention.wq.weight" in mf.tensors
    w = mf.tensor_f32("layers.1.feed_forward.w1.weight")
    assert w.shape == (hp.n_ff, hp.n_embd)


def test_falcon_files_still_detect_falcon(tmp_path):
    path = str(tmp_path / "f.ggcc")
    synthetic.write_tiny_model(path, ftype_2d=GGMLType.Q8_0, seed=1)
    assert read_model(path).arch == "falcon"


def test_sp_tokenizer_merge_order():
    # pieces: " t"(-1) "th"(-2) "he"(-3) ... from make_tiny_sp_vocab
    vocab = synthetic.make_tiny_sp_vocab(512)
    tid = {t: i for i, t in enumerate(vocab.id_to_token)}
    ids = spm.tokenize(vocab, " the")
    # " t" merges first (score -1), then " t"+"he"? " the" piece exists
    # (score -8): greedy highest-score-first merging must yield " the"
    assert ids == [tid[b" the"]]
    ids = spm.tokenize(vocab, "the", bos=True)
    assert ids[0] == spm.BOS_ID
    assert ids[1:] == [tid[b"the"]]
    # byte fallback: codepoints never merged emit byte ids (+3)
    ids = spm.tokenize(vocab, "\x07")
    assert ids == [7 + spm.BYTE_OFFSET]
    assert spm.detokenize(vocab, [tid[b" the"]]) == b" the"


def test_sp_tokenizer_score_tiebreak():
    # two competing merges with equal scores -> leftmost first (llama.cpp
    # comparator: score, then left index)
    toks = [b"<unk>", b"<s>", b"</s>"] + [bytes([b]) for b in range(256)]
    scores = [0.0] * 3 + [-1e6] * 256
    for piece, s in ((b"ab", -1.0), (b"bc", -1.0), (b"abc", -2.0)):
        toks.append(piece)
        scores.append(s)
    vocab = Vocab(id_to_token=toks, scores=scores, merges=[])
    tid = {t: i for i, t in enumerate(toks)}
    assert spm.tokenize(vocab, "abc") == [tid[b"abc"]]  # ab then ab+c
    assert spm.tokenize(vocab, "abbc") == [tid[b"ab"], tid[b"bc"]]


def test_llama_forward_matches_numpy(llama_file):
    path, hp = llama_file
    mf = read_model(path)
    weights = {name: mf.tensor_f32(name) for name in mf.tensors}
    tokens = [5, 300, 42, 17, 260, 99]
    ref = reference_llama.forward(weights, mf.hparams, tokens)

    cfg = EngineConfig(n_ctx=32, n_batch=8, kv_dtype="float32",
                       compute_dtype="float32", kernel_layout=False)
    eng = FalconEngine(mf.hparams, load_params(mf, cfg), cfg)
    got = eng.eval(tokens, logits_all=True)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-3)

    # decode step continues consistently
    ref_next = reference_llama.forward(weights, mf.hparams, tokens + [7])[-1]
    got_next = eng.eval([7])
    np.testing.assert_allclose(got_next / scale, ref_next / scale, atol=2e-3)


def test_llama_merged_kernel_layout_matches_split(llama_file):
    path, hp = llama_file
    mf = read_model(path)
    cfg_split = EngineConfig(n_ctx=32, n_batch=8, kv_dtype="float32",
                             compute_dtype="float32", kernel_layout=False)
    cfg_merged = EngineConfig(n_ctx=32, n_batch=8, kv_dtype="float32",
                              compute_dtype="float32", kernel_layout=True)
    # F16 2-D weights stay dense under "fused"; use a quantized file for
    # the kernel path
    qpath = path + ".q8"
    synthetic.write_tiny_llama(qpath, ftype_2d=GGMLType.Q8_0, seed=21)
    mfq = read_model(qpath)

    p_split = load_params(mfq, cfg_split)
    p_merged = load_params(mfq, cfg_merged)
    assert isinstance(p_merged["layers"], list)
    assert "wqkv" in p_merged["layers"][0] and "w13" in p_merged["layers"][0]

    prompt = [5, 300, 42, 17]
    e1 = FalconEngine(mfq.hparams, p_split, cfg_split)
    e2 = FalconEngine(mfq.hparams, p_merged, cfg_merged)
    l1, l2 = e1.eval(prompt), e2.eval(prompt)
    scale = np.abs(l1).max() + 1e-6
    np.testing.assert_allclose(l2 / scale, l1 / scale, atol=5e-5)


def test_llama_fused_generate(llama_file):
    """Greedy generation hits the fused decode loop (regression: llama_forward
    once lacked the psum_axis kwarg the loop passes)."""
    from ggllm_tpu.ops import sampling

    path, hp = llama_file
    mf = read_model(path)
    cfg = EngineConfig(n_ctx=48, n_batch=8, kv_dtype="float32",
                       compute_dtype="float32")
    eng = FalconEngine(mf.hparams, load_params(mf, cfg), cfg)
    greedy = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)
    out = eng.generate([5, 300, 42], n_predict=8, sampler=greedy)
    assert len(out) == 8
