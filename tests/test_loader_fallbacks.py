"""Loader fallbacks: pre-GGCC falcon tokenizer.json merges and legacy
multipart (sharded) model files.

Reference behavior: libfalcon.cpp:880-914 (merges fallback), :656-752 +
:1272-1316 (BY_ROWS / BY_COLUMNS shard assembly, parts named base.1, .2...).
"""

import json
import struct

import numpy as np
import pytest

from ggllm_tpu.core.config import FalconHParams, LlamaHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.io.ggcc import (GGJTWriter, MAGIC_GGMF, read_model)
from ggllm_tpu.tokenizer.bpe import Vocab
from ggllm_tpu.utils.synthetic import (
    make_tiny_sp_vocab, make_tiny_vocab, random_falcon_weights,
    random_llama_weights, write_tiny_model)


def _write_ggmf_falcon(path, hp: FalconHParams, vocab: Vocab, weights: dict):
    """Minimal GGMF v1 falcon file: no merges section, no 32B alignment."""
    with open(path, "wb") as f:
        f.write(struct.pack("<II", MAGIC_GGMF, 1))
        for v in (hp.n_vocab, hp.n_embd, hp.n_head, hp.n_head_kv, hp.n_layer,
                  hp.n_falcon_type, 1):  # ftype MOSTLY_F16
            f.write(struct.pack("<I", v))
        for tok, score in zip(vocab.id_to_token, vocab.scores):
            f.write(struct.pack("<I", len(tok)))
            f.write(tok)
            f.write(struct.pack("<f", score))
        for name, arr in weights.items():
            gtype = GGMLType.F16 if arr.ndim == 2 else GGMLType.F32
            ne = tuple(reversed(arr.shape))
            nm = name.encode()
            f.write(struct.pack("<III", len(ne), len(nm), int(gtype)))
            for d in ne:
                f.write(struct.pack("<I", d))
            f.write(nm)
            data = arr.astype(np.float16 if gtype == GGMLType.F16 else np.float32)
            f.write(data.tobytes())


def test_pre_ggcc_merges_fallback(tmp_path):
    hp = FalconHParams.tiny()
    vocab = make_tiny_vocab(hp.n_vocab)
    merges = vocab.merges
    ws = random_falcon_weights(hp, seed=5)
    path = str(tmp_path / "old.bin")
    _write_ggmf_falcon(path, hp, Vocab(vocab.id_to_token, vocab.scores, []), ws)

    # without tokenizer.json the loader must refuse (silently-broken
    # tokenizer otherwise)
    with pytest.raises(ValueError, match="tokenizer.json"):
        read_model(path)

    with open(tmp_path / "tokenizer.json", "w") as f:
        json.dump({"model": {"merges": [f"{a} {b}" for a, b in merges]}}, f)
    mf = read_model(path)
    assert mf.vocab.merges == merges
    assert mf.hparams.n_bpe_merges == len(merges)

    # tokenization equals a GGCC file with embedded merges
    from ggllm_tpu import tokenizer as tok_mod

    ggcc = str(tmp_path / "new.ggcc")
    write_tiny_model(ggcc, FalconHParams.tiny(), seed=5)
    ids_old = tok_mod.for_model(mf).tokenize("the theatre in there", bos=False)
    ids_new = tok_mod.for_model(read_model(ggcc)).tokenize(
        "the theatre in there", bos=False)
    assert ids_old == ids_new


def test_pre_ggcc_merges_fallback_list_format(tmp_path):
    """tokenizer.json with [[a, b], ...] style merges (newer HF format)."""
    hp = FalconHParams.tiny()
    vocab = make_tiny_vocab(hp.n_vocab)
    ws = random_falcon_weights(hp, seed=5)
    path = str(tmp_path / "old.bin")
    _write_ggmf_falcon(path, hp, Vocab(vocab.id_to_token, vocab.scores, []), ws)
    with open(tmp_path / "tokenizer.json", "w") as f:
        json.dump({"model": {"merges": [[a, b] for a, b in vocab.merges]}}, f)
    assert read_model(path).vocab.merges == vocab.merges


COL_SPLIT = ("tok_embeddings.weight",)
COL_SUBSTR = (".attention.wo.weight", ".feed_forward.w2.weight")


def _write_llama_parts(base: str, hp: LlamaHParams, ws: dict, n_parts: int):
    vocab = make_tiny_sp_vocab(hp.n_vocab)
    writers = [GGJTWriter(base if i == 0 else f"{base}.{i}", hp, vocab)
               for i in range(n_parts)]
    for name, arr in ws.items():
        if arr.ndim == 1:  # duplicated in every part
            for w in writers:
                w.write_array(name, arr, GGMLType.F32)
            continue
        by_cols = name in COL_SPLIT or any(s in name for s in COL_SUBSTR)
        for i, w in enumerate(writers):
            if by_cols:  # ggml ne[0] (numpy last axis) splits
                n = arr.shape[1] // n_parts
                piece = arr[:, i * n:(i + 1) * n]
            else:  # BY_ROWS: ggml ne[1] (numpy first axis) splits
                n = arr.shape[0] // n_parts
                piece = arr[i * n:(i + 1) * n]
            w.write_array(name, np.ascontiguousarray(piece), GGMLType.F16)
    for w in writers:
        w.close()


def test_multipart_llama_matches_single_file(tmp_path):
    hp = LlamaHParams(n_vocab=512, n_embd=128, n_mult=32, n_head=4,
                      n_layer=2, n_rot=32)
    ws = random_llama_weights(hp, seed=17)

    single = str(tmp_path / "single.bin")
    vocab = make_tiny_sp_vocab(hp.n_vocab)
    w = GGJTWriter(single, hp, vocab)
    for name, arr in ws.items():
        w.write_array(name, arr, GGMLType.F16 if arr.ndim == 2 else GGMLType.F32)
    w.close()

    multi = str(tmp_path / "multi.bin")
    _write_llama_parts(multi, hp, ws, n_parts=2)

    mf_s = read_model(single)
    mf_m = read_model(multi)
    assert len(mf_m.paths) == 2
    for name, rec in mf_s.tensors.items():
        assert mf_m.tensors[name].ne == rec.ne, name
        np.testing.assert_array_equal(
            mf_m.tensor_f32(name), mf_s.tensor_f32(name), err_msg=name)


def test_multipart_llama_engine_logits(tmp_path):
    """The assembled multipart model runs and matches the single-file one."""
    from ggllm_tpu.core.config import EngineConfig
    from ggllm_tpu.engine.engine import FalconEngine
    from ggllm_tpu.io.loader import load_params

    hp = LlamaHParams(n_vocab=512, n_embd=128, n_mult=32, n_head=4,
                      n_layer=2, n_rot=32)
    ws = random_llama_weights(hp, seed=19)
    single = str(tmp_path / "s.bin")
    vocab = make_tiny_sp_vocab(hp.n_vocab)
    w = GGJTWriter(single, hp, vocab)
    for name, arr in ws.items():
        w.write_array(name, arr, GGMLType.F16 if arr.ndim == 2 else GGMLType.F32)
    w.close()
    multi = str(tmp_path / "m.bin")
    _write_llama_parts(multi, hp, ws, n_parts=2)

    cfg = EngineConfig(n_ctx=64, n_batch=16, kv_dtype="float32",
                       compute_dtype="float32")
    mf_s, mf_m = read_model(single), read_model(multi)
    e1 = FalconEngine(mf_s.hparams, load_params(mf_s, cfg), cfg)
    e2 = FalconEngine(mf_m.hparams, load_params(mf_m, cfg), cfg)
    l1 = e1.eval([5, 300, 42, 17])
    l2 = e2.eval([5, 300, 42, 17])
    np.testing.assert_allclose(l1, l2, atol=1e-5)
