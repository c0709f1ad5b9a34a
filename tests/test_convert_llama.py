"""HF LLaMA -> GGJT converter end-to-end: logits must match the HF
transformers forward (rope permutation, name mapping, vocab parsing)."""

import struct

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ggllm_tpu.core.config import EngineConfig  # noqa: E402
from ggllm_tpu.engine.engine import FalconEngine  # noqa: E402
from ggllm_tpu.io import convert_hf_llama  # noqa: E402
from ggllm_tpu.io.ggcc import read_model  # noqa: E402
from ggllm_tpu.io.loader import load_params  # noqa: E402
from ggllm_tpu.tokenizer import spm  # noqa: E402


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def write_sp_model(path, pieces, scores):
    out = bytearray()
    for p, s in zip(pieces, scores):
        sub = b"\x0a" + _varint(len(p)) + p + b"\x15" + struct.pack("<f", s)
        out += b"\x0a" + _varint(len(sub)) + sub
    path.write_bytes(out)


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hfllama")
    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=352,
        num_attention_heads=4, num_hidden_layers=2, rms_norm_eps=1e-6,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    model.save_pretrained(str(d), safe_serialization=True)

    pieces = [b"<unk>", b"<s>", b"</s>"]
    scores = [0.0, 0.0, 0.0]
    for b in range(256):
        pieces.append(f"<0x{b:02X}>".encode())
        scores.append(-1e6)
    # include merge intermediates so "▁the" is reachable greedily
    for i, pc in enumerate(["▁t", "▁th", "▁the", "th", "he", "▁a"]):
        pieces.append(pc.encode())
        scores.append(-1.0 - i)
    while len(pieces) < 512:
        pieces.append(f"<extra_{len(pieces)}>".encode())
        scores.append(-1e6)
    write_sp_model(d / "tokenizer.model", pieces, scores)
    return d, model


def test_convert_and_forward_matches_hf(hf_dir, tmp_path):
    d, hf_model = hf_dir
    out = str(tmp_path / "m.ggjt")
    hp = convert_hf_llama.convert(str(d), out, ftype="f32", log=lambda *a: None)
    assert hp.n_ff == 352

    mf = read_model(out)
    assert mf.arch == "llama"
    # vocab parsed from the hand-written sentencepiece protobuf
    assert mf.vocab.id_to_token[3] == b"\x00"
    assert mf.vocab.id_to_token[261] == " the".encode()

    tokens = [5, 300, 42, 17, 260]
    with torch.no_grad():
        ref = hf_model(torch.tensor([tokens])).logits[0].numpy()

    cfg = EngineConfig(n_ctx=32, n_batch=8, kv_dtype="float32",
                       compute_dtype="float32", kernel_layout=False)
    eng = FalconEngine(mf.hparams, load_params(mf, cfg), cfg)
    got = eng.eval(tokens, logits_all=True)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=3e-3)


def test_convert_meta_pth_matches_hf(hf_dir, tmp_path):
    """Meta .pth input path: build a 2-way model-parallel Meta-layout
    checkpoint from the HF model (inverse rope permutation, ggml-native
    names, per-family shard splits) and require the same logits."""
    d, hf_model = hf_dir
    meta = tmp_path / "meta"
    meta.mkdir()

    # Meta's interleaved-pair rotary layout IS the ggml layout, i.e. the
    # converter's HF->ggml permutation applied to the HF rows
    from ggllm_tpu.io.convert_hf_llama import permute_rope as unpermute

    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    full = {"tok_embeddings.weight": sd["model.embed_tokens.weight"],
            "norm.weight": sd["model.norm.weight"],
            "output.weight": sd["lm_head.weight"],
            "rope.freqs": np.ones(16, np.float32)}
    for i in range(2):
        p = f"model.layers.{i}."
        full[f"layers.{i}.attention.wq.weight"] = unpermute(sd[p + "self_attn.q_proj.weight"], 4)
        full[f"layers.{i}.attention.wk.weight"] = unpermute(sd[p + "self_attn.k_proj.weight"], 4)
        full[f"layers.{i}.attention.wv.weight"] = sd[p + "self_attn.v_proj.weight"]
        full[f"layers.{i}.attention.wo.weight"] = sd[p + "self_attn.o_proj.weight"]
        full[f"layers.{i}.feed_forward.w1.weight"] = sd[p + "mlp.gate_proj.weight"]
        full[f"layers.{i}.feed_forward.w2.weight"] = sd[p + "mlp.down_proj.weight"]
        full[f"layers.{i}.feed_forward.w3.weight"] = sd[p + "mlp.up_proj.weight"]
        full[f"layers.{i}.attention_norm.weight"] = sd[p + "input_layernorm.weight"]
        full[f"layers.{i}.ffn_norm.weight"] = sd[p + "post_attention_layernorm.weight"]

    from ggllm_tpu.io.convert_hf_llama import _meta_shard_axis
    shard0, shard1 = {}, {}
    for name, w in full.items():
        axis = _meta_shard_axis(name) if name != "rope.freqs" else None
        if axis is None:
            shard0[name] = torch.tensor(w)
            shard1[name] = torch.tensor(w)
        else:
            h0, h1 = np.split(w, 2, axis=axis)
            shard0[name] = torch.tensor(np.ascontiguousarray(h0))
            shard1[name] = torch.tensor(np.ascontiguousarray(h1))
    torch.save(shard0, str(meta / "consolidated.00.pth"))
    torch.save(shard1, str(meta / "consolidated.01.pth"))
    # vocab_size=-1 exercises the derive-from-embedding path; tokenizer.model
    # lives in the parent dir as in Meta distributions
    (meta / "params.json").write_text(
        '{"dim": 128, "multiple_of": 32, "n_heads": 4, "n_layers": 2,'
        ' "norm_eps": 1e-06, "vocab_size": -1}')
    import shutil
    shutil.copy(d / "tokenizer.model", tmp_path / "tokenizer.model")

    out = str(tmp_path / "meta.ggjt")
    hp = convert_hf_llama.convert_pth(str(meta), out, ftype="f32", log=lambda *a: None)
    assert hp.n_vocab == 512 and hp.n_ff == 352

    mf = read_model(out)
    tokens = [5, 300, 42, 17, 260]
    with torch.no_grad():
        ref = hf_model(torch.tensor([tokens])).logits[0].numpy()
    cfg = EngineConfig(n_ctx=32, n_batch=8, kv_dtype="float32",
                       compute_dtype="float32", kernel_layout=False)
    eng = FalconEngine(mf.hparams, load_params(mf, cfg), cfg)
    got = eng.eval(tokens, logits_all=True)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=3e-3)


def test_sp_vocab_tokenizes(hf_dir, tmp_path):
    d, _ = hf_dir
    out = str(tmp_path / "m2.ggjt")
    convert_hf_llama.convert(str(d), out, ftype="f32", log=lambda *a: None)
    mf = read_model(out)
    ids = spm.tokenize(mf.vocab, " the")
    assert ids == [261]  # the "▁the" piece via ▁t -> ▁th -> ▁the merges
    assert spm.detokenize(mf.vocab, ids) == b" the"
