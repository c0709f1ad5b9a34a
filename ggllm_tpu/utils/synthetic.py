"""Synthetic tiny models and vocabs for tests and benchmarks.

No pretrained weights are available in CI; these builders produce structurally
faithful GGCC v10 files (real header/vocab/merges/tensor records) with random
weights, exercising the full load path.
"""

from __future__ import annotations

import numpy as np

from ggllm_tpu.core.config import FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.io.ggcc import GGCCWriter
from ggllm_tpu.tokenizer.bpe import Vocab


def make_tiny_vocab(n_vocab: int = 512) -> Vocab:
    """Vocab: 12 specials, 256 byte tokens, simple merge-derived tokens."""
    assert n_vocab >= 12 + 256
    toks: list[bytes] = []
    for i in range(11):
        toks.append(f">>SPECIAL_{i}<<".encode())
    toks.append(b"<|endoftext|>")  # id 11, BOS/EOS
    for b in range(256):
        toks.append(bytes([b]))
    merges: list[tuple[str, str]] = []
    # merge lowercase pairs: "th", "he", "in", "er", "an", " t" (Ġt) ...
    pairs = [("t", "h"), ("h", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
             ("Ġ", "t"), ("Ġ", "a"), ("th", "e"), ("Ġt", "he"), ("a", "n"),
             ("in", "g"), ("o", "u")]
    for l, r in pairs:
        if len(toks) >= n_vocab:
            break
        merged = (l + r).replace("Ġ", " ").replace("Ċ", "\n")
        if merged.encode() in toks:
            continue
        merges.append((l, r))
        toks.append(merged.encode())
    while len(toks) < n_vocab:
        toks.append(f"<filler_{len(toks)}>".encode())
    return Vocab(id_to_token=toks, scores=[0.0] * len(toks), merges=merges)


def random_falcon_weights(hp: FalconHParams, seed: int = 0) -> dict[str, np.ndarray]:
    """Numpy-convention (out, in) float32 weights with sane magnitudes."""
    rng = np.random.default_rng(seed)
    E, H, KV, D = hp.n_embd, hp.n_head, hp.n_head_kv, hp.head_dim
    V, F, L = hp.n_vocab, hp.n_ff, hp.n_layer

    def w(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    ws = {
        "transformer.word_embeddings.weight": w(V, E, scale=0.02),
        "transformer.ln_f.weight": np.ones(E, np.float32) + w(E, scale=0.02),
        "transformer.ln_f.bias": w(E, scale=0.02),
        "lm_head.weight": w(V, E),
    }
    for i in range(L):
        p = f"transformer.h.{i}"
        if hp.n_falcon_type >= 40:
            ws[f"{p}.ln_mlp.weight"] = np.ones(E, np.float32) + w(E, scale=0.02)
            ws[f"{p}.ln_mlp.bias"] = w(E, scale=0.02)
            ws[f"{p}.ln_attn.weight"] = np.ones(E, np.float32) + w(E, scale=0.02)
            ws[f"{p}.ln_attn.bias"] = w(E, scale=0.02)
        else:
            ws[f"{p}.input_layernorm.weight"] = np.ones(E, np.float32) + w(E, scale=0.02)
            ws[f"{p}.input_layernorm.bias"] = w(E, scale=0.02)
        ws[f"{p}.self_attention.query_key_value.weight"] = w((H + 2 * KV) * D, E)
        ws[f"{p}.self_attention.dense.weight"] = w(E, H * D)
        ws[f"{p}.mlp.dense_h_to_4h.weight"] = w(F, E)
        ws[f"{p}.mlp.dense_4h_to_h.weight"] = w(E, F)
    return ws


def write_tiny_model(
    path: str,
    hp: FalconHParams | None = None,
    ftype_2d: GGMLType = GGMLType.F16,
    seed: int = 0,
) -> FalconHParams:
    """Write a complete GGCC v10 file with random weights."""
    hp = hp or FalconHParams.tiny()
    vocab = make_tiny_vocab(hp.n_vocab)
    hp.n_bpe_merges = len(vocab.merges)
    ws = random_falcon_weights(hp, seed)
    writer = GGCCWriter(path, hp, vocab)
    for name, arr in ws.items():
        gtype = ftype_2d if arr.ndim == 2 else GGMLType.F32
        writer.write_array(name, arr, gtype)
    writer.close()
    return hp


def make_tiny_sp_vocab(n_vocab: int = 512) -> Vocab:
    """SentencePiece-style scored vocab: <unk>/<s>/</s>, 256 byte tokens,
    then multi-char pieces with descending scores (llama vocab shape)."""
    assert n_vocab >= 3 + 256
    toks: list[bytes] = [b"<unk>", b"<s>", b"</s>"]
    scores: list[float] = [0.0, 0.0, 0.0]
    for b in range(256):
        toks.append(bytes([b]))
        scores.append(-1e6)  # byte pieces: lowest priority
    pieces = [" t", "th", "he", " a", "an", "in", "er", " the", "the",
              " an", "ing", "ou", " o", "re", " s", "nd", " and"]
    score = -1.0
    for pc in pieces:
        if len(toks) >= n_vocab:
            break
        if pc.encode() in toks:
            continue
        toks.append(pc.encode())
        scores.append(score)
        score -= 1.0
    while len(toks) < n_vocab:
        toks.append(f"<extra_{len(toks)}>".encode())
        scores.append(-1e6)
    return Vocab(id_to_token=toks, scores=scores, merges=[])


def random_llama_weights(hp, seed: int = 0) -> dict[str, np.ndarray]:
    """Numpy-convention (out, in) float32 LLaMA weights (llama.cpp names)."""
    rng = np.random.default_rng(seed)
    E, H, D = hp.n_embd, hp.n_head, hp.head_dim
    V, F, L = hp.n_vocab, hp.n_ff, hp.n_layer

    def w(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    ws = {
        "tok_embeddings.weight": w(V, E, scale=0.02),
        "norm.weight": np.ones(E, np.float32) + w(E, scale=0.02),
        "output.weight": w(V, E),
    }
    for i in range(L):
        p = f"layers.{i}"
        ws[f"{p}.attention_norm.weight"] = np.ones(E, np.float32) + w(E, scale=0.02)
        ws[f"{p}.ffn_norm.weight"] = np.ones(E, np.float32) + w(E, scale=0.02)
        for k in ("wq", "wk", "wv", "wo"):
            ws[f"{p}.attention.{k}.weight"] = w(E, E)
        ws[f"{p}.feed_forward.w1.weight"] = w(F, E)
        ws[f"{p}.feed_forward.w2.weight"] = w(E, F)
        ws[f"{p}.feed_forward.w3.weight"] = w(F, E)
    return ws


def write_tiny_llama(path: str, hp=None, ftype_2d: GGMLType = GGMLType.F16,
                     seed: int = 0):
    """Write a complete GGJT v3 LLaMA file with random weights."""
    from ggllm_tpu.core.config import LlamaHParams
    from ggllm_tpu.io.ggcc import GGJTWriter

    hp = hp or LlamaHParams.tiny()
    vocab = make_tiny_sp_vocab(hp.n_vocab)
    ws = random_llama_weights(hp, seed)
    writer = GGJTWriter(path, hp, vocab)
    for name, arr in ws.items():
        gtype = ftype_2d if arr.ndim == 2 else GGMLType.F32
        writer.write_array(name, arr, gtype)
    writer.close()
    return hp
