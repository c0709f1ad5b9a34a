"""Tokenizer tests: pretokenizer state machine, BPE merging, byte fallback,
round-trip, special tokens."""

import numpy as np
import pytest

from ggllm_tpu.tokenizer import bpe
from ggllm_tpu.utils.synthetic import make_tiny_vocab


@pytest.fixture(scope="module")
def vocab():
    return make_tiny_vocab(512)


def test_bytes_to_unicode_bijection():
    enc = bpe.bytes_to_unicode()
    dec = bpe.unicode_to_bytes()
    assert len(enc) == 256
    assert len(dec) == 256
    for b, u in enc.items():
        assert dec[u] == b
    # printable ASCII maps to itself
    assert enc[ord("A")] == "A"
    assert enc[0x20] == "Ġ"
    assert enc[0x0A] == "Ċ"


def test_pretokenize_contractions(vocab):
    words = bpe.pretokenize("I'll you're it's", vocab.special_tokens)
    # decoded view for readability
    dec = [bpe.decode_token(w).decode() for w in words]
    assert "'ll" in dec
    assert "'re" in dec
    assert "'s" in dec


def test_pretokenize_classes(vocab):
    dec = [
        bpe.decode_token(w).decode()
        for w in bpe.pretokenize("abc 123 def", vocab.special_tokens)
    ]
    assert dec[0] == "abc"
    assert " 123" in dec
    assert " def" in dec


def test_pretokenize_whitespace_lookahead(vocab):
    dec = [
        bpe.decode_token(w).decode()
        for w in bpe.pretokenize("a   b", vocab.special_tokens)
    ]
    # runs of whitespace collect together; the last space prefixes the word
    assert dec[0] == "a"
    assert dec[-1] == " b"
    assert "".join(dec) == "a   b"


def test_pretokenize_preserves_content(vocab):
    for text in [
        "Hello, world!",
        "  leading and trailing  ",
        "tabs\tand\nnewlines\r\n",
        "unicode: héllo wörld Ω ≈ 3.14 你好",
        "emoji 🦅 falcon",
        "a'sb'tc'red",
    ]:
        words = bpe.pretokenize(text, vocab.special_tokens)
        joined = b"".join(bpe.decode_token(w) for w in words)
        assert joined == text.encode("utf-8"), text


def test_special_token_interception(vocab):
    text = "hello>>SPECIAL_3<<world"
    words = bpe.pretokenize(text, vocab.special_tokens)
    assert ">>SPECIAL_3<<" in words
    ids = bpe.tokenize(vocab, text)
    assert 3 in ids


def test_tokenize_roundtrip(vocab):
    for text in [
        "the theater is in the north",
        "mixed 42 numbers and, punctuation!",
        "ünïcödé ftw 🎉",
        "",
        " ",
        "\n\n",
    ]:
        ids = bpe.tokenize(vocab, text)
        assert bpe.detokenize(vocab, ids) == text.encode("utf-8"), repr(text)


def test_merges_applied(vocab):
    # "the" should merge into one token via t+h -> th, th+e -> the
    ids = bpe.tokenize(vocab, "the")
    assert len(ids) == 1
    assert vocab.id_to_token[ids[0]] == b"the"
    # " the" -> Ġt + he merge path exists too; must round-trip regardless
    ids2 = bpe.tokenize(vocab, " the")
    assert bpe.detokenize(vocab, ids2) == b" the"


def test_byte_fallback(vocab):
    # raw bytes with no merged token must fall back to byte tokens
    ids = bpe.tokenize(vocab, "\x00\x01\xff")
    assert bpe.detokenize(vocab, ids) == "\x00\x01\xff".encode("utf-8")


def test_bos_flag(vocab):
    assert bpe.tokenize(vocab, "x", bos=True)[0] == bpe.BOS_ID
    assert bpe.tokenize(vocab, "", bos=True) == []
