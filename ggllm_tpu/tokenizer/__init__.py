"""Tokenizer facade: one interface over the two tokenizer families.

* Falcon GGCC files carry a GPT-2 byte-level BPE vocab + ranked merges
  (tokenizer/bpe.py, libfalcon.cpp:2622-3016);
* LLaMA files carry a SentencePiece-style scored vocab
  (tokenizer/spm.py, llama.cpp:1788-1930).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Tokenizer:
    vocab: object
    arch: str

    @property
    def bos_id(self) -> int:
        from ggllm_tpu.tokenizer import bpe, spm

        return spm.BOS_ID if self.arch == "llama" else bpe.BOS_ID

    @property
    def eos_id(self) -> int:
        from ggllm_tpu.tokenizer import bpe, spm

        return spm.EOS_ID if self.arch == "llama" else bpe.EOS_ID

    def tokenize(self, text: str, bos: bool = False) -> list[int]:
        if self.arch == "llama":
            from ggllm_tpu.tokenizer import spm

            return spm.tokenize(self.vocab, text, bos=bos)
        from ggllm_tpu.tokenizer import bpe

        return bpe.tokenize(self.vocab, text, bos=bos)

    def piece(self, tok: int) -> bytes:
        return self.vocab.id_to_token[tok]

    def detokenize(self, ids) -> bytes:
        return b"".join(self.vocab.id_to_token[int(t)] for t in ids)


def for_model(mf) -> Tokenizer:
    """ModelFile -> Tokenizer matching its architecture."""
    return Tokenizer(vocab=mf.vocab, arch=mf.arch)
