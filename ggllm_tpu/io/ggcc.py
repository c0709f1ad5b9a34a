"""GGCC / GGJT / GGMF / GGML model file reader and GGCC v10 writer.

File format parity with the reference loader/saver (libfalcon.cpp:770-1052):

header        magic u32 ('ggcc'=0x67676363), version u32 (10)
hparams       n_vocab, n_embd, n_head, n_head_kv, n_layer, n_falcon_type,
              ftype, [n_bpe_merges if GGCC]   (all u32)
vocab         n_vocab x { len u32, bytes, score f32 }
merges        [GGCC only] count u32, count x { len1 u32, str1, len2 u32, str2 }
tensors       repeated { n_dims u32, name_len u32, type u32, ne u32[n_dims],
              name bytes, pad to 32B (GGJT+), raw data }

Note on shapes: ne[] is in ggml order (ne[0] = contiguous row length). A ggml
2-D tensor [ne0, ne1] corresponds to numpy shape (ne1, ne0); TensorRecord
keeps ggml order in `ne` and exposes numpy convention via `shape`.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from ggllm_tpu.core.config import FalconHParams, LlamaHParams
from ggllm_tpu.core.dtypes import FType, GGMLType, row_nbytes
from ggllm_tpu.quant import registry
from ggllm_tpu.tokenizer.bpe import Vocab

MAGIC_GGML = 0x67676D6C
MAGIC_GGMF = 0x67676D66
MAGIC_GGJT = 0x67676A74
MAGIC_GGCC = 0x67676363

GGCC_VERSION = 10

# internal version lattice, mirroring llama_file_version
V_GGML = 0
V_GGMF_1 = 1
V_GGJT_1 = 2
V_GGJT_2 = 3
V_GGJT_3 = 4
V_GGCC_1 = 5


@dataclass
class TensorRecord:
    name: str
    gtype: GGMLType
    ne: tuple  # ggml dim order: ne[0] is the contiguous (row) dim
    offset: int  # byte offset of data in file
    nbytes: int

    @property
    def shape(self) -> tuple:
        """numpy-convention shape (row-major, last dim contiguous)."""
        return tuple(reversed(self.ne))

    @property
    def n_elements(self) -> int:
        n = 1
        for d in self.ne:
            n *= d
        return n


@dataclass
class ModelFile:
    path: str
    version: int
    hparams: FalconHParams | LlamaHParams
    vocab: Vocab
    tensors: dict[str, TensorRecord] = field(default_factory=dict)

    @property
    def arch(self) -> str:
        return self.hparams.arch

    _mm: np.memmap = None

    def _data(self) -> np.memmap:
        if self._mm is None:
            self._mm = np.memmap(self.path, dtype=np.uint8, mode="r")
        return self._mm

    def tensor_blob(self, name: str) -> np.ndarray:
        """Raw packed bytes of a tensor (zero-copy view of the mmap)."""
        t = self.tensors[name]
        return self._data()[t.offset : t.offset + t.nbytes]

    def tensor_f32(self, name: str) -> np.ndarray:
        """Dequantized float32 tensor in numpy-convention shape."""
        t = self.tensors[name]
        return registry.dequantize(t.gtype, self.tensor_blob(name), t.n_elements).reshape(t.shape)

    def close(self):
        self._mm = None


def _read_u32(f) -> int:
    return struct.unpack("<I", f.read(4))[0]


def _read_f32(f) -> float:
    return struct.unpack("<f", f.read(4))[0]


def _detect_arch(version: int, raw: tuple) -> str:
    """Pre-GGCC files carry 7 u32 hparams for BOTH model families; the
    reference disambiguates by binary (llama.cpp vs libfalcon.cpp). Here:
    llama iff field5 == n_embd // field3 (n_rot == head_dim); falcon iff
    field5 in {7, 40, 180} (n_falcon_type)."""
    n_vocab, n_embd, f2, f3, f4, f5, ftype = raw
    if f5 in (7, 40, 180) and f2 and n_embd % f2 == 0:
        return "falcon"
    if f3 and n_embd % f3 == 0 and f5 == n_embd // f3:
        return "llama"
    return "falcon"


def read_model(path: str | Path, load_merges: bool = True,
               arch: str = "auto") -> ModelFile:
    """Parse a model file's header, vocab, merges and tensor metadata.

    arch: "auto" (GGCC -> falcon; pre-GGCC -> heuristic over the 7-field
    hparams header), or explicit "falcon"/"llama"."""
    path = str(path)
    fsize = Path(path).stat().st_size
    with open(path, "rb") as f:
        magic = _read_u32(f)
        if magic == MAGIC_GGML:
            version = V_GGML
        else:
            ver = _read_u32(f)
            if magic == MAGIC_GGMF and ver == 1:
                version = V_GGMF_1
            elif magic == MAGIC_GGJT and ver in (1, 2, 3):
                version = V_GGJT_1 + (ver - 1)
            elif magic == MAGIC_GGCC and ver == GGCC_VERSION:
                version = V_GGCC_1
            else:
                raise ValueError(
                    f"unknown (magic, version): {magic:08x}, is this a GGML/GGCC file?"
                )

        raw = struct.unpack("<7I", f.read(28))
        # quantized block layouts changed at GGJT v2 (Q4/Q8, PR #1405) and
        # again at v3 (Q5/Q8, PR #1508); the reference refuses older files
        # (llama.cpp:1091-1105) — without this guard they load as garbage
        ftype = raw[6]
        if version < V_GGJT_2 and ftype not in (
                int(FType.ALL_F32), int(FType.MOSTLY_F16), int(FType.MOSTLY_Q8_0)):
            raise ValueError(
                f"{path}: pre-GGJT-v2 quantized file (ftype={ftype}) uses an "
                "obsolete block layout and is no longer supported; requantize "
                "from the original weights")
        if version < V_GGJT_3 and ftype in (
                int(FType.MOSTLY_Q4_0), int(FType.MOSTLY_Q4_1), int(FType.MOSTLY_Q8_0)):
            raise ValueError(
                f"{path}: pre-GGJT-v3 quantized file (ftype={ftype}) uses an "
                "obsolete block layout and is no longer supported; requantize "
                "from the original weights")
        if version >= V_GGCC_1:
            arch = "falcon"
        elif arch == "auto":
            arch = _detect_arch(version, raw)

        if arch == "llama":
            hp = LlamaHParams(
                n_vocab=raw[0], n_embd=raw[1], n_mult=raw[2], n_head=raw[3],
                n_layer=raw[4], n_rot=raw[5], ftype=raw[6],
            )
        else:
            hp = FalconHParams(
                n_vocab=raw[0], n_embd=raw[1], n_head=raw[2], n_head_kv=raw[3],
                n_layer=raw[4], n_falcon_type=raw[5], ftype=raw[6],
                n_bpe_merges=0,
            )
        if version >= V_GGCC_1:
            hp.n_bpe_merges = _read_u32(f)

        id_to_token: list[bytes] = []
        scores: list[float] = []
        for _ in range(hp.n_vocab):
            ln = _read_u32(f)
            tok = f.read(ln)
            score = _read_f32(f) if version >= V_GGMF_1 else 0.0
            id_to_token.append(tok)
            scores.append(score)

        # wizard-vocab hack: shave the trailing [PAD] token (libfalcon.cpp:861-868)
        if version >= V_GGJT_3 and hp.n_vocab == 65025 and id_to_token[65024] == b"[PAD]":
            id_to_token = id_to_token[:65024]
            scores = scores[:65024]
            hp.n_vocab = 65024

        merges: list[tuple[str, str]] = []
        if version >= V_GGCC_1 and load_merges:
            n_merges = _read_u32(f)
            for _ in range(n_merges):
                l1 = _read_u32(f)
                w1 = f.read(l1).decode("utf-8")
                l2 = _read_u32(f)
                w2 = f.read(l2).decode("utf-8")
                merges.append((w1, w2))

        vocab = Vocab(id_to_token=id_to_token, scores=scores, merges=merges)

        model = ModelFile(path=path, version=version, hparams=hp, vocab=vocab)

        # tensor metadata
        while f.tell() < fsize:
            n_dims = _read_u32(f)
            name_len = _read_u32(f)
            gtype = GGMLType(_read_u32(f))
            ne = tuple(struct.unpack(f"<{n_dims}I", f.read(4 * n_dims)))
            name = f.read(name_len).decode("utf-8")
            if n_dims < 1 or n_dims > 2:
                raise ValueError(f"tensor '{name}' has unsupported n_dims={n_dims}")
            if version >= V_GGJT_1:
                f.seek(-f.tell() & 31, 1)  # align to 32 bytes
            offset = f.tell()
            nbytes = row_nbytes(gtype, ne[0]) * (ne[1] if n_dims == 2 else 1)
            model.tensors[name] = TensorRecord(name, gtype, ne, offset, nbytes)
            f.seek(nbytes, 1)

    return model


class GGJTWriter:
    """Streaming GGJT v3 writer for LLaMA-family files (the legacy llama.cpp
    on-disk format; hparams order per llama.cpp:124-133)."""

    def __init__(self, path: str | Path, hparams: LlamaHParams, vocab: Vocab):
        self.f = open(path, "wb")
        self.f.write(struct.pack("<II", MAGIC_GGJT, 3))
        for v in (hparams.n_vocab, hparams.n_embd, hparams.n_mult,
                  hparams.n_head, hparams.n_layer, hparams.n_rot, hparams.ftype):
            self.f.write(struct.pack("<I", v))
        for tok, score in zip(vocab.id_to_token, vocab.scores):
            self.f.write(struct.pack("<I", len(tok)))
            self.f.write(tok)
            self.f.write(struct.pack("<f", score))

    write_tensor = None  # assigned below (shared with GGCCWriter)

    def close(self):
        self.f.close()


class GGCCWriter:
    """Streaming GGCC v10 writer (llama_file_saver, libfalcon.cpp:975-1052)."""

    def __init__(self, path: str | Path, hparams: FalconHParams, vocab: Vocab):
        self.f = open(path, "wb")
        self._write_header(hparams)
        self._write_vocab(vocab)

    def _u32(self, v: int):
        self.f.write(struct.pack("<I", v))

    def _write_header(self, hp: FalconHParams):
        self._u32(MAGIC_GGCC)
        self._u32(GGCC_VERSION)
        for v in (hp.n_vocab, hp.n_embd, hp.n_head, hp.n_head_kv, hp.n_layer,
                  hp.n_falcon_type, hp.ftype, hp.n_bpe_merges):
            self._u32(v)

    def _write_vocab(self, vocab: Vocab):
        for tok, score in zip(vocab.id_to_token, vocab.scores):
            self._u32(len(tok))
            self.f.write(tok)
            self.f.write(struct.pack("<f", score))
        self._u32(len(vocab.merges))
        for w1, w2 in vocab.merges:
            b1, b2 = w1.encode("utf-8"), w2.encode("utf-8")
            self._u32(len(b1))
            self.f.write(b1)
            self._u32(len(b2))
            self.f.write(b2)

    def write_tensor(self, name: str, gtype: GGMLType, ne: tuple, blob: np.ndarray):
        """ne in ggml dim order; blob = packed bytes from quant.registry."""
        expected = row_nbytes(gtype, ne[0]) * (ne[1] if len(ne) == 2 else 1)
        assert blob.nbytes == expected, f"{name}: {blob.nbytes} != {expected}"
        nm = name.encode("utf-8")
        self._u32(len(ne))
        self._u32(len(nm))
        self._u32(int(gtype))
        for d in ne:
            self._u32(d)
        self.f.write(nm)
        pad = -self.f.tell() & 31
        self.f.write(b"\x00" * pad)
        self.f.write(np.ascontiguousarray(blob, dtype=np.uint8).tobytes())

    def write_array(self, name: str, arr: np.ndarray, gtype: GGMLType):
        """Quantize a numpy-convention float array and write it."""
        ne = tuple(reversed(arr.shape))
        blob = registry.quantize(gtype, arr.astype(np.float32))
        self.write_tensor(name, gtype, ne, blob)

    def close(self):
        self.f.close()


# GGJT tensor records share the GGCC layout (32-byte aligned data)
GGJTWriter.write_tensor = GGCCWriter.write_tensor
GGJTWriter._u32 = GGCCWriter._u32
GGJTWriter.write_array = GGCCWriter.write_array
