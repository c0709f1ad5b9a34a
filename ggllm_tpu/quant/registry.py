"""Dispatch table over quantization codecs (the quantize_fns analogue).

Mirrors the reference's per-type function table (ggml.c:1627-1723) including
vec_dot_type — the activation format each weight format's dot product expects
(legacy types pair with Q8_0/Q8_1, K-quants with Q8_K).
"""

from __future__ import annotations

import numpy as np

from ggllm_tpu.core.dtypes import GGMLType, TYPE_TRAITS
from ggllm_tpu.quant import kquants, legacy

_QUANTIZE = {
    GGMLType.Q4_0: legacy.quantize_q4_0,
    GGMLType.Q4_1: legacy.quantize_q4_1,
    GGMLType.Q5_0: legacy.quantize_q5_0,
    GGMLType.Q5_1: legacy.quantize_q5_1,
    GGMLType.Q8_0: legacy.quantize_q8_0,
    GGMLType.Q8_1: legacy.quantize_q8_1,
    GGMLType.Q2_K: kquants.quantize_q2_K,
    GGMLType.Q3_K: kquants.quantize_q3_K,
    GGMLType.Q4_K: kquants.quantize_q4_K,
    GGMLType.Q5_K: kquants.quantize_q5_K,
    GGMLType.Q6_K: kquants.quantize_q6_K,
    GGMLType.Q8_K: kquants.quantize_q8_K,
}

_DEQUANTIZE = {
    GGMLType.Q4_0: legacy.dequantize_q4_0,
    GGMLType.Q4_1: legacy.dequantize_q4_1,
    GGMLType.Q5_0: legacy.dequantize_q5_0,
    GGMLType.Q5_1: legacy.dequantize_q5_1,
    GGMLType.Q8_0: legacy.dequantize_q8_0,
    GGMLType.Q8_1: legacy.dequantize_q8_1,
    GGMLType.Q2_K: kquants.dequantize_q2_K,
    GGMLType.Q3_K: kquants.dequantize_q3_K,
    GGMLType.Q4_K: kquants.dequantize_q4_K,
    GGMLType.Q5_K: kquants.dequantize_q5_K,
    GGMLType.Q6_K: kquants.dequantize_q6_K,
    GGMLType.Q8_K: kquants.dequantize_q8_K,
}

# activation quant type used by the fused dot product per weight type
_VEC_DOT_TYPE = {
    GGMLType.Q4_0: GGMLType.Q8_0,
    GGMLType.Q4_1: GGMLType.Q8_1,
    GGMLType.Q5_0: GGMLType.Q8_0,
    GGMLType.Q5_1: GGMLType.Q8_1,
    GGMLType.Q8_0: GGMLType.Q8_0,
    GGMLType.Q8_1: GGMLType.Q8_1,
    GGMLType.Q2_K: GGMLType.Q8_K,
    GGMLType.Q3_K: GGMLType.Q8_K,
    GGMLType.Q4_K: GGMLType.Q8_K,
    GGMLType.Q5_K: GGMLType.Q8_K,
    GGMLType.Q6_K: GGMLType.Q8_K,
    GGMLType.Q8_K: GGMLType.Q8_K,
}


def quantize(gtype: GGMLType, x: np.ndarray, native: bool = True) -> np.ndarray:
    """float32 array -> packed uint8 blob in the on-disk block layout.

    Tries the multithreaded C++ codec first (ggllm_tpu.native; bit-identical
    to the Python implementation, tested) and falls back to numpy."""
    if gtype == GGMLType.F32:
        return np.ascontiguousarray(x, dtype=np.float32).reshape(-1).view(np.uint8)
    if gtype == GGMLType.F16:
        return np.ascontiguousarray(x, dtype=np.float32).astype(np.float16).reshape(-1).view(np.uint8)
    if native:
        from ggllm_tpu import native as native_mod

        out = native_mod.quantize(int(gtype), np.asarray(x))
        if out is not None:
            return out
    return _QUANTIZE[gtype](np.asarray(x))


def dequantize(gtype: GGMLType, blob: np.ndarray, n: int, native: bool = True) -> np.ndarray:
    """packed uint8 blob -> float32 array of n elements."""
    blob = np.asarray(blob, dtype=np.uint8)
    if gtype == GGMLType.F32:
        return blob.copy().view(np.float32)[:n]
    if gtype == GGMLType.F16:
        return blob.copy().view(np.float16).astype(np.float32)[:n]
    if native and n % TYPE_TRAITS[gtype].block_size == 0:
        from ggllm_tpu import native as native_mod

        out = native_mod.dequantize(int(gtype), blob, n)
        if out is not None:
            return out
    return _DEQUANTIZE[gtype](blob, n)


def vec_dot_type(gtype: GGMLType) -> GGMLType:
    return _VEC_DOT_TYPE[gtype]


def is_quantized(gtype: GGMLType) -> bool:
    return TYPE_TRAITS[gtype].is_quantized
