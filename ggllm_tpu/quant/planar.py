"""Planar (struct-of-arrays) device layout for quantized weights.

The on-disk GGCC layout interleaves scales and quants per block (good for CPU
streaming, bad for TPU vectorization). At load time each quantized 2-D weight
is split into a few contiguous planes — packed integer codes plus float scale
planes — so Pallas kernels and XLA dequant read dense, tile-aligned arrays.

Scale hierarchies of the K-quants are flattened at load: the 4/6-bit packed
sub-block scales are decoded once on host into per-subgroup effective scales
(d * sc, dmin * m), which is exact in float32 (products of fp16 values).
This trades ~0.1-0.25 bits/weight of HBM for removing all scale unpacking
from the hot kernels.

Plane shapes use `rows` = output features, `nb` = blocks along the input
(contraction) axis, matching the ggml row layout (a row is one output
feature's weights).
"""

from __future__ import annotations

import numpy as np

from ggllm_tpu.core.dtypes import QK_K, GGMLType, TYPE_TRAITS
from ggllm_tpu.quant.kquants import _q3k_decode_scales, _unpack_scales_k4


def _blocks(blob: np.ndarray, rows: int, type_size: int) -> np.ndarray:
    return np.asarray(blob, dtype=np.uint8).reshape(rows, -1, type_size)


def to_planes(gtype: GGMLType, blob: np.ndarray, rows: int, cols: int) -> dict[str, np.ndarray]:
    """Packed row-major blob -> dict of planes. cols = input dim (blocked)."""
    ts = TYPE_TRAITS[gtype].type_size
    b = _blocks(blob, rows, ts)
    nb = b.shape[1]
    assert nb * TYPE_TRAITS[gtype].block_size == cols, (gtype, rows, cols, nb)

    if gtype == GGMLType.Q4_0:
        return {
            "d": b[:, :, 0:2].copy().view(np.float16)[..., 0].astype(np.float32),
            "qs": b[:, :, 2:18].copy(),
        }
    if gtype == GGMLType.Q4_1:
        return {
            "d": b[:, :, 0:2].copy().view(np.float16)[..., 0].astype(np.float32),
            "m": b[:, :, 2:4].copy().view(np.float16)[..., 0].astype(np.float32),
            "qs": b[:, :, 4:20].copy(),
        }
    if gtype == GGMLType.Q5_0:
        return {
            "d": b[:, :, 0:2].copy().view(np.float16)[..., 0].astype(np.float32),
            "qh": b[:, :, 2:6].copy().view(np.uint32)[..., 0],
            "qs": b[:, :, 6:22].copy(),
        }
    if gtype == GGMLType.Q5_1:
        return {
            "d": b[:, :, 0:2].copy().view(np.float16)[..., 0].astype(np.float32),
            "m": b[:, :, 2:4].copy().view(np.float16)[..., 0].astype(np.float32),
            "qh": b[:, :, 4:8].copy().view(np.uint32)[..., 0],
            "qs": b[:, :, 8:24].copy(),
        }
    if gtype == GGMLType.Q8_0:
        return {
            "d": b[:, :, 0:2].copy().view(np.float16)[..., 0].astype(np.float32),
            "qs": b[:, :, 2:34].copy().view(np.int8),
        }
    if gtype == GGMLType.Q2_K:
        sc = b[:, :, 0:16]
        d = b[:, :, 80:82].copy().view(np.float16)[..., 0].astype(np.float32)
        dmin = b[:, :, 82:84].copy().view(np.float16)[..., 0].astype(np.float32)
        return {
            "qs": b[:, :, 16:80].copy(),
            "dl": d[..., None] * (sc & 0xF).astype(np.float32),
            "ml": dmin[..., None] * (sc >> 4).astype(np.float32),
        }
    if gtype == GGMLType.Q3_K:
        d = b[:, :, 108:110].copy().view(np.float16)[..., 0].astype(np.float32)
        sc = _q3k_decode_scales(b[:, :, 96:108].reshape(-1, 12)).reshape(rows, nb, 16)
        return {
            "hmask": b[:, :, 0:32].copy(),
            "qs": b[:, :, 32:96].copy(),
            "dl": d[..., None] * sc.astype(np.float32),
        }
    if gtype == GGMLType.Q4_K:
        d = b[:, :, 0:2].copy().view(np.float16)[..., 0].astype(np.float32)
        dmin = b[:, :, 2:4].copy().view(np.float16)[..., 0].astype(np.float32)
        sd, sm = _unpack_scales_k4(b[:, :, 4:16].reshape(-1, 12))
        sd = sd.reshape(rows, nb, 8)
        sm = sm.reshape(rows, nb, 8)
        return {
            "qs": b[:, :, 16:144].copy(),
            "dl": d[..., None] * sd.astype(np.float32),
            "ml": dmin[..., None] * sm.astype(np.float32),
        }
    if gtype == GGMLType.Q5_K:
        d = b[:, :, 0:2].copy().view(np.float16)[..., 0].astype(np.float32)
        dmin = b[:, :, 2:4].copy().view(np.float16)[..., 0].astype(np.float32)
        sd, sm = _unpack_scales_k4(b[:, :, 4:16].reshape(-1, 12))
        sd = sd.reshape(rows, nb, 8)
        sm = sm.reshape(rows, nb, 8)
        return {
            "qh": b[:, :, 16:48].copy(),
            "qs": b[:, :, 48:176].copy(),
            "dl": d[..., None] * sd.astype(np.float32),
            "ml": dmin[..., None] * sm.astype(np.float32),
        }
    if gtype == GGMLType.Q6_K:
        d = b[:, :, 208:210].copy().view(np.float16)[..., 0].astype(np.float32)
        sc = b[:, :, 192:208].copy().view(np.int8)
        return {
            "ql": b[:, :, 0:128].copy(),
            "qh": b[:, :, 128:192].copy(),
            "dl": d[..., None] * sc.astype(np.float32),
        }
    raise NotImplementedError(f"no planar layout for {gtype}")
