"""Planar (struct-of-arrays) device layout for quantized weights.

The on-disk GGCC layout interleaves scales and quants per block (good for CPU
streaming, bad for TPU vectorization). At load time each quantized 2-D weight
is split into a few contiguous planes — packed integer codes plus float scale
planes — so Pallas kernels and XLA dequant read dense, tile-aligned arrays.

K-quant scale hierarchies stay TWO-LEVEL: the fp16 super-block scales are
kept as raw bit patterns ("d"/"dmin" int16 planes) and the packed 4/6-bit
sub-scales are decoded once on host to small integer planes ("sc"/"scm").
Consumers form the exact effective scale d * sc in f32 on the fly — the
same value the reference computes — at ~0.6 bits/weight instead of the
2-4 bits/weight that flattened f32 products would cost in HBM.

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
        return {
            "qs": b[:, :, 16:80].copy(),
            "d": b[:, :, 80:82].copy().view(np.int16)[..., 0],
            "dmin": b[:, :, 82:84].copy().view(np.int16)[..., 0],
            "scb": b[:, :, 0:16].copy(),  # packed 4-bit scale | 4-bit min
        }
    if gtype == GGMLType.Q3_K:
        sc = _q3k_decode_scales(b[:, :, 96:108].reshape(-1, 12)).reshape(rows, nb, 16)
        return {
            "hmask": b[:, :, 0:32].copy(),
            "qs": b[:, :, 32:96].copy(),
            "d": b[:, :, 108:110].copy().view(np.int16)[..., 0],
            "sc": sc.astype(np.int8),  # 6-bit signed (bias-32 applied)
        }
    if gtype == GGMLType.Q4_K:
        sd, sm = _unpack_scales_k4(b[:, :, 4:16].reshape(-1, 12))
        return {
            "qs": b[:, :, 16:144].copy(),
            "d": b[:, :, 0:2].copy().view(np.int16)[..., 0],
            "dmin": b[:, :, 2:4].copy().view(np.int16)[..., 0],
            "sc": sd.reshape(rows, nb, 8).astype(np.int8),  # 6-bit
            "scm": sm.reshape(rows, nb, 8).astype(np.int8),
        }
    if gtype == GGMLType.Q5_K:
        sd, sm = _unpack_scales_k4(b[:, :, 4:16].reshape(-1, 12))
        return {
            "qh": b[:, :, 16:48].copy(),
            "qs": b[:, :, 48:176].copy(),
            "d": b[:, :, 0:2].copy().view(np.int16)[..., 0],
            "dmin": b[:, :, 2:4].copy().view(np.int16)[..., 0],
            "sc": sd.reshape(rows, nb, 8).astype(np.int8),
            "scm": sm.reshape(rows, nb, 8).astype(np.int8),
        }
    if gtype == GGMLType.Q6_K:
        return {
            "ql": b[:, :, 0:128].copy(),
            "qh": b[:, :, 128:192].copy(),
            "d": b[:, :, 208:210].copy().view(np.int16)[..., 0],
            "sc": b[:, :, 192:208].copy().view(np.int8),  # int8 per 16
        }
    raise NotImplementedError(f"no planar layout for {gtype}")
