"""Quantization round-trip and dot-product error tests.

Mirrors the reference test protocol (tests/test-quantize-fns.cpp:16-20,26-90):
synthetic data 0.1 + 2*cos(i + offset), error = sqrt(sum(diff^2)) / n, with
the same per-bit-width thresholds.
"""

import numpy as np
import pytest

from ggllm_tpu.core.dtypes import GGMLType, TYPE_TRAITS, row_nbytes
from ggllm_tpu.quant import registry

MAX_TOTAL_ERROR = 0.002
MAX_TOTAL_ERROR_2BITS = 0.0075
MAX_TOTAL_ERROR_3BITS = 0.0040
MAX_DOT_PRODUCT_ERROR = 0.02

TEST_SIZE = 32 * 128

QUANT_TYPES = [
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q8_0,
    GGMLType.Q8_1,
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
    GGMLType.Q8_K,
]

THRESHOLD = {
    GGMLType.Q2_K: MAX_TOTAL_ERROR_2BITS,
    GGMLType.Q3_K: MAX_TOTAL_ERROR_3BITS,
}


def generate_data(offset: float, n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float32)
    return (0.1 + 2.0 * np.cos(i + np.float32(offset))).astype(np.float32)


def array_rmse(a: np.ndarray, b: np.ndarray) -> float:
    d = a.astype(np.float64) - b.astype(np.float64)
    return float(np.sqrt(np.sum(d * d)) / a.size)


@pytest.mark.parametrize("gtype", QUANT_TYPES, ids=lambda t: TYPE_TRAITS[t].name)
def test_roundtrip_error(gtype):
    data = generate_data(0.0, TEST_SIZE)
    blob = registry.quantize(gtype, data)
    assert blob.dtype == np.uint8
    assert blob.size == row_nbytes(gtype, TEST_SIZE)
    out = registry.dequantize(gtype, blob, TEST_SIZE)
    err = array_rmse(data, out)
    thr = THRESHOLD.get(gtype, MAX_TOTAL_ERROR)
    assert err < thr, f"{TYPE_TRAITS[gtype].name}: rmse {err} >= {thr}"


@pytest.mark.parametrize("gtype", QUANT_TYPES, ids=lambda t: TYPE_TRAITS[t].name)
def test_dot_product_error(gtype):
    """Quantize both operands, dot in f32 after dequant, compare to exact.

    The reference computes the dot in integer domain; dequantized-f32 dot is
    numerically at least as accurate, so the same threshold applies.
    """
    a = generate_data(0.0, TEST_SIZE)
    b = generate_data(1.0, TEST_SIZE)
    dot_type = registry.vec_dot_type(gtype)
    qa = registry.dequantize(gtype, registry.quantize(gtype, a), TEST_SIZE)
    qb = registry.dequantize(dot_type, registry.quantize(dot_type, b), TEST_SIZE)
    dot = float(np.dot(qa.astype(np.float64), qb.astype(np.float64)))
    ref = float(np.dot(a.astype(np.float64), b.astype(np.float64)))
    err = abs(dot - ref) / TEST_SIZE
    assert err < MAX_DOT_PRODUCT_ERROR, f"{TYPE_TRAITS[gtype].name}: dot err {err}"


@pytest.mark.parametrize("gtype", QUANT_TYPES, ids=lambda t: TYPE_TRAITS[t].name)
def test_quantize_deterministic(gtype):
    data = generate_data(0.5, TEST_SIZE)
    b1 = registry.quantize(gtype, data)
    b2 = registry.quantize(gtype, data)
    assert np.array_equal(b1, b2)


def test_f16_f32_passthrough():
    data = generate_data(0.25, 64)
    b32 = registry.quantize(GGMLType.F32, data)
    assert np.array_equal(registry.dequantize(GGMLType.F32, b32, 64), data)
    b16 = registry.quantize(GGMLType.F16, data)
    out = registry.dequantize(GGMLType.F16, b16, 64)
    assert np.array_equal(out, data.astype(np.float16).astype(np.float32))
