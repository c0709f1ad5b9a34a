"""Native (C++) codec parity vs the Python reference codecs.

The native library must be BIT-IDENTICAL: same fp16 rounding, same C-style
truncation/rounding, same degenerate-block behavior. Skipped when g++ is
unavailable.
"""

import numpy as np
import pytest

from ggllm_tpu import native
from ggllm_tpu.core.dtypes import GGMLType, TYPE_TRAITS
from ggllm_tpu.quant import registry

if native.get_lib() is None:
    pytest.skip("native codec library unavailable", allow_module_level=True)

DEQ_TYPES = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
             GGMLType.Q8_0, GGMLType.Q8_1, GGMLType.Q2_K, GGMLType.Q3_K,
             GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_K]
QZ_TYPES = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
            GGMLType.Q8_0, GGMLType.Q8_1, GGMLType.Q2_K, GGMLType.Q3_K,
            GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_K]


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(n) * 0.7).astype(np.float32)
    x[::97] = 0.0  # exercise degenerate values
    x[5] = 100.0
    return x


@pytest.mark.parametrize("gtype", DEQ_TYPES, ids=lambda t: TYPE_TRAITS[t].name)
def test_native_dequant_bitexact(gtype):
    n = 256 * 32
    blob = registry.quantize(gtype, _data(n), native=False)
    py = registry.dequantize(gtype, blob, n, native=False)
    nat = native.dequantize(int(gtype), blob, n)
    assert nat is not None
    np.testing.assert_array_equal(nat, py)


@pytest.mark.parametrize("gtype", QZ_TYPES, ids=lambda t: TYPE_TRAITS[t].name)
def test_native_quantize_bitexact(gtype):
    n = 256 * 32
    x = _data(n, seed=3)
    py = registry.quantize(gtype, x, native=False)
    nat = native.quantize(int(gtype), x)
    assert nat is not None
    np.testing.assert_array_equal(nat, py)


def test_native_quantize_constant_blocks():
    # all-zero and all-constant blocks hit the d == 0 degenerate path
    for gtype in QZ_TYPES:
        n = 2 * TYPE_TRAITS[gtype].block_size
        x = np.zeros(n, np.float32)
        np.testing.assert_array_equal(
            native.quantize(int(gtype), x),
            registry.quantize(gtype, x, native=False))
        x = np.full(n, 3.25, np.float32)
        np.testing.assert_array_equal(
            native.quantize(int(gtype), x),
            registry.quantize(gtype, x, native=False))


def test_native_unsupported_type_returns_none():
    # F16 (type 1) has no block codec entry
    assert native.quantize(1, np.zeros(256, np.float32)) is None


@pytest.mark.parametrize(
    "gtype", [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
              GGMLType.Q8_0], ids=lambda t: TYPE_TRAITS[t].name)
def test_native_repack_bitexact(gtype):
    """The C++ kernel-layout repack (gq_repack) must reproduce the numpy
    _pack_plane path byte-for-byte, including the K padding."""
    from ggllm_tpu.kernels import layout as klayout
    from ggllm_tpu.utils.benchgen import random_quant_tensor

    O, K = 64, 4544  # padded_k(4544) != 4544 exercises the zero fill
    qt = random_quant_tensor(gtype, O, K)
    kq_native = klayout.to_kernel(gtype, qt.planes, qt.shape)
    orig = klayout._native_repack
    klayout._native_repack = lambda *a, **k: {}
    try:
        kq_numpy = klayout.to_kernel(gtype, qt.planes, qt.shape)
    finally:
        klayout._native_repack = orig
    assert set(kq_native.planes) == set(kq_numpy.planes)
    for k in kq_numpy.planes:
        np.testing.assert_array_equal(np.asarray(kq_native.planes[k]),
                                      np.asarray(kq_numpy.planes[k]), err_msg=k)
