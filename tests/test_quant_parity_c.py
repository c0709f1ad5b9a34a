"""Bit-exact parity of our codecs vs the reference C implementation.

Compiles the reference's ggml.c + k_quants.c (read-only, from /root/reference)
into a throwaway shared library at test time and compares quantize /
dequantize outputs byte-for-byte. Compiled with -ffp-contract=off so the C
float semantics match numpy's strict-IEEE arithmetic (no FMA contraction).

Skipped when the reference tree or a C compiler is unavailable — the
threshold tests in test_quant_fns.py still guard quality in that case.
"""

import ctypes
import os
import shutil
import subprocess

import numpy as np
import pytest

from ggllm_tpu.core.dtypes import GGMLType, TYPE_TRAITS, row_nbytes
from ggllm_tpu.quant import registry

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF) and shutil.which("cc")),
    reason="reference tree or C compiler unavailable",
)

CASES = [
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q8_0,
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
    GGMLType.Q8_K,
]

_QROW = ctypes.CFUNCTYPE(
    None, ctypes.POINTER(ctypes.c_float), ctypes.c_void_p, ctypes.c_int
)
_DROW = ctypes.CFUNCTYPE(
    None, ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int
)


class _QuantizeFns(ctypes.Structure):
    """Mirror of quantize_fns_t (ggml.h:1584-1591)."""

    _fields_ = [
        ("dequantize_row_q", _DROW),
        ("quantize_row_q", _QROW),
        ("quantize_row_q_reference", _QROW),
        ("quantize_row_q_dot", _QROW),
        ("vec_dot_q", ctypes.c_void_p),
        ("vec_dot_type", ctypes.c_int),
    ]


@pytest.fixture(scope="module")
def reflib(tmp_path_factory):
    """Build the reference codecs into a shared library (strict IEEE)."""
    build = tmp_path_factory.mktemp("refbuild")
    lib = build / "libggmlref.so"
    cmd = [
        "cc", "-O2", "-fPIC", "-shared", "-ffp-contract=off",
        "-DGGML_USE_K_QUANTS",
        "-I", REF,
        os.path.join(REF, "ggml.c"),
        os.path.join(REF, "k_quants.c"),
        "-o", str(lib),
        "-lm", "-lpthread",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        pytest.skip(f"reference build failed: {proc.stderr[-2000:]}")
    dll = ctypes.CDLL(str(lib))
    # ggml_init builds the fp16 conversion tables the scalar paths rely on
    class _InitParams(ctypes.Structure):
        _fields_ = [
            ("mem_size", ctypes.c_size_t),
            ("mem_buffer", ctypes.c_void_p),
            ("no_alloc", ctypes.c_bool),
        ]

    dll.ggml_init.restype = ctypes.c_void_p
    dll.ggml_init.argtypes = [_InitParams]
    dll.ggml_init(_InitParams(16 * 1024, None, True))
    dll.ggml_internal_get_quantize_fn.restype = _QuantizeFns
    dll.ggml_internal_get_quantize_fn.argtypes = [ctypes.c_size_t]
    return dll


def _gen(offset, n):
    i = np.arange(n, dtype=np.float32)
    return (0.1 + 2.0 * np.cos(i + np.float32(offset))).astype(np.float32)


@pytest.mark.parametrize("gtype", CASES, ids=lambda c: TYPE_TRAITS[c].name)
def test_bit_exact(reflib, gtype):
    n = 256 * 17
    rng = np.random.default_rng(12345)
    datasets = [
        _gen(0.0, n),
        rng.standard_normal(n).astype(np.float32),
        (rng.standard_normal(n) * 4.0).astype(np.float32),
    ]
    if gtype == GGMLType.Q8_K:
        # Q8_K has no complete quantize_fns table entry; use the exported
        # k_quants symbols (k_quants.h:92,107) directly.
        qfn = _QROW(("quantize_row_q8_K_reference", reflib))
        dfn = _DROW(("dequantize_row_q8_K", reflib))
    else:
        fns = reflib.ggml_internal_get_quantize_fn(int(gtype))
        qfn = fns.quantize_row_q_reference
        dfn = fns.dequantize_row_q
    nbytes = row_nbytes(gtype, n)
    for data in datasets:
        ref_q = np.zeros(nbytes, dtype=np.uint8)
        qfn(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ref_q.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int(n),
        )
        ours_q = registry.quantize(gtype, data)
        if not np.array_equal(ours_q, ref_q):
            bad = np.nonzero(ours_q != ref_q)[0]
            ts = TYPE_TRAITS[gtype].type_size
            raise AssertionError(
                f"{TYPE_TRAITS[gtype].name} quantize mismatch: {bad.size}/{nbytes} bytes, "
                f"first at byte {bad[0]} (block {bad[0] // ts}, offset {bad[0] % ts})"
            )

        ref_out = np.zeros(n, dtype=np.float32)
        dfn(
            ctypes.c_void_p(ref_q.ctypes.data),
            ref_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(n),
        )
        ours_out = registry.dequantize(gtype, ref_q, n)
        assert np.array_equal(ours_out, ref_out), f"{TYPE_TRAITS[gtype].name} dequantize mismatch"
