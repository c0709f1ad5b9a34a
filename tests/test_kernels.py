"""Pallas fused dequant-matmul kernel parity tests (interpret mode on CPU).

The XLA dequantize-then-dot path over planar QuantTensors is the semantic
reference (itself validated bit-exactly against the C layouts in
test_quant_parity_c.py); the fused kernel must match it to fp tolerance for
every quant format, for both the single-chunk and k-chunked grid, and for
f32 and bf16 activations.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from ggllm_tpu.core.dtypes import GGMLType, TYPE_TRAITS
from ggllm_tpu.kernels import layout
from ggllm_tpu.kernels.quant_matmul import fused_matmul
from ggllm_tpu.ops.linear import QuantTensor
from ggllm_tpu.quant import planar, registry

KERNEL_TYPES = list(layout.FORMATS.keys())


def make_weight(gtype: GGMLType, O: int, K: int, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((O, K)) * 0.1).astype(np.float32)
    blob = np.stack([registry.quantize(gtype, w[i]) for i in range(O)])
    planes = planar.to_planes(gtype, blob.reshape(O, -1), O, K)
    return QuantTensor(gtype, (O, K), planes)


@pytest.mark.parametrize("gtype", KERNEL_TYPES, ids=lambda t: TYPE_TRAITS[t].name)
@pytest.mark.parametrize("xdtype", ["float32", "bfloat16"])
def test_fused_matmul_parity(gtype, xdtype):
    O, K, S = 64, 256, 4
    qt = make_weight(gtype, O, K)
    kq = layout.to_kernel(gtype, qt.planes, qt.shape)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((S, K)), dtype=jnp.dtype(xdtype))

    wd = qt.dequantize(jnp.float32 if xdtype == "float32" else jnp.bfloat16)
    ref = np.asarray(x.astype(jnp.float32) @ wd.astype(jnp.float32).T)
    got = np.asarray(fused_matmul(kq, x, jnp.float32, interpret=True))

    tol = 2e-5 if xdtype == "float32" else 2e-2
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(got / scale, ref / scale, atol=tol)


def test_fused_matmul_chunked(monkeypatch):
    """k-chunked grid (n_k > 1) accumulates correctly."""
    monkeypatch.setattr(layout, "CK_MAX", 128)
    monkeypatch.setattr(layout, "CK_MAX_NARROW", 128)
    O, K, S = 64, 512, 3
    qt = make_weight(GGMLType.Q4_0, O, K)
    kq = layout.to_kernel(GGMLType.Q4_0, qt.planes, qt.shape)
    assert kq.ck == 128 and kq.planes["q"].shape[0] == 4

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((S, K)), dtype=jnp.float32)
    ref = np.asarray(x @ qt.dequantize(jnp.float32).T)
    got = np.asarray(fused_matmul(kq, x, jnp.float32, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_fused_matmul_batched_lead_dims():
    O, K = 64, 128
    qt = make_weight(GGMLType.Q8_0, O, K)
    kq = layout.to_kernel(GGMLType.Q8_0, qt.planes, qt.shape)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 3, K)), dtype=jnp.float32)
    ref = np.asarray(x @ qt.dequantize(jnp.float32).T)
    got = np.asarray(fused_matmul(kq, x, jnp.float32, interpret=True))
    assert got.shape == (2, 3, O)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("gtype", KERNEL_TYPES, ids=lambda t: TYPE_TRAITS[t].name)
def test_fast_kernel_quant_layout_matches(gtype):
    """benchgen.fast_kernel_quant builds planes directly in kernel layout;
    keys, shapes, dtypes and chunking must equal to_kernel's output so the
    fused kernel consumes them identically (and benchmarks measure the same
    bytes a real load produces)."""
    from ggllm_tpu.utils.benchgen import fast_kernel_quant, random_quant_tensor

    O, K = 16, 4544 if not layout.FORMATS[gtype].two_level else 4608
    qt = random_quant_tensor(gtype, O, K)
    kq_ref = layout.to_kernel(gtype, qt.planes, qt.shape)
    kq_fast = fast_kernel_quant(gtype, O, K)

    kq_dev = fast_kernel_quant(gtype, O, K, device=True)
    for kq_fast in (kq_fast, kq_dev):
        assert kq_fast.shape == kq_ref.shape and kq_fast.ck == kq_ref.ck
        assert sorted(kq_fast.planes) == sorted(kq_ref.planes)
        for k in kq_ref.planes:
            assert kq_fast.planes[k].shape == kq_ref.planes[k].shape, k
            assert kq_fast.planes[k].dtype == kq_ref.planes[k].dtype, k


@pytest.mark.parametrize("gtype", [GGMLType.Q4_0, GGMLType.Q4_K],
                         ids=lambda t: TYPE_TRAITS[t].name)
def test_fast_kernel_quant_runs_through_kernel(gtype):
    """The fast random planes must produce finite outputs through the fused
    matmul (guards scale/code value ranges)."""
    from ggllm_tpu.utils.benchgen import fast_kernel_quant

    O, K = 32, 512
    kq = fast_kernel_quant(gtype, O, K)
    kq = layout.KernelQuant(kq.gtype, kq.shape, kq.ck,
                            {k: jnp.asarray(v) for k, v in kq.planes.items()})
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, K)), jnp.float32)
    y = np.asarray(fused_matmul(kq, x, jnp.float32, interpret=True))
    assert np.isfinite(y).all() and y.shape == (2, O)
