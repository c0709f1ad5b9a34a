"""Kernel dispatch for quantized matmuls.

Routes a QuantTensor x activation matmul to the best implementation:

* Pallas fused dequant-matmul (ggllm_tpu.kernels.quant_matmul) on TPU;
* XLA dequantize-then-dot fallback everywhere else (CPU tests, interpret).

The fallback is the semantic reference: kernels must match it bitwise-ish
(fp tolerance) in interpret mode (tests/test_kernels.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PALLAS_OK = None


def _pallas_available() -> bool:
    global _PALLAS_OK
    if _PALLAS_OK is None:
        _PALLAS_OK = jax.default_backend() == "tpu"
    return _PALLAS_OK


def quant_matmul(w, x: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """y = x @ W^T, W quantized. x: (..., in) -> (..., out)."""
    if _pallas_available():
        from ggllm_tpu.kernels import quant_matmul as qmm

        try:
            return qmm.fused_matmul(w, x, out_dtype)
        except NotImplementedError:
            pass
    wd = w.dequantize(jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32)
    y = jax.lax.dot_general(
        x, wd, (((x.ndim - 1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return y.astype(out_dtype)
