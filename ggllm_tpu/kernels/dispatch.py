"""Kernel dispatch for quantized matmuls.

Routes a quantized-weight x activation matmul to the best implementation:

* KernelQuant (fused-kernel layout) -> Pallas fused dequant-matmul, compiled
  on TPU, interpret mode elsewhere (CPU tests);
* QuantTensor (planar layout)       -> XLA dequantize-then-dot fallback, the
  semantic reference the kernels are tested against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BACKEND = None


def _on_tpu() -> bool:
    global _BACKEND
    if _BACKEND is None:
        _BACKEND = jax.default_backend()
    return _BACKEND == "tpu"


def quant_matmul(w, x: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """y = x @ W^T, W quantized. x: (..., in) -> (..., out)."""
    from ggllm_tpu.kernels.layout import KernelQuant
    from ggllm_tpu.kernels.quant_matmul import fused_matmul

    if isinstance(w, KernelQuant):
        return fused_matmul(w, x, out_dtype, interpret=not _on_tpu())
    wd = w.dequantize(jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32)
    y = jax.lax.dot_general(
        x, wd, (((x.ndim - 1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return y.astype(out_dtype)
