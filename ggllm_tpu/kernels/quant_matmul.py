"""Pallas fused dequant x matmul kernels (decode matvec + prefill MXU tiles).

Implemented incrementally per format; fused_matmul raises NotImplementedError
for formats not yet covered and the dispatcher falls back to XLA
dequantize-then-dot.
"""

from __future__ import annotations

import jax.numpy as jnp


def fused_matmul(w, x: jnp.ndarray, out_dtype) -> jnp.ndarray:
    raise NotImplementedError
