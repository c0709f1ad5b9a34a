"""Linear op over dense or quantized weights.

`QuantTensor` is a pytree holding the planar packed planes of one quantized
2-D weight (see quant/planar.py). `linear` dispatches:

* dense array  -> jnp matmul (MXU, f32 accumulation);
* QuantTensor  -> fused Pallas dequant-matmul when available, otherwise
  XLA dequantize-then-matmul (`dequant_jnp`). The jnp dequant doubles as the
  interpret-mode reference for the Pallas kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ggllm_tpu.core.dtypes import GGMLType

_PLANE_ORDER = {
    GGMLType.Q4_0: ("d", "qs"),
    GGMLType.Q4_1: ("d", "m", "qs"),
    GGMLType.Q5_0: ("d", "qh", "qs"),
    GGMLType.Q5_1: ("d", "m", "qh", "qs"),
    GGMLType.Q8_0: ("d", "qs"),
    GGMLType.Q2_K: ("qs", "d", "dmin", "scb"),
    GGMLType.Q3_K: ("hmask", "qs", "d", "sc"),
    GGMLType.Q4_K: ("qs", "d", "dmin", "sc", "scm"),
    GGMLType.Q5_K: ("qh", "qs", "d", "dmin", "sc", "scm"),
    GGMLType.Q6_K: ("ql", "qh", "d", "sc"),
}


@jax.tree_util.register_pytree_node_class
class QuantTensor:
    """Quantized 2-D weight as planar device arrays. shape = (out, in)."""

    def __init__(self, gtype: GGMLType, shape: tuple, planes: dict):
        self.gtype = gtype
        self.shape = tuple(shape)
        self.planes = planes

    def tree_flatten(self):
        keys = _PLANE_ORDER[self.gtype]
        return tuple(self.planes[k] for k in keys), (self.gtype, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        gtype, shape = aux
        return cls(gtype, shape, dict(zip(_PLANE_ORDER[gtype], children)))

    def dequantize(self, dtype=jnp.bfloat16) -> jnp.ndarray:
        return dequant_jnp(self.gtype, self.planes, self.shape, dtype)


def _nib(qs):
    """(..., nbytes) packed nibbles -> (..., 2*nbytes) in ggml half-split order."""
    lo = qs & 0xF
    hi = qs >> 4
    return jnp.concatenate([lo, hi], axis=-1)


def _f16bits(v):
    """int16 fp16 bit patterns -> f32 (K-quant super-block scales)."""
    return jax.lax.bitcast_convert_type(v, jnp.float16).astype(jnp.float32)


def dequant_jnp(gtype: GGMLType, p: dict, shape: tuple, dtype=jnp.bfloat16) -> jnp.ndarray:
    """XLA dequantize from planes to a dense (out, in) array."""
    out, cols = shape
    if gtype == GGMLType.Q4_0:
        q = _nib(p["qs"]).astype(jnp.float32) - 8.0  # (out, nb, 32)
        w = q * p["d"][..., None]
    elif gtype == GGMLType.Q4_1:
        q = _nib(p["qs"]).astype(jnp.float32)
        w = q * p["d"][..., None] + p["m"][..., None]
    elif gtype in (GGMLType.Q5_0, GGMLType.Q5_1):
        shifts = jnp.arange(32, dtype=jnp.uint32)
        hb = ((p["qh"][..., None] >> shifts) & 1).astype(jnp.uint8)  # (out, nb, 32)
        q = (_nib(p["qs"]) | (hb << 4)).astype(jnp.float32)
        if gtype == GGMLType.Q5_0:
            w = (q - 16.0) * p["d"][..., None]
        else:
            w = q * p["d"][..., None] + p["m"][..., None]
    elif gtype == GGMLType.Q8_0:
        w = p["qs"].astype(jnp.float32) * p["d"][..., None]
    elif gtype == GGMLType.Q2_K:
        qs = p["qs"].reshape(out, -1, 2, 32)  # (out, nb, half, 32B)
        shifts = jnp.array([0, 2, 4, 6], dtype=jnp.uint8)
        two = (qs[..., None, :] >> shifts[:, None]) & 3  # (out, nb, 2, 4, 32)
        two = two.reshape(out, -1, 256).astype(jnp.float32)
        g = jnp.repeat(jnp.arange(16), 16)  # element -> subgroup of 16
        dl = _f16bits(p["d"])[..., None] * (p["scb"] & 0xF).astype(jnp.float32)
        ml = _f16bits(p["dmin"])[..., None] * (p["scb"] >> 4).astype(jnp.float32)
        w = two * dl[..., g] - ml[..., g]
    elif gtype == GGMLType.Q3_K:
        qs = p["qs"].reshape(out, -1, 2, 32)
        shifts = jnp.array([0, 2, 4, 6], dtype=jnp.uint8)
        two = ((qs[..., None, :] >> shifts[:, None]) & 3).reshape(out, -1, 256)
        hbits = jnp.arange(8, dtype=jnp.uint8)  # bit j covers elements j*32..j*32+31
        hm = ((p["hmask"][..., None, :] >> hbits[:, None]) & 1).reshape(out, -1, 256)
        q = two.astype(jnp.float32) + 4.0 * hm.astype(jnp.float32) - 4.0
        g = jnp.repeat(jnp.arange(16), 16)
        dl = _f16bits(p["d"])[..., None] * p["sc"].astype(jnp.float32)
        w = q * dl[..., g]
    elif gtype == GGMLType.Q4_K:
        qs = p["qs"].reshape(out, -1, 4, 32)  # 4 chunks of 64 elements
        q = jnp.concatenate([qs & 0xF, qs >> 4], axis=-1).reshape(out, -1, 256)
        g = jnp.repeat(jnp.arange(8), 32)
        dl = _f16bits(p["d"])[..., None] * p["sc"].astype(jnp.float32)
        ml = _f16bits(p["dmin"])[..., None] * p["scm"].astype(jnp.float32)
        w = q.astype(jnp.float32) * dl[..., g] - ml[..., g]
    elif gtype == GGMLType.Q5_K:
        qs = p["qs"].reshape(out, -1, 4, 32)
        hbits = jnp.arange(8, dtype=jnp.uint8)
        hb = ((p["qh"][..., None, :] >> hbits[:, None]) & 1).reshape(out, -1, 8, 32)
        # qh bit order: chunk j contributes bits 2j (low 32) and 2j+1 (high 32)
        lo = (qs & 0xF) | (hb[..., 0::2, :] << 4)
        hi = (qs >> 4) | (hb[..., 1::2, :] << 4)
        q = jnp.concatenate([lo, hi], axis=-1).reshape(out, -1, 256)
        g = jnp.repeat(jnp.arange(8), 32)
        dl = _f16bits(p["d"])[..., None] * p["sc"].astype(jnp.float32)
        ml = _f16bits(p["dmin"])[..., None] * p["scm"].astype(jnp.float32)
        w = q.astype(jnp.float32) * dl[..., g] - ml[..., g]
    elif gtype == GGMLType.Q6_K:
        ql = p["ql"].reshape(out, -1, 2, 2, 32)  # (out, nb, half, lo/hi byte-strip, 32)
        qh = p["qh"].reshape(out, -1, 2, 32)
        shifts = jnp.array([0, 2, 4, 6], dtype=jnp.uint8)
        h = (qh[..., None, :] >> shifts[:, None]) & 3  # (out, nb, 2, 4, 32)
        # strips within a 128-half: q1=lo&0xF|h0, q2=hi&0xF|h1, q3=lo>>4|h2, q4=hi>>4|h3
        q1 = (ql[..., 0, :] & 0xF) | (h[..., 0, :] << 4)
        q2 = (ql[..., 1, :] & 0xF) | (h[..., 1, :] << 4)
        q3 = (ql[..., 0, :] >> 4) | (h[..., 2, :] << 4)
        q4 = (ql[..., 1, :] >> 4) | (h[..., 3, :] << 4)
        q = jnp.stack([q1, q2, q3, q4], axis=-2).reshape(out, -1, 256)
        g = jnp.repeat(jnp.arange(16), 16)
        dl = _f16bits(p["d"])[..., None] * p["sc"].astype(jnp.float32)
        w = (q.astype(jnp.float32) - 32.0) * dl[..., g]
    else:
        raise NotImplementedError(f"dequant_jnp: {gtype}")
    return w.reshape(out, cols).astype(dtype)


def linear(w, x: jnp.ndarray, preferred_dtype=None) -> jnp.ndarray:
    """y = x @ W^T with f32 accumulation. W shape (out, in); x (..., in)."""
    out_dtype = preferred_dtype if preferred_dtype is not None else x.dtype
    from ggllm_tpu.kernels.layout import KernelQuant

    if isinstance(w, (QuantTensor, KernelQuant)):
        from ggllm_tpu.kernels import dispatch as kdispatch

        return kdispatch.quant_matmul(w, x, out_dtype)
    # f32 inputs on TPU default to low MXU precision; exact mode needs HIGHEST
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    y = jax.lax.dot_general(
        x,
        w,
        (((x.ndim - 1,), (1,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32,
    )
    return y.astype(out_dtype)
