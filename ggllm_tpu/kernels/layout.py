"""Kernel-friendly weight layout for fused dequant-matmul Pallas kernels.

The planar layout (quant/planar.py) keeps ggml's row-major block order, which
is what the XLA fallback and parity tests consume. The Pallas kernels instead
want **column-major, chunk-major bit-planes**:

* the contraction axis K is split into ``n_k`` chunks of ``ck`` columns, so a
  grid step streams one ``(ck, block_o)`` tile of each plane from HBM;
* each format is decomposed into 1/2/4/8-bit code planes (e.g. Q5_0 = one
  4-bit plane + one 1-bit plane shifted left 4, Q6_K = 4-bit + 2-bit<<4);
* a b-bit plane stores ``parts = 8//b`` code groups per byte: within chunk c,
  byte row j's bit-field i covers column ``c*ck + i*(ck//parts) + j`` — so the
  kernel's unpack (shift/mask then sublane-concat of the parts) yields columns
  in ascending order, matching a contiguous slice of x;
* two-level K-quant scales were already flattened to effective per-group f32
  scales at load (quant/planar.py); here they are just transposed and chunked
  to ``(n_k, ck//group, O)``.

The dequant semantics per format mirror ggml (ggml.c:879-924 legacy blocks,
k_quants.h:20-83 super-blocks):  ``w = (q + offset) * scale - minval`` where
q is the combined unsigned code (signed int8 for Q8_0).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from ggllm_tpu.core.dtypes import GGMLType


@dataclass(frozen=True)
class FormatSpec:
    """Static dequant recipe for one ggml quant format."""

    # (plane_name, bits, shift) — combined code q = sum(plane << shift)
    planes: tuple[tuple[str, int, int], ...]
    offset: float  # added to q before scaling
    group: int  # columns sharing one scale
    has_min: bool  # w = q*ds - ms (True) vs w = (q+offset)*ds (False)
    # scale storage: flat = per-group values ("ds"[, "ms"], fp16 bits or
    # f32); two_level = fp16-bit super-block d(+dmin) per 256 cols combined
    # in-kernel with small integer sub-scales — K-quants cost ~0.6 bits/w
    # of scales instead of 2-4
    scale_names: tuple[str, ...] = ("ds",)
    two_level: bool = False
    packed_scb: bool = False  # Q2_K: one byte packs 4-bit scale | 4-bit min


FORMATS: dict[GGMLType, FormatSpec] = {
    GGMLType.Q4_0: FormatSpec((("q", 4, 0),), -8.0, 32, False),
    GGMLType.Q4_1: FormatSpec((("q", 4, 0),), 0.0, 32, True, ("ds", "ms")),
    GGMLType.Q5_0: FormatSpec((("q", 4, 0), ("h", 1, 4)), -16.0, 32, False),
    GGMLType.Q5_1: FormatSpec((("q", 4, 0), ("h", 1, 4)), 0.0, 32, True, ("ds", "ms")),
    GGMLType.Q8_0: FormatSpec((("q", 8, 0),), 0.0, 32, False),
    GGMLType.Q2_K: FormatSpec((("q", 2, 0),), 0.0, 16, True,
                              ("db", "dminb", "scb"), True, True),
    GGMLType.Q3_K: FormatSpec((("q", 2, 0), ("h", 1, 2)), -4.0, 16, False,
                              ("db", "sc"), True),
    GGMLType.Q4_K: FormatSpec((("q", 4, 0),), 0.0, 32, True,
                              ("db", "dminb", "sc", "scm"), True),
    GGMLType.Q5_K: FormatSpec((("q", 4, 0), ("h", 1, 4)), 0.0, 32, True,
                              ("db", "dminb", "sc", "scm"), True),
    GGMLType.Q6_K: FormatSpec((("q", 4, 0), ("h", 2, 4)), -32.0, 16, False,
                              ("db", "sc"), True),
}

# VMEM sizing: contraction chunk cap (i32 intermediates dominate). Formats
# whose combined code width is <= 4 bits get a higher cap: the i32 unpack
# stays the same size but Falcon's 4608/23040-wide dims then chunk as 1x4608
# or 5x4608 instead of 2x2304/6x3840 — measured 91 -> 99.5 tok/s on the 7B
# Q4_0 decode (bigger DMA blocks, fewer grid revisits)
CK_MAX = 4096
CK_MAX_NARROW = 4608

# bump whenever the packed-plane layout produced by to_kernel changes —
# io/param_cache.py keys its sidecar files on this
LAYOUT_VERSION = 1


def _ck_cap(spec: FormatSpec | None) -> int:
    if spec is not None and sum(b for _, b, _ in spec.planes) <= 4:
        return CK_MAX_NARROW
    return CK_MAX


@jax.tree_util.register_pytree_node_class
class KernelQuant:
    """Quantized 2-D weight in fused-kernel layout. Logical shape (out, in).

    planes: dict of device arrays —
      code planes  (n_k, ck*bits//8, O) uint8 (int8 for the 8-bit plane)
      "ds"         (n_k, ck//group, O) f32
      "ms"         (n_k, ck//group, O) f32 (formats with has_min)
    """

    def __init__(self, gtype: GGMLType, shape: tuple, ck: int, planes: dict):
        self.gtype = gtype
        self.shape = tuple(shape)
        self.ck = ck
        self.planes = planes

    def tree_flatten(self):
        keys = tuple(sorted(self.planes))
        return tuple(self.planes[k] for k in keys), (self.gtype, self.shape, self.ck, keys)

    @classmethod
    def tree_unflatten(cls, aux, children):
        gtype, shape, ck, keys = aux
        return cls(gtype, shape, ck, dict(zip(keys, children)))


def choose_ck(K: int, step: int = 128, ck_max: int | None = None) -> int:
    """Largest chunk ≤ the cap that is either K itself or a step-multiple
    divisor of K (Pallas lane-blocking constraint on the x operand; step=256
    for two-level K-quant scales so super-blocks never straddle chunks)."""
    ck_max = ck_max or CK_MAX
    if K <= ck_max:
        return K
    best = 0
    for m in range(step, ck_max + 1, step):
        if K % m == 0:
            best = m
    if best == 0:
        return K  # cannot chunk; kernel will be skipped if VMEM-infeasible
    return best


def padded_k(K: int, step: int = 128) -> int:
    """Contraction dim padded (with zero blocks / zero scales) so the chunk
    grid gets a healthy size: Falcon's 71-flavored dims (18176 = 142*128)
    only divide into 256-wide chunks, but 18432 = 9*2048 does much better.
    The kernel zero-pads x to match, so results are unchanged."""
    if K <= CK_MAX:
        return -(-K // max(step, 64)) * max(step, 64) if K % max(step, 64) else K
    lo = min(1024, CK_MAX)
    k2 = -(-K // step) * step
    while True:
        best = max((m for m in range(lo, CK_MAX + 1, step) if k2 % m == 0),
                   default=0)
        if best:
            return k2
        k2 += step


def merge_out(parts: list[dict]) -> dict:
    """Concat planar planes along the output-feature axis (axis 0):
    merged weight rows = [part0; part1; ...], same K."""
    keys = parts[0].keys()
    return {k: np.concatenate([p[k] for p in parts], axis=0) for k in keys}


def merge_in(parts: list[dict]) -> dict:
    """Concat planar planes along the block axis (axis 1): merged weight
    contraction dim = K0 + K1 + ..., same output rows."""
    keys = parts[0].keys()
    return {k: np.concatenate([p[k] for p in parts], axis=1) for k in keys}


def extract_codes(gtype: GGMLType, p: dict, O: int, K: int) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Planar planes -> (codes (O,K) int16, ds (O,K//group) f32, ms or None).

    codes are the combined unsigned per-element quant codes (signed for Q8_0),
    in ggml element order; mirrors ops/linear.dequant_jnp exactly.
    """
    def nib(qs):  # (..., nbytes) -> (..., 2*nbytes) ggml half-split order
        return np.concatenate([qs & 0xF, qs >> 4], axis=-1)

    if gtype in (GGMLType.Q4_0, GGMLType.Q4_1):
        codes = nib(p["qs"]).reshape(O, K)
        return codes.astype(np.int16), p["d"], p.get("m")
    if gtype in (GGMLType.Q5_0, GGMLType.Q5_1):
        shifts = np.arange(32, dtype=np.uint32)
        hb = ((p["qh"][..., None] >> shifts) & 1).astype(np.uint8)
        codes = (nib(p["qs"]) | (hb << 4)).reshape(O, K)
        return codes.astype(np.int16), p["d"], p.get("m")
    if gtype == GGMLType.Q8_0:
        return p["qs"].reshape(O, K).astype(np.int16), p["d"], None
    if gtype == GGMLType.Q2_K:
        qs = p["qs"].reshape(O, -1, 2, 32)
        shifts = np.array([0, 2, 4, 6], dtype=np.uint8)
        two = (qs[..., None, :] >> shifts[:, None]) & 3
        return two.reshape(O, K).astype(np.int16), \
            {"db": p["d"], "dminb": p["dmin"], "scb": p["scb"]}, None
    if gtype == GGMLType.Q3_K:
        qs = p["qs"].reshape(O, -1, 2, 32)
        shifts = np.array([0, 2, 4, 6], dtype=np.uint8)
        two = ((qs[..., None, :] >> shifts[:, None]) & 3).reshape(O, K)
        hbits = np.arange(8, dtype=np.uint8)
        hm = ((p["hmask"][..., None, :] >> hbits[:, None]) & 1).reshape(O, K)
        return (two | (hm << 2)).astype(np.int16), \
            {"db": p["d"], "sc": p["sc"]}, None
    if gtype == GGMLType.Q4_K:
        qs = p["qs"].reshape(O, -1, 4, 32)
        codes = np.concatenate([qs & 0xF, qs >> 4], axis=-1).reshape(O, K)
        return codes.astype(np.int16), \
            {"db": p["d"], "dminb": p["dmin"], "sc": p["sc"], "scm": p["scm"]}, None
    if gtype == GGMLType.Q5_K:
        qs = p["qs"].reshape(O, -1, 4, 32)
        hbits = np.arange(8, dtype=np.uint8)
        hb = ((p["qh"][..., None, :] >> hbits[:, None]) & 1).reshape(O, -1, 8, 32)
        lo = (qs & 0xF) | (hb[..., 0::2, :] << 4)
        hi = (qs >> 4) | (hb[..., 1::2, :] << 4)
        codes = np.concatenate([lo, hi], axis=-1).reshape(O, K)
        return codes.astype(np.int16), \
            {"db": p["d"], "dminb": p["dmin"], "sc": p["sc"], "scm": p["scm"]}, None
    if gtype == GGMLType.Q6_K:
        ql = p["ql"].reshape(O, -1, 2, 2, 32)
        qh = p["qh"].reshape(O, -1, 2, 32)
        shifts = np.array([0, 2, 4, 6], dtype=np.uint8)
        h = (qh[..., None, :] >> shifts[:, None]) & 3
        q1 = (ql[..., 0, :] & 0xF) | (h[..., 0, :] << 4)
        q2 = (ql[..., 1, :] & 0xF) | (h[..., 1, :] << 4)
        q3 = (ql[..., 0, :] >> 4) | (h[..., 2, :] << 4)
        q4 = (ql[..., 1, :] >> 4) | (h[..., 3, :] << 4)
        codes = np.stack([q1, q2, q3, q4], axis=-2).reshape(O, K)
        return codes.astype(np.int16), {"db": p["d"], "sc": p["sc"]}, None
    raise NotImplementedError(f"extract_codes: {gtype}")


def _native_repack(gtype: GGMLType, planes: dict, O: int, K: int,
                   kp: int, ck: int) -> dict:
    """Legacy-format code planes via the C++ repack (native/quants.cpp
    gq_repack) — one fused pass instead of numpy's int16 intermediates and
    transposes (the model-load hot path; ~10-20x on the 1-core bench host).
    Returns {} when unavailable, and the caller runs the numpy path."""
    if gtype not in (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0,
                     GGMLType.Q5_1, GGMLType.Q8_0):
        return {}
    from ggllm_tpu import native

    if gtype == GGMLType.Q8_0:
        q = native.repack_plane(int(gtype), 0, planes["qs"], O, K, kp, ck, ck)
        return {"q": q.view(np.int8)} if q is not None else {}
    q = native.repack_plane(int(gtype), 0, planes["qs"], O, K, kp, ck, ck // 2)
    if q is None:
        return {}
    out = {"q": q}
    if gtype in (GGMLType.Q5_0, GGMLType.Q5_1):
        h = native.repack_plane(int(gtype), 1, planes["qh"], O, K, kp, ck,
                                ck // 8)
        if h is None:
            return {}
        out["h"] = h
    return out


def _pack_plane(sub: np.ndarray, bits: int, ck: int) -> np.ndarray:
    """(O, K) sub-codes < 2^bits -> (n_k, ck*bits//8, O) packed bytes."""
    O, K = sub.shape
    parts = 8 // bits
    n_k = K // ck
    rows = ck // parts
    s = np.ascontiguousarray(sub.T).reshape(n_k, parts, rows, O)
    out = np.zeros((n_k, rows, O), np.uint8)
    for i in range(parts):
        out |= (s[:, i].astype(np.uint8) << (i * bits))
    return out


def to_kernel(gtype: GGMLType, planes: dict, shape: tuple) -> KernelQuant:
    """Planar QuantTensor planes -> KernelQuant (host-side numpy repack).

    The contraction dim is zero-padded to padded_k(K); the kernel pads x to
    match (zero codes x zero scales contribute nothing)."""
    O, K = shape
    spec = FORMATS[gtype]
    step = 256 if spec.two_level else 128  # super-blocks can't straddle chunks
    kp = padded_k(K, step)
    ck = choose_ck(kp, step, ck_max=_ck_cap(spec))
    assert kp % ck == 0 and ck % max(spec.group, 8) == 0, (gtype, K, kp, ck)

    out: dict[str, np.ndarray] = _native_repack(gtype, planes, O, K, kp, ck)
    if out:
        ds = planes["d"]
        ms = planes.get("m")
    else:
        codes, ds, ms = extract_codes(gtype, planes, O, K)
        if kp != K:
            codes = np.pad(codes, ((0, 0), (0, kp - K)))
        for name, bits, shift in spec.planes:
            if bits == 8:  # Q8_0: signed codes pass through unpacked
                out[name] = np.ascontiguousarray(codes.T).reshape(
                    kp // ck, ck, O).astype(np.int8)
                continue
            sub = (codes >> shift) & ((1 << bits) - 1)
            out[name] = _pack_plane(sub, bits, ck)

    n_k = kp // ck
    g = spec.group

    def chunk_scales(s: np.ndarray) -> np.ndarray:
        # (O, nb[, sub]) effective scales -> (n_k, ck//g, O), K-padded.
        # When every value is exactly fp16-representable (legacy formats
        # store fp16 d/m on disk), keep the fp16 BIT PATTERN in an int16
        # plane — half the scale bytes; the kernel decodes with integer ops
        # (Mosaic rejects f16 arrays). Otherwise (K-quant d*sc products) f32.
        s2 = s.reshape(O, K // g).astype(np.float32)
        if kp != K:
            s2 = np.pad(s2, ((0, 0), (0, (kp - K) // g)))
        out = np.ascontiguousarray(s2.T).reshape(n_k, ck // g, O)
        f16 = out.astype(np.float16)
        if np.array_equal(f16.astype(np.float32), out):
            return f16.view(np.int16)
        return out

    def chunk_int(s: np.ndarray, g: int) -> np.ndarray:
        # (O, nb[, sub]) integer sub-scales / fp16-bit d -> (n_k, ck//g, O)
        s2 = s.reshape(O, K // g)
        if kp != K:
            s2 = np.pad(s2, ((0, 0), (0, (kp - K) // g)))
        return np.ascontiguousarray(s2.T).reshape(n_k, ck // g, O)

    if spec.two_level:
        # fp16-bit super-block scales (per 256) + integer sub-scales — the
        # kernel forms d*sc in f32, exactly the reference's effective scale
        for name, arr in ds.items():
            g = 256 if name in ("db", "dminb") else spec.group
            out[name] = chunk_int(np.asarray(arr), g)
        return KernelQuant(gtype, (O, K), ck, out)

    out["ds"] = chunk_scales(ds)
    if spec.has_min:
        assert ms is not None
        # Q4_1/Q5_1 store m (added); kernel computes q*ds - ms, so negate
        # BEFORE packing (chunk_scales may return fp16 bit patterns)
        sign = np.float32(-1.0 if gtype in (GGMLType.Q4_1, GGMLType.Q5_1) else 1.0)
        out["ms"] = chunk_scales(np.asarray(ms, np.float32) * sign)
    # offset-only formats apply the integer offset in-kernel (one i32 add)
    # instead of carrying a second scale plane — decode is HBM-bound and the
    # extra plane costs a full bit/weight on Q4_0
    return KernelQuant(gtype, (O, K), ck, out)
