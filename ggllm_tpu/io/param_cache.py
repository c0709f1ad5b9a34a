"""Sidecar cache of the device-ready parameter tree.

Building device parameters from a GGCC/GGJT file is dominated by the
host-side kernel-layout repack (kernels/layout.to_kernel): bit-plane
extraction and re-chunking of every weight in single-threaded numpy —
minutes for a 7B file on this host. The repacked tree is a pure function
of (model file, layout version, config fingerprint), so it is paid once
and cached next to the model as ``<model>.kcache``; later loads memmap the
cache and stream straight to the device.

This is the TPU-era analogue of the reference's mmap fast path
(llama-util.h:176 llama_mmap — load cost amortized to page-cache reads):
the reference's on-disk layout IS its compute layout, ours is not, so the
compute layout gets its own file.

Format: magic + u64 JSON-header length + JSON tree skeleton + 64-byte
aligned raw array payloads. The header records the source file identity
(size, mtime_ns) and a config fingerprint; any mismatch invalidates.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ggllm_tpu.core.dtypes import GGMLType

_MAGIC = b"GGTKCCH1"
_ALIGN = 64
# bump when the cached tree's semantics change (together with
# kernels.layout.LAYOUT_VERSION, which tracks the in-plane layout itself)
CACHE_VERSION = 1


def _layout_version() -> int:
    from ggllm_tpu.kernels import layout

    return getattr(layout, "LAYOUT_VERSION", 0)


def cache_path(model_path: str) -> str:
    return model_path + ".kcache"


# ---------------------------------------------------------------- encoding

def _encode(node, blobs: list[np.ndarray], offset: int):
    """Tree node -> (json-able skeleton, next payload offset).

    Handles dict/list/tuple, ndarray-likes (incl. jax arrays via
    __array__), KernelQuant / QuantTensor wrappers, and plain scalars.
    """
    from ggllm_tpu.kernels.layout import KernelQuant
    from ggllm_tpu.ops.linear import QuantTensor

    if isinstance(node, dict):
        items = []
        for k in sorted(node):
            enc, offset = _encode(node[k], blobs, offset)
            items.append([k, enc])
        return {"d": items}, offset
    if isinstance(node, (list, tuple)):
        items = []
        for v in node:
            enc, offset = _encode(v, blobs, offset)
            items.append(enc)
        return {"l": items, "tuple": isinstance(node, tuple)}, offset
    if isinstance(node, KernelQuant):
        enc, offset = _encode(node.planes, blobs, offset)
        return {"kq": [int(node.gtype), list(node.shape), int(node.ck), enc]}, offset
    if isinstance(node, QuantTensor):
        enc, offset = _encode(node.planes, blobs, offset)
        return {"qt": [int(node.gtype), list(node.shape), enc]}, offset
    if hasattr(node, "__array__") or isinstance(node, np.ndarray):
        arr = np.asarray(node)
        arr = np.ascontiguousarray(arr)
        offset = (offset + _ALIGN - 1) // _ALIGN * _ALIGN
        blobs.append(arr)
        # dtype by NAME: extension dtypes (bfloat16) stringify as opaque
        # void types via .str but round-trip through np.dtype(name)
        enc = {"a": [arr.dtype.name, list(arr.shape), offset]}
        return enc, offset + arr.nbytes
    if node is None or isinstance(node, (bool, int, float, str)):
        return {"s": node}, offset
    raise TypeError(f"param cache cannot serialize {type(node)!r}")


def _decode(enc, buf: np.memmap):
    from ggllm_tpu.kernels.layout import KernelQuant
    from ggllm_tpu.ops.linear import QuantTensor

    if "d" in enc:
        return {k: _decode(v, buf) for k, v in enc["d"]}
    if "l" in enc:
        items = [_decode(v, buf) for v in enc["l"]]
        return tuple(items) if enc.get("tuple") else items
    if "kq" in enc:
        gtype, shape, ck, planes = enc["kq"]
        return KernelQuant(GGMLType(gtype), tuple(shape), ck, _decode(planes, buf))
    if "qt" in enc:
        gtype, shape, planes = enc["qt"]
        return QuantTensor(GGMLType(gtype), tuple(shape), _decode(planes, buf))
    if "a" in enc:
        dtype, shape, offset = enc["a"]
        dt = np.dtype(dtype)
        n = int(np.prod(shape)) if shape else 1
        return buf[offset: offset + n * dt.itemsize].view(dt).reshape(shape)
    if "s" in enc:
        return enc["s"]
    raise ValueError(f"param cache: bad node {list(enc)}")


# ---------------------------------------------------------------- public

def _src_identity(model_path: str) -> dict:
    st = os.stat(model_path)
    return {"size": st.st_size, "mtime_ns": st.st_mtime_ns}


def save(model_path: str, params, fingerprint: dict,
         path: str | None = None) -> str:
    """Write the host-resident parameter tree to the sidecar cache.

    Leaves must be host-reachable (numpy or CPU-backed jax arrays); saving
    a device-resident tree would silently fetch gigabytes back through the
    device link — the loader builds the tree on the CPU device first.
    """
    path = path or cache_path(model_path)
    blobs: list[np.ndarray] = []
    skeleton, _ = _encode(params, blobs, 0)
    header = json.dumps({
        "cache_version": CACHE_VERSION,
        "layout_version": _layout_version(),
        "src": _src_identity(model_path),
        "fingerprint": fingerprint,
        "tree": skeleton,
    }).encode("utf-8")
    tmp = path + ".tmp"
    try:
        with open(tmp, "wb") as f:
            f.write(_MAGIC)
            f.write(len(header).to_bytes(8, "little"))
            f.write(header)
            base = f.tell()
            offset = 0
            for arr in blobs:
                aligned = (offset + _ALIGN - 1) // _ALIGN * _ALIGN
                if aligned != offset:
                    f.write(b"\0" * (aligned - offset))
                    offset = aligned
                # zero-copy write: tobytes() would duplicate every payload
                # (gigabytes) before it hits the disk buffer; a uint8 view
                # exposes the raw buffer directly (extension dtypes like
                # bfloat16 have no stable memoryview format, uint8 always does)
                if arr.ndim:
                    f.write(arr.view(np.uint8).reshape(-1).data)
                else:
                    f.write(arr.tobytes())
                offset += arr.nbytes
            del base
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return path


def try_load(model_path: str, fingerprint: dict, path: str | None = None):
    """Return the host parameter tree (memmap-backed) or None on any
    mismatch/corruption. Never raises for an invalid cache file."""
    path = path or cache_path(model_path)
    try:
        with open(path, "rb") as f:
            if f.read(8) != _MAGIC:
                return None
            hlen = int.from_bytes(f.read(8), "little")
            if not 0 < hlen < 2**31:
                return None
            header = json.loads(f.read(hlen).decode("utf-8"))
            base = f.tell()
        if header.get("cache_version") != CACHE_VERSION:
            return None
        if header.get("layout_version") != _layout_version():
            return None
        if header.get("src") != _src_identity(model_path):
            return None
        if header.get("fingerprint") != fingerprint:
            return None
        buf = np.memmap(path, dtype=np.uint8, mode="r", offset=base)
        return _decode(header["tree"], buf)
    except (OSError, ValueError, KeyError, json.JSONDecodeError):
        return None
