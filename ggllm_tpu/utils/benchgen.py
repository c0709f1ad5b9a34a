"""Fast synthetic parameter generation at real model scale.

Benchmarks need Falcon-7B/40B-sized weights but no pretrained values; writing
a multi-GB GGCC file first would dominate runtime. These builders produce the
device parameter pytree directly: packed quant planes with random codes and
well-scaled constants (perf-identical to real quantized weights), tiled
random embeddings.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ggllm_tpu.core.config import FalconHParams
from ggllm_tpu.core.dtypes import GGMLType, TYPE_TRAITS
from ggllm_tpu.ops.linear import _PLANE_ORDER, QuantTensor
from ggllm_tpu.quant import planar, registry

_rng = np.random.default_rng(42)


def _tiled_random(shape, scale=0.02, dtype=np.float32) -> np.ndarray:
    """Cheap large random array: tile a 64k random block."""
    n = int(np.prod(shape))
    block = (_rng.standard_normal(65536) * scale).astype(dtype)
    reps = n // block.size + 1
    return np.broadcast_to(block, (reps, block.size)).reshape(-1)[:n].reshape(shape).copy()


def random_quant_tensor(gtype: GGMLType, out: int, cols: int, scale=0.02) -> QuantTensor:
    """QuantTensor with random codes and constant scales (no quantize pass)."""
    bs = TYPE_TRAITS[gtype].block_size
    assert cols % bs == 0, (
        f"{TYPE_TRAITS[gtype].name}: width {cols} not divisible by block {bs} "
        "(the reference has the same constraint: K-quants need QK_K-divisible "
        "dims, libfalcon.cpp:3626-3635 — Falcon-7B uses legacy formats)")
    nb = cols // bs
    kq = TYPE_TRAITS[gtype].name.endswith("K")
    sub_groups = {"q2_K": 16, "q3_K": 16, "q6_K": 16, "q4_K": 8, "q5_K": 8}.get(
        TYPE_TRAITS[gtype].name)
    planes: dict[str, np.ndarray] = {}
    for key in _PLANE_ORDER[gtype]:
        if key in ("d", "dmin") and kq:
            # fp16 bit patterns (two-level K-quant super-block scales)
            planes[key] = np.full((out, nb), np.float16(scale / 8).view(np.int16),
                                  dtype=np.int16)
        elif key == "d":
            # fp16-exact value, like real file scales (fp16 on disk)
            planes[key] = np.full((out, nb), np.float16(scale / 8), dtype=np.float32)
        elif key == "m":
            planes[key] = np.full((out, nb), np.float16(scale / 16), dtype=np.float32)
        elif key in ("sc", "scm"):
            planes[key] = _rng.integers(1, 32, (out, nb, sub_groups), dtype=np.int8)
        elif key == "scb":
            planes[key] = _rng.integers(0, 256, (out, nb, 16), dtype=np.uint8)
        elif key == "qh" and gtype in (GGMLType.Q5_0, GGMLType.Q5_1):
            planes[key] = _rng.integers(0, 2**32, (out, nb), dtype=np.uint32)
        elif key == "qs" and gtype == GGMLType.Q8_0:
            planes[key] = _rng.integers(-127, 128, (out, nb, 32), dtype=np.int8)
        else:
            nbytes = {
                ("q4_0", "qs"): 16, ("q4_1", "qs"): 16, ("q5_0", "qs"): 16,
                ("q5_1", "qs"): 16,
                ("q2_K", "qs"): 64, ("q3_K", "qs"): 64, ("q3_K", "hmask"): 32,
                ("q4_K", "qs"): 128, ("q5_K", "qs"): 128, ("q5_K", "qh"): 32,
                ("q6_K", "ql"): 128, ("q6_K", "qh"): 64,
            }[(TYPE_TRAITS[gtype].name, key)]
            planes[key] = _rng.integers(0, 256, (out, nb, nbytes), dtype=np.uint8)
    return QuantTensor(gtype, (out, cols), planes)


_byte_block = None


def _tiled_bytes(shape) -> np.ndarray:
    """Cheap large random byte array: tile a 64k random block."""
    global _byte_block
    if _byte_block is None:
        _byte_block = _rng.integers(0, 256, 65536, dtype=np.uint8)
    n = int(np.prod(shape))
    reps = n // _byte_block.size + 1
    return np.broadcast_to(_byte_block, (reps, _byte_block.size)).reshape(-1)[:n] \
        .reshape(shape).copy()


def fast_kernel_quant(gtype: GGMLType, out: int, cols: int, scale=0.02,
                      device: bool = False):
    """Random KernelQuant built DIRECTLY in fused-kernel layout.

    Skips the planar-representation + to_kernel repack entirely (the repack is
    the model-load hot path and costs ~40-100 s for a 7B on a 1-core host —
    round-3 bench timed out on it). Code planes get tiled random bytes (the
    unpack chain is data-independent, so perf is identical to real weights),
    scales get the same fp16-exact constants make_bench_params always used.
    Shapes/dtypes are test-enforced equal to kernels/layout.to_kernel output
    (tests/test_kernels.py::test_fast_kernel_quant_layout_matches).

    device=True generates the code planes ON DEVICE with jax.random — zero
    host->device upload, which matters through the device tunnel (~850 MB of
    7B params measured 15-60 s to push; device generation is ~free).
    """
    from ggllm_tpu.kernels import layout as klayout

    if device:
        import jax

        key = jax.random.key(42)

        def rand_bytes(shape):
            nonlocal key
            key, sub = jax.random.split(key)
            return jax.random.bits(sub, shape, dtype=jnp.uint8)

        full = jnp.full
    else:
        rand_bytes = _tiled_bytes
        full = np.full

    spec = klayout.FORMATS[gtype]
    step = 256 if spec.two_level else 128
    kp = klayout.padded_k(cols, step)
    ck = klayout.choose_ck(kp, step, ck_max=klayout._ck_cap(spec))
    n_k = kp // ck
    planes: dict = {}
    for name, bits, _shift in spec.planes:
        if bits == 8:
            planes[name] = rand_bytes((n_k, ck, out)).view(np.int8)
        else:
            planes[name] = rand_bytes((n_k, ck * bits // 8, out))
    d16 = np.float16(scale / 8).view(np.int16)
    if spec.two_level:
        for sname in spec.scale_names:
            if sname in ("db", "dminb"):
                planes[sname] = full((n_k, ck // 256, out), d16, np.int16)
            elif sname == "scb":  # Q2_K packed 4-bit scale | 4-bit min
                planes[sname] = rand_bytes((n_k, ck // spec.group, out))
            else:  # sc / scm: small integer sub-scales
                planes[sname] = (rand_bytes((n_k, ck // spec.group, out))
                                 % 31 + 1).astype(np.int8)
    else:
        planes["ds"] = full((n_k, ck // spec.group, out), d16, np.int16)
        if spec.has_min:
            sign = -1.0 if gtype in (GGMLType.Q4_1, GGMLType.Q5_1) else 1.0
            planes["ms"] = full((n_k, ck // spec.group, out),
                                np.float16(sign * scale / 16).view(np.int16),
                                np.int16)
    return klayout.KernelQuant(gtype, (out, cols), ck, planes)


def make_bench_params(
    hp: FalconHParams,
    gtype: GGMLType = GGMLType.Q4_0,
    compute_dtype=jnp.bfloat16,
    kernel: bool | None = None,
    distinct: bool = False,
):
    """Full parameter pytree at hp's scale with quantized 2-D weights.

    kernel=None: auto — fused-kernel layout (KernelQuant) on TPU, planar
    QuantTensors elsewhere.
    distinct=True gives every layer its own device buffers (like a real
    checkpoint) instead of aliasing one prototype layer — use to validate
    that buffer sharing doesn't flatter HBM-bandwidth measurements.
    """
    import jax

    from ggllm_tpu.kernels import layout as klayout

    if kernel is None:
        kernel = jax.default_backend() == "tpu"
    E, H, KV, D, F, V = hp.n_embd, hp.n_head, hp.n_head_kv, hp.head_dim, hp.n_ff, hp.n_vocab

    def qw(out, cols):
        if kernel:
            return fast_kernel_quant(gtype, out, cols, device=True)
        return random_quant_tensor(gtype, out, cols)

    def stack_qt(parts: list):
        planes = {
            k: jnp.asarray(np.stack([p.planes[k] for p in parts]))
            for k in parts[0].planes
        }
        if kernel:
            return klayout.KernelQuant(parts[0].gtype, parts[0].shape, parts[0].ck, planes)
        return QuantTensor(parts[0].gtype, parts[0].shape, planes)

    def to_device(qt):
        planes = {k: jnp.asarray(v) for k, v in qt.planes.items()}
        if kernel:
            return klayout.KernelQuant(qt.gtype, qt.shape, qt.ck, planes)
        return QuantTensor(qt.gtype, qt.shape, planes)

    L = hp.n_layer
    parallel_norms = hp.n_falcon_type >= 40
    n_qkv = (H + 2 * KV) * D
    if kernel:
        # merged, UNSTACKED layout: list of per-layer dicts, one buffer per
        # weight (io/loader; decode unrolls, no scan slice copies). By
        # default the random planes are built once and shared across layers
        # — bench cares about bytes streamed, not values (validated: the
        # distinct=True variant measures the same decode throughput).
        def build_layer():
            lw = {
                "input_ln_w": jnp.ones(E, jnp.float32),
                "input_ln_b": jnp.zeros(E, jnp.float32),
                "w_od": to_device(qw(E, H * D + F)),
            }
            if parallel_norms:
                lw["wqkv"] = to_device(qw(n_qkv, E))
                lw["ffn_up"] = to_device(qw(F, E))
                lw["attn_ln_w"] = jnp.ones(E, jnp.float32)
                lw["attn_ln_b"] = jnp.zeros(E, jnp.float32)
            else:
                lw["wqkvu"] = to_device(qw(n_qkv + F, E))
            return lw

        # ONE jitted program builds every buffer on device: no host->device
        # upload and a single dispatch (dozens of separate small random/full
        # dispatches each pay tunnel round-trip latency, which fluctuates
        # from ms to minutes on the shared compile service)
        def build_all():
            protos = [build_layer() for _ in range(L if distinct else 1)]
            return {
                "tok_embeddings": jax.random.normal(
                    jax.random.key(7), (V, E), compute_dtype) * 0.02,
                "output_norm": jnp.ones(E, jnp.float32),
                "output_norm_b": jnp.zeros(E, jnp.float32),
                "lm_head": qw(V, E),
            }, protos

        out, protos = jax.jit(build_all)()
        out["layers"] = protos if distinct else [dict(protos[0]) for _ in range(L)]
        return out
    else:
        layers = {
            "input_ln_w": jnp.ones((L, E), jnp.float32),
            "input_ln_b": jnp.zeros((L, E), jnp.float32),
            "wq": stack_qt([qw(H * D, E) for _ in range(L)]),
            "wk": stack_qt([qw(KV * D, E) for _ in range(L)]),
            "wv": stack_qt([qw(KV * D, E) for _ in range(L)]),
            "wo": stack_qt([qw(E, H * D) for _ in range(L)]),
            "ffn_up": stack_qt([qw(F, E) for _ in range(L)]),
            "ffn_down": stack_qt([qw(E, F) for _ in range(L)]),
        }
        if parallel_norms:
            layers["attn_ln_w"] = jnp.ones((L, E), jnp.float32)
            layers["attn_ln_b"] = jnp.zeros((L, E), jnp.float32)

    return {
        "tok_embeddings": jnp.asarray(_tiled_random((V, E)), dtype=compute_dtype),
        "output_norm": jnp.ones(E, jnp.float32),
        "output_norm_b": jnp.zeros(E, jnp.float32),
        "lm_head": to_device(qw(V, E)),
        "layers": layers,
    }


def make_llama_bench_params(
    hp,
    gtype: GGMLType = GGMLType.Q4_0,
    compute_dtype=jnp.bfloat16,
):
    """LLaMA-geometry parameter pytree in the merged kernel layout
    (io/loader._load_llama_params keys: wqkv = [wq;wk;wv] rows,
    w13 = [gate;up] rows, wo, w2)."""
    from ggllm_tpu.kernels import layout as klayout

    E, F, V, L = hp.n_embd, hp.n_ff, hp.n_vocab, hp.n_layer

    def qw(out, cols):
        return fast_kernel_quant(gtype, out, cols, device=True)

    def dev(kq):
        return klayout.KernelQuant(
            kq.gtype, kq.shape, kq.ck,
            {k: jnp.asarray(v) for k, v in kq.planes.items()})

    def build_all():  # one program: see make_bench_params
        proto = {
            "attn_norm": jnp.ones(E, jnp.float32),
            "ffn_norm": jnp.ones(E, jnp.float32),
            "wqkv": dev(qw(3 * E, E)),
            "w13": dev(qw(2 * F, E)),
            "wo": dev(qw(E, E)),
            "w2": dev(qw(E, F)),
        }
        return {
            "tok_embeddings": jax.random.normal(jax.random.key(7), (V, E),
                                                compute_dtype) * 0.02,
            "output_norm": jnp.ones(E, jnp.float32),
            "lm_head": dev(qw(V, E)),
        }, proto

    import jax

    out, proto = jax.jit(build_all)()
    out["layers"] = [dict(proto) for _ in range(L)]
    return out
