"""Model loading: GGCC file -> device parameter pytree.

The analogue of falcon_model_load_internal (libfalcon.cpp:1552-1959), minus
everything XLA already owns (arena sizing, VRAM simulation, backend
assignment). Per-layer weights are stacked on a leading layer axis so the
model's layer loop is a lax.scan; 2-D weights either dequantize to a compute
dtype at load ("dequant" mode) or stay packed as planar QuantTensors
("fused" mode) for the Pallas kernels.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.io.ggcc import ModelFile, read_model
from ggllm_tpu.ops.linear import QuantTensor
from ggllm_tpu.quant import planar


def _layer_names(hp: FalconHParams, i: int) -> dict[str, str]:
    """Tensor names per layer (libfalcon.cpp:1845-1861)."""
    p = f"transformer.h.{i}"
    names = {
        "qkv": f"{p}.self_attention.query_key_value.weight",
        "wo": f"{p}.self_attention.dense.weight",
        "ffn_up": f"{p}.mlp.dense_h_to_4h.weight",
        "ffn_down": f"{p}.mlp.dense_4h_to_h.weight",
    }
    if hp.n_falcon_type >= 40:
        names.update(
            input_ln_w=f"{p}.ln_mlp.weight",
            input_ln_b=f"{p}.ln_mlp.bias",
            attn_ln_w=f"{p}.ln_attn.weight",
            attn_ln_b=f"{p}.ln_attn.bias",
        )
    else:
        names.update(
            input_ln_w=f"{p}.input_layernorm.weight",
            input_ln_b=f"{p}.input_layernorm.bias",
        )
    return names


def _load_matrix(mf: ModelFile, name: str, mode: str, dtype, lora=None):
    """2-D weight -> dense jnp array (out, in) or QuantTensor planes (numpy)."""
    t = mf.tensors[name]
    if lora is not None and name in lora.tensors:
        # LoRA-patched weights densify (libfalcon.cpp:4100-4160 semantics:
        # base dequant + scaling*B@A replaces the quantized tensor)
        from ggllm_tpu.io import lora as lora_mod

        return lora_mod.apply_to_matrix(
            mf.tensor_f32(name).astype(np.float32), lora, name
        ).astype(dtype)
    if mode == "dequant" or not GGMLType(t.gtype).name.startswith("Q"):
        return mf.tensor_f32(name).astype(dtype)
    rows, cols = t.shape  # numpy convention: (out, in)
    planes = planar.to_planes(t.gtype, mf.tensor_blob(name), rows, cols)
    return QuantTensor(t.gtype, (rows, cols), planes)


def _split_rows(w, sections: list[tuple[int, int]]):
    """Split a (out, in) weight by output-row ranges (dense or QuantTensor)."""
    if isinstance(w, QuantTensor):
        parts = []
        for lo, hi in sections:
            planes = {k: v[lo:hi] for k, v in w.planes.items()}
            parts.append(QuantTensor(w.gtype, (hi - lo, w.shape[1]), planes))
        return parts
    return [w[lo:hi] for lo, hi in sections]


def _split_qkv(w, hp: FalconHParams):
    """Fused [Q; K; V] rows -> (wq, wk, wv)."""
    hd = hp.head_dim
    q_end = hp.n_head * hd
    k_end = q_end + hp.n_head_kv * hd
    v_end = k_end + hp.n_head_kv * hd
    return _split_rows(w, [(0, q_end), (q_end, k_end), (k_end, v_end)])


def _stack(trees: list):
    """Stack a list of identical pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *trees)


def _use_kernel_layout(cfg: EngineConfig, mesh) -> bool:
    if cfg.weight_mode != "fused":
        return False
    if cfg.kernel_layout is not None:
        return cfg.kernel_layout
    return mesh is None and jax.default_backend() == "tpu"


def _to_kernel(w):
    """QuantTensor -> KernelQuant (host-side repack); dense passes through."""
    from ggllm_tpu.kernels import layout as klayout

    if isinstance(w, QuantTensor):
        return klayout.to_kernel(w.gtype, w.planes, w.shape)
    return w


def _mergeable(a, b) -> bool:
    return (
        isinstance(a, QuantTensor) and isinstance(b, QuantTensor)
        and a.gtype == b.gtype
    ) or (not isinstance(a, QuantTensor) and not isinstance(b, QuantTensor))


def _merge_kernel_weights(lw: dict, qkv, up, wo, down, parallel_norms: bool):
    """Kernel-path weight merging: fewer matmul launches per layer.

    * shared-norm models (7B): [QKV; FFN-up] output rows merge -> "wqkvu"
      (one launch feeds attention and the FFN);
    * wo / FFN-down merge along the contraction dim -> "w_od", fed
      concat([attn, gelu(ff)]);
    * mixed dense/quant or mixed-format pairs stay separate ("wqkv" + the
      usual split keys).
    """
    from ggllm_tpu.kernels import layout as klayout

    def dense(w):
        return not isinstance(w, QuantTensor)

    if not parallel_norms and _mergeable(qkv, up):
        if dense(qkv):
            lw["wqkvu"] = jnp.concatenate([jnp.asarray(qkv), jnp.asarray(up)], axis=0)
        else:
            planes = klayout.merge_out([qkv.planes, up.planes])
            shape = (qkv.shape[0] + up.shape[0], qkv.shape[1])
            lw["wqkvu"] = klayout.to_kernel(qkv.gtype, planes, shape)
    else:
        lw["wqkv"] = _to_kernel(qkv)
        lw["ffn_up"] = _to_kernel(up)

    if _mergeable(wo, down):
        if dense(wo):
            lw["w_od"] = jnp.concatenate([jnp.asarray(wo), jnp.asarray(down)], axis=1)
        else:
            planes = klayout.merge_in([wo.planes, down.planes])
            shape = (wo.shape[0], wo.shape[1] + down.shape[1])
            lw["w_od"] = klayout.to_kernel(wo.gtype, planes, shape)
    else:
        lw["wo"] = _to_kernel(wo)
        lw["ffn_down"] = _to_kernel(down)
    return lw


def _llama_names(i: int) -> dict[str, str]:
    """Tensor names per LLaMA layer (llama.cpp:1124-1151)."""
    p = f"layers.{i}"
    return {
        "attn_norm": f"{p}.attention_norm.weight",
        "wq": f"{p}.attention.wq.weight",
        "wk": f"{p}.attention.wk.weight",
        "wv": f"{p}.attention.wv.weight",
        "wo": f"{p}.attention.wo.weight",
        "ffn_norm": f"{p}.ffn_norm.weight",
        "w1": f"{p}.feed_forward.w1.weight",
        "w2": f"{p}.feed_forward.w2.weight",
        "w3": f"{p}.feed_forward.w3.weight",
    }


def _merge_rows_kernel(parts):
    """Same-format QuantTensors -> one KernelQuant over concatenated rows;
    None when not mergeable (mixed dense/format)."""
    from ggllm_tpu.kernels import layout as klayout

    if all(not isinstance(p, QuantTensor) for p in parts):
        return jnp.concatenate([jnp.asarray(p) for p in parts], axis=0)
    if not all(isinstance(p, QuantTensor) for p in parts):
        return None
    if len({p.gtype for p in parts}) != 1:
        return None
    planes = klayout.merge_out([p.planes for p in parts])
    shape = (sum(p.shape[0] for p in parts), parts[0].shape[1])
    return klayout.to_kernel(parts[0].gtype, planes, shape)


def _progress(cb, i: int, n: int, what: str):
    """Loader progress hook (the reference's falcon_progress_callback,
    libfalcon.h:77, default bar libfalcon.cpp:3848-3885)."""
    if cb is not None:
        cb(i / max(n, 1), what)


def _parallel_layers(build, n_layer: int, progress=None, on_item=None) -> list:
    """Run the per-layer load+repack across worker threads.

    The repack (kernels/layout.to_kernel — bit-plane extraction and
    re-chunking) is big-array numpy that releases the GIL, so threads give
    a near-linear host-side speedup; the reference's analogue is its
    multithreaded dequant/quantize pools (libfalcon.cpp:3475-3531).
    Disable with GGLLM_LOAD_THREADS=1. Progress reports completion order.
    """
    import os
    from concurrent.futures import ThreadPoolExecutor

    workers = int(os.environ.get("GGLLM_LOAD_THREADS", 0) or 0)
    if workers <= 0:
        workers = min(8, os.cpu_count() or 1, n_layer)
    if workers <= 1:
        out = []
        for i in range(n_layer):
            _progress(progress, i, n_layer, f"layer {i}/{n_layer}")
            out.append(build(i))
            if on_item is not None:
                on_item(i, out[-1])
        return out
    done = 0
    with ThreadPoolExecutor(workers) as ex:
        futs = [ex.submit(build, i) for i in range(n_layer)]
        out = []
        for i, f in enumerate(futs):
            out.append(f.result())
            if on_item is not None:
                on_item(i, out[-1])
            done += 1
            _progress(progress, done, n_layer, f"layer {done}/{n_layer}")
    return out


def _load_llama_params(mf: ModelFile, cfg: EngineConfig, kernel: bool,
                       lora, dtype, progress=None, host_arrays: bool = False,
                       on_layer=None) -> dict:
    hp = mf.hparams
    mode = cfg.weight_mode
    wrap = (lambda a: a) if host_arrays else jnp.asarray
    params: dict = {
        "tok_embeddings": wrap(
            mf.tensor_f32("tok_embeddings.weight").astype(dtype)),
        "output_norm": wrap(mf.tensor_f32("norm.weight")),
        "lm_head": _to_kernel(_load_matrix(mf, "output.weight", mode, dtype, lora))
        if kernel else _load_matrix(mf, "output.weight", mode, dtype, lora),
    }
    # a LoRA-patched key densifies in every layer (stack/merge homogeneity)
    dense_keys: set[str] = set()
    if lora is not None:
        for i in range(hp.n_layer):
            for k, t in _llama_names(i).items():
                if t in lora.tensors:
                    dense_keys.add(k)
    # the reference's mixed K-type policy gives the SAME key different types
    # across layers (use_more_bits on wv/w2, llama.cpp:2495-2513); stacked
    # and row-merged layouts need homogeneous blocks, so such keys densify
    for k in _llama_names(0):
        types = {mf.tensors[_llama_names(i)[k]].gtype
                 for i in range(hp.n_layer) if _llama_names(i)[k] in mf.tensors}
        if len(types) > 1:
            dense_keys.add(k)

    def build_layer(i: int) -> dict:
        names = _llama_names(i)
        lw: dict = {
            "attn_norm": mf.tensor_f32(names["attn_norm"]).astype(np.float32),
            "ffn_norm": mf.tensor_f32(names["ffn_norm"]).astype(np.float32),
        }
        mats = {k: _load_matrix(mf, names[k],
                                "dequant" if k in dense_keys else mode,
                                dtype, lora)
                for k in ("wq", "wk", "wv", "wo", "w1", "w2", "w3")}
        if kernel:
            wqkv = _merge_rows_kernel([mats["wq"], mats["wk"], mats["wv"]])
            if wqkv is not None:
                lw["wqkv"] = wqkv
            else:
                for k in ("wq", "wk", "wv"):
                    lw[k] = _to_kernel(mats[k])
            w13 = _merge_rows_kernel([mats["w1"], mats["w3"]])
            if w13 is not None:
                lw["w13"] = w13
            else:
                lw["w1"] = _to_kernel(mats["w1"])
                lw["w3"] = _to_kernel(mats["w3"])
            lw["wo"] = _to_kernel(mats["wo"])
            lw["w2"] = _to_kernel(mats["w2"])
        else:
            lw.update(mats)
        return lw

    layers = _parallel_layers(build_layer, hp.n_layer, progress,
                              on_item=on_layer if kernel else None)
    if kernel:
        params["layers"] = (layers if host_arrays else
                            [jax.tree.map(jnp.asarray, lw) for lw in layers])
    else:
        params["layers"] = _stack(layers)
    return params


def _try_load_falcon_tp(mf: ModelFile, cfg: EngineConfig, mesh, lora, dtype):
    """Tensor-parallel fused-kernel params (parallel/tp.py). Returns None
    when the model/mesh doesn't fit the TP plan (mixed formats, LoRA-densified
    weights, data axis) — the caller falls back to the GSPMD path."""
    from ggllm_tpu.parallel import tp

    hp = mf.hparams
    if lora is not None or mesh.shape.get("data", 1) != 1:
        return None
    try:
        plan = tp.TpPlan(hp, mesh.shape["model"])
    except AssertionError:
        return None

    layers = []
    for i in range(hp.n_layer):
        names = _layer_names(hp, i)
        mats = {k: _load_matrix(mf, names[k], "fused", dtype)
                for k in ("qkv", "ffn_up", "wo", "ffn_down")}
        if not all(isinstance(m, QuantTensor) for m in mats.values()):
            return None
        if len({m.gtype for m in mats.values()}) != 1:
            return None
        lw = {
            "input_ln_w": mf.tensor_f32(names["input_ln_w"]).astype(np.float32),
            "input_ln_b": mf.tensor_f32(names["input_ln_b"]).astype(np.float32),
        }
        if hp.n_falcon_type >= 40:
            lw["attn_ln_w"] = mf.tensor_f32(names["attn_ln_w"]).astype(np.float32)
            lw["attn_ln_b"] = mf.tensor_f32(names["attn_ln_b"]).astype(np.float32)
        try:
            lw.update(tp.build_tp_layer(
                mats["qkv"], mats["ffn_up"], mats["wo"], mats["ffn_down"],
                plan, merge_up=hp.n_falcon_type < 40))
        except AssertionError:
            return None
        layers.append(lw)

    params = {
        "tok_embeddings": mf.tensor_f32("transformer.word_embeddings.weight").astype(dtype),
        "output_norm": mf.tensor_f32("transformer.ln_f.weight"),
        "output_norm_b": mf.tensor_f32("transformer.ln_f.bias"),
        "lm_head": _to_kernel(_load_matrix(mf, "lm_head.weight", "fused", dtype)),
        "layers": layers,
    }
    return tp.shard_tp_params(params, mesh)


def _try_load_llama_tp(mf: ModelFile, cfg: EngineConfig, mesh, lora, dtype):
    """Device-blocked llama TP params (parallel/tp.py); None if infeasible."""
    from ggllm_tpu.parallel import tp

    hp = mf.hparams
    if lora is not None or mesh.shape.get("data", 1) != 1:
        return None
    if cfg.weight_mode != "fused":
        return None
    try:
        plan = tp.TpPlan(hp, mesh.shape["model"])
    except AssertionError:
        return None

    layers = []
    for i in range(hp.n_layer):
        names = _llama_names(i)
        mats = {k: _load_matrix(mf, names[k], "fused", dtype)
                for k in ("wq", "wk", "wv", "wo", "w1", "w2", "w3")}
        if not all(isinstance(m, QuantTensor) for m in mats.values()):
            return None
        if len({m.gtype for m in mats.values()}) != 1:
            return None
        lw = {
            "attn_norm": mf.tensor_f32(names["attn_norm"]).astype(np.float32),
            "ffn_norm": mf.tensor_f32(names["ffn_norm"]).astype(np.float32),
        }
        try:
            lw.update(tp.build_tp_llama_layer(
                mats["wq"], mats["wk"], mats["wv"], mats["wo"],
                mats["w1"], mats["w2"], mats["w3"], plan))
        except AssertionError:
            return None
        layers.append(lw)

    params = {
        "tok_embeddings": mf.tensor_f32("tok_embeddings.weight").astype(dtype),
        "output_norm": mf.tensor_f32("norm.weight"),
        "lm_head": _to_kernel(_load_matrix(mf, "output.weight", "fused", dtype)),
        "layers": layers,
    }
    return tp.shard_tp_params(params, mesh)


def _with_lora_base(mf: ModelFile, base_mf: ModelFile, patched) -> ModelFile:
    """View of mf whose LoRA-patched tensors read from a separate base model.

    The reference's --lora-base (libfalcon.cpp:4091-4110): when applying an
    adapter to a quantized model, base weights come from an f16 model so the
    delta is added to unquantized values rather than a dequantized
    approximation."""
    import copy

    view = copy.copy(mf)
    view._mm = None  # do not share the memmap cache with the original

    def tensor_f32(name: str, _orig=type(mf).tensor_f32):
        if name in patched and name in base_mf.tensors:
            return base_mf.tensor_f32(name)
        return _orig(view, name)

    view.tensor_f32 = tensor_f32
    return view


def load_params(
    mf: ModelFile,
    cfg: EngineConfig | None = None,
    mesh=None,
    lora=None,
    lora_base=None,
    progress=None,
    host_arrays: bool = False,
    on_layer=None,
) -> dict:
    """Build the parameter pytree from a parsed model file.

    lora: optional LoraFile or path to a 'ggla' adapter; matched weights are
    densified with the scaled delta applied.
    lora_base: optional ModelFile or path of an unquantized model whose
    tensors serve as the base for LoRA-patched weights (--lora-base).
    progress: optional callback(fraction, description) invoked while layers
    load (falcon_progress_callback analogue, libfalcon.h:77).
    host_arrays: leave leaves as plain numpy instead of committing them to
    a jax device — the cacheable cold-load path wants a host tree it can
    stream to BOTH the sidecar cache and the device without extra copies.
    """
    cfg = cfg or EngineConfig()
    hp = mf.hparams
    dtype = jnp.dtype(cfg.compute_dtype)
    mode = cfg.weight_mode
    kernel = _use_kernel_layout(cfg, mesh)
    conv = _to_kernel if kernel else (lambda w: w)
    if isinstance(lora, str):
        from ggllm_tpu.io import lora as lora_mod

        lora = lora_mod.read_lora(lora)
    if lora is not None:
        if isinstance(lora_base, str):
            lora_base = read_model(lora_base)
        quantized_patch = any(
            name in mf.tensors
            and GGMLType(mf.tensors[name].gtype).name.startswith("Q")
            for name in lora.tensors
        )
        if lora_base is not None:
            # the reference errors when a patched tensor is absent from the
            # base model (libfalcon.cpp:4095-4098) rather than silently
            # falling back to the quantized model's dequantized values
            missing = [n for n in lora.tensors
                       if n in mf.tensors and n not in lora_base.tensors]
            if missing:
                raise ValueError(
                    f"--lora-base model is missing LoRA-patched tensor(s) "
                    f"{missing[:3]}{'...' if len(missing) > 3 else ''}")
            mf = _with_lora_base(mf, lora_base, set(lora.tensors))
        elif quantized_patch:
            import warnings

            warnings.warn(
                "applying a LoRA adapter to quantized tensors without "
                "--lora-base: deltas are added to dequantized values, which "
                "may degrade quality (libfalcon.cpp:4110-4116)")
    if mf.arch == "llama":
        if mesh is not None:
            tp_params = None
            if cfg.kernel_layout is not False:
                tp_params = _try_load_llama_tp(mf, cfg, mesh, lora, dtype)
            if tp_params is None:
                raise NotImplementedError(
                    "multi-chip LLaMA needs the TP plan (uniform quant type, "
                    "mp | n_head, no LoRA, no data axis)")
            return tp_params
        return _load_llama_params(mf, cfg, kernel, lora, dtype,
                                  progress=progress, host_arrays=host_arrays,
                                  on_layer=on_layer)
    if (mesh is not None and mode == "fused" and cfg.kernel_layout is not False):
        tp_params = _try_load_falcon_tp(mf, cfg, mesh, lora, dtype)
        if tp_params is not None:
            return tp_params
    # layer weights are stacked for lax.scan, so a key patched in ANY layer
    # must densify in EVERY layer (mixed QuantTensor/dense cannot stack)
    dense_keys: set[str] = set()
    if lora is not None:
        for i in range(hp.n_layer):
            for key, tname in _layer_names(hp, i).items():
                if tname in lora.tensors:
                    dense_keys.add(key)

    def layer_mode(key: str) -> str:
        return "dequant" if key in dense_keys else mode

    wrap = (lambda a: a) if host_arrays else jnp.asarray
    params: dict = {
        # embeddings stay dense: get_rows needs random row access
        "tok_embeddings": wrap(
            mf.tensor_f32("transformer.word_embeddings.weight").astype(dtype)
        ),
        "output_norm": wrap(mf.tensor_f32("transformer.ln_f.weight")),
        "output_norm_b": wrap(mf.tensor_f32("transformer.ln_f.bias")),
        "lm_head": conv(_load_matrix(mf, "lm_head.weight", mode, dtype, lora)),
    }

    def build_layer(i: int) -> dict:
        names = _layer_names(hp, i)
        lw: dict = {}
        for key in ("input_ln_w", "input_ln_b"):
            lw[key] = mf.tensor_f32(names[key]).astype(np.float32)
        if hp.n_falcon_type >= 40:
            for key in ("attn_ln_w", "attn_ln_b"):
                lw[key] = mf.tensor_f32(names[key]).astype(np.float32)
        qkv = _load_matrix(mf, names["qkv"], layer_mode("qkv"), dtype, lora)
        if kernel:
            up = _load_matrix(mf, names["ffn_up"], layer_mode("ffn_up"), dtype, lora)
            wo = _load_matrix(mf, names["wo"], layer_mode("wo"), dtype, lora)
            down = _load_matrix(mf, names["ffn_down"], layer_mode("ffn_down"), dtype, lora)
            _merge_kernel_weights(lw, qkv, up, wo, down, hp.n_falcon_type >= 40)
        else:
            lw["wq"], lw["wk"], lw["wv"] = _split_qkv(qkv, hp)
            for key in ("wo", "ffn_up", "ffn_down"):
                lw[key] = _load_matrix(mf, names[key], layer_mode(key), dtype, lora)
        return lw

    layers = _parallel_layers(build_layer, hp.n_layer, progress,
                              on_item=on_layer if kernel else None)

    if kernel:
        # keep layers unstacked: the unrolled decode loop feeds each layer's
        # buffers straight to the Pallas kernels (no scan slice copies)
        params["layers"] = (layers if host_arrays else
                            [jax.tree.map(jnp.asarray, lw) for lw in layers])
    else:
        params["layers"] = _stack(layers)
    return params


def _cache_fingerprint(cfg: EngineConfig, kernel: bool) -> dict:
    """Config knobs that change the parameter tree's contents."""
    return {
        "weight_mode": cfg.weight_mode,
        "compute_dtype": str(jnp.dtype(cfg.compute_dtype)),
        "kernel": kernel,
    }


def preseed_kcache(model_path: str) -> str:
    """Build the default-config kernel-layout tree for model_path and write
    its .kcache sidecar, so the FIRST serving load is a memmap read + device
    upload instead of a host repack (chasing the reference's mmap-and-go
    cold load, llama-util.h:176). Called by the quantizer (default on) and
    the converters (--kcache): the emitted artifact IS the serving artifact;
    the GGCC/GGJT file stays the portable/metadata form."""
    import contextlib

    from ggllm_tpu.io import param_cache
    from ggllm_tpu.io.ggcc import read_model

    cfg = EngineConfig(kernel_layout=True)
    mf = read_model(model_path)
    cpu = _host_cpu_device()
    with (jax.default_device(cpu) if cpu is not None
          else contextlib.nullcontext()):
        params = load_params(mf, cfg, host_arrays=cpu is not None)
    return param_cache.save(model_path, params, _cache_fingerprint(cfg, True))


def load_model(path: str, cfg: EngineConfig | None = None, mesh=None,
               lora=None, lora_base=None, progress=None):
    """Convenience: parse file + build params. Returns (ModelFile, params).

    The kernel-layout host repack takes minutes for multi-GB files on this
    single-core host, so the built tree is cached next to the model
    (<model>.kcache, io/param_cache.py) and reused while the file and
    config fingerprint match. GGLLM_PARAM_CACHE=0 disables. LoRA and mesh
    loads are not cached (adapter deltas / per-shard repacks)."""
    mf = read_model(path)
    cfg = cfg or EngineConfig()
    cacheable = (
        lora is None and mesh is None
        and os.environ.get("GGLLM_PARAM_CACHE", "1") != "0"
    )
    if cacheable:
        from ggllm_tpu.io import param_cache

        fp = _cache_fingerprint(cfg, _use_kernel_layout(cfg, mesh))
        host = param_cache.try_load(path, fp)
        if host is not None:
            _progress(progress, 1, 1, "cached")
            return mf, jax.device_put(host, jax.devices()[0])
        cpu = _host_cpu_device()
        if cpu is not None:
            import threading

            d0 = jax.devices()[0]
            # per-layer pipelined upload: transfers on this platform are
            # async (enqueue-and-return), so uploading each layer as its
            # repack completes streams the weights to the device UNDER the
            # remaining host work instead of after it
            dev_layers: list = []

            def on_layer(i, lw):
                dev_layers.append(jax.device_put(lw, d0))

            # numpy host tree: zero extra copies into either consumer, and
            # any stray jnp op stays on the CPU device
            with jax.default_device(cpu):
                params = load_params(mf, cfg, progress=progress,
                                     host_arrays=True, on_layer=on_layer)
            # overlap the two 5-GB streams: the sidecar-cache disk write and
            # the device upload both only READ the host tree (disk I/O
            # releases the GIL, the upload is DMA), so running them
            # concurrently hides the shorter under the longer
            save_err: list[BaseException] = []

            def _save():
                # any failure (not just OSError — e.g. an unserializable
                # leaf) must surface as a warning, not die silently in the
                # daemon thread; param_cache.save unlinks its .tmp on error
                try:
                    param_cache.save(path, params, fp)
                except Exception as e:
                    save_err.append(e)

            t = threading.Thread(target=_save, daemon=True)
            t.start()
            if len(dev_layers) == len(params.get("layers", [])) and dev_layers:
                rest = {k: v for k, v in params.items() if k != "layers"}
                dev = jax.device_put(rest, d0)
                dev["layers"] = dev_layers
            else:  # stacked/llama-TP trees: no per-layer hook fired
                dev = jax.device_put(params, d0)
            t.join()
            if save_err:
                import warnings

                warnings.warn(f"param cache write failed: {save_err[0]}")
            _progress(progress, 1, 1, "done")
            return mf, dev
    params = load_params(mf, cfg, mesh=mesh, lora=lora, lora_base=lora_base,
                         progress=progress)
    _progress(progress, 1, 1, "done")
    return mf, params


def _host_cpu_device():
    """The host CPU jax device, or None if the CPU backend is unavailable
    (then params build directly on the default device and are not cached)."""
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None
