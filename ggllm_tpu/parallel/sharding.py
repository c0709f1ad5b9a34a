"""Parameter / KV-cache sharding specs (Megatron TP over the "model" axis).

The mapping from the reference's multi-GPU row split (SURVEY §2.9):
GGML_BACKEND_GPU_SPLIT row-sharding of a weight == sharding its output dim
over "model"; the per-row-slice cudaMemcpy gather loop
(ggml-cuda.cu:2779-2795) becomes the XLA all-reduce/all-gather that GSPMD
inserts from these annotations.

Layout decisions:
* wq / ffn_up: output-dim sharded (column-parallel) — activations come out
  sharded by head / ff slice, no collective;
* wo / ffn_down: input-dim sharded (row-parallel) — psum on exit, the one
  all-reduce per block pair;
* wk / wv + KV cache: sharded over kv heads when n_head_kv divides the model
  axis (40B: 8 kv heads), else replicated (7B MQA: one kv head, a few MB);
* lm_head: vocab-sharded; logits all-gather at the very end (260 KB);
* tok_embeddings: embd-dim sharded (token gather stays local; the layernorm
  that follows forces one small all-gather).

Q heads (71 for 7B) do not divide typical mesh sizes; GSPMD pads the head
axis transparently, so wq output sharding stays legal on any mesh.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ggllm_tpu.core.config import FalconHParams
from ggllm_tpu.ops.linear import QuantTensor


def _qt_spec(w: QuantTensor, axis_for: str, model_size: int, stacked: bool):
    """Spec pytree for a QuantTensor's planes.

    Plane shapes: ([L,] out, nb, ...). "out" shards the output-feature dim;
    "in" shards the block dim (dequant is block-local so both are legal).
    Quant block counts (nb) are frequently non-divisible (e.g. 71 super-blocks
    for an 18176-wide Q4_K row), and device_put demands divisibility, so fall
    back in -> out -> replicated.
    """
    off = 1 if stacked else 0
    out_ok = all(v.shape[off] % model_size == 0 for v in w.planes.values())
    nb_ok = all(v.shape[off + 1] % model_size == 0 for v in w.planes.values())
    if axis_for == "in" and nb_ok:
        dim = off + 1
    elif out_ok:
        dim = off
    elif nb_ok:
        dim = off + 1
    else:
        return QuantTensor(w.gtype, w.shape, {k: P() for k in w.planes})
    specs = {}
    for k, v in w.planes.items():
        spec = [None] * v.ndim
        spec[dim] = "model"
        specs[k] = P(*spec)
    return QuantTensor(w.gtype, w.shape, specs)


def _mat_spec(w, axis_for: str, mesh: Mesh = None, stacked: bool = True, model_size: int = None):
    """PartitionSpec for one weight (dense array or QuantTensor)."""
    model_size = model_size or (mesh.shape["model"] if mesh else 1)
    if isinstance(w, QuantTensor):
        return _qt_spec(w, axis_for, model_size, stacked)
    off = 1 if stacked else 0
    dim = off if axis_for == "out" else off + 1
    if w.shape[dim] % model_size != 0:
        other = off + 1 if dim == off else off
        dim = other if w.shape[other] % model_size == 0 else None
    if dim is None:
        return P()
    spec = [None] * w.ndim
    spec[dim] = "model"
    return P(*spec)


def param_specs(params, hp: FalconHParams, mesh: Mesh):
    """Pytree of PartitionSpecs matching the params pytree."""
    model_size = mesh.shape["model"]
    kv_shardable = hp.n_head_kv % model_size == 0 and hp.n_head_kv >= model_size

    def replicated(w):
        if isinstance(w, QuantTensor):
            return QuantTensor(w.gtype, w.shape, {k: P() for k in w.planes})
        return P()

    def kv_proj_spec(w):
        return _mat_spec(w, "out", model_size=model_size) if kv_shardable else replicated(w)

    lyr = params["layers"]
    layer_specs = {
        "input_ln_w": P(), "input_ln_b": P(),
        "wq": _mat_spec(lyr["wq"], "out", model_size=model_size),
        "wk": kv_proj_spec(lyr["wk"]),
        "wv": kv_proj_spec(lyr["wv"]),
        "wo": _mat_spec(lyr["wo"], "in", model_size=model_size),
        "ffn_up": _mat_spec(lyr["ffn_up"], "out", model_size=model_size),
        "ffn_down": _mat_spec(lyr["ffn_down"], "in", model_size=model_size),
    }
    if "attn_ln_w" in lyr:
        layer_specs["attn_ln_w"] = P()
        layer_specs["attn_ln_b"] = P()

    emb_spec = (
        P(None, "model") if params["tok_embeddings"].shape[1] % model_size == 0 else P()
    )
    specs = {
        "tok_embeddings": emb_spec,
        "output_norm": P(),
        "output_norm_b": P(),
        "lm_head": _mat_spec(params["lm_head"], "out", stacked=False, model_size=model_size),
        "layers": layer_specs,
    }
    return specs


def kv_specs(hp: FalconHParams, mesh: Mesh, batch: int = 1):
    """PartitionSpec for the (L, 2, B, T, KV, D) KV cache array."""
    model_size = mesh.shape["model"]
    data_axis = "data" if batch % mesh.shape["data"] == 0 and batch >= mesh.shape["data"] else None
    if hp.n_head_kv % model_size == 0 and hp.n_head_kv >= model_size:
        return P(None, None, data_axis, None, "model", None)
    return P(None, None, data_axis, None, None, None)


def to_named(spec_tree, mesh: Mesh):
    """PartitionSpec pytree -> NamedSharding pytree (QuantTensor-aware)."""
    def conv(s):
        return NamedSharding(mesh, s)

    return jax.tree.map(conv, spec_tree, is_leaf=lambda x: isinstance(x, P))


def shard_params(params, specs, mesh: Mesh):
    """device_put the param pytree with the given specs."""
    named = to_named(specs, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, named,
    )
