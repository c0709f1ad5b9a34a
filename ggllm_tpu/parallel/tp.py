"""Tensor-parallel (shard_map) weight construction for the fused-kernel path.

GSPMD can't partition Pallas calls, so the multi-chip fused path uses
shard_map: every device runs the SAME single-chip fused forward on its local
weight shards, with exactly ONE psum per layer. The merged layouts make this
natural:

* "wqkvu": per-device blocks [Q_d; K; V; up_d] — each device owns H/mp query
  heads (zero-padded when mp doesn't divide H) and F/mp FFN rows; the tiny
  K/V rows replicate for MQA and shard by kv head for GQA (mp | n_head_kv);
* "w_od": the contraction dim splits into each device's
  [wo cols for its heads | down cols for its ff slice]; the partial outputs
  reduce with one psum('model'), which also completes the parallel
  attention+FFN residual;
* lm_head / embeddings / norms / activations replicate; the KV cache
  replicates for MQA and shards over kv heads for GQA.

Each device's shard is built as its own KernelQuant and stacked on a new
leading device axis; sharding that axis over 'model' hands every device
exactly its block, and the shard_map body strips the leading 1.

Reference mapping: the TPU equivalent of the multi-GPU row split
g_tensor_split + per-slice cudaMemcpy gather (ggml-cuda.cu:1995-2073,
2779-2795) — the gather loop becomes the per-layer psum over ICI.
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ggllm_tpu.core.config import FalconHParams
from ggllm_tpu.core.dtypes import TYPE_TRAITS
from ggllm_tpu.kernels import layout as klayout
from ggllm_tpu.ops.linear import QuantTensor


def _pad_rows(planes: dict, rows: int, target: int) -> dict:
    if rows == target:
        return planes
    return {k: np.pad(v, [(0, target - rows)] + [(0, 0)] * (v.ndim - 1))
            for k, v in planes.items()}


def _rows(planes: dict, lo: int, hi: int) -> dict:
    return {k: v[lo:hi] for k, v in planes.items()}


def _cols_blocks(planes: dict, lo_b: int, hi_b: int, pad_to: int = 0) -> dict:
    out = {k: v[:, lo_b:hi_b] for k, v in planes.items()}
    have = hi_b - lo_b
    if pad_to and have < pad_to:
        out = {k: np.pad(v, [(0, 0), (0, pad_to - have)] + [(0, 0)] * (v.ndim - 2))
               for k, v in out.items()}
    return out


class TpPlan:
    """Static TP geometry for one Falcon model."""

    def __init__(self, hp: FalconHParams, mp: int):
        self.mp = mp
        self.H, self.KV, self.D, self.F = hp.n_head, hp.n_head_kv, hp.head_dim, hp.n_ff
        if self.KV > 1:
            assert self.KV % mp == 0, "GQA requires mp | n_head_kv"
            assert self.H % mp == 0, "GQA requires mp | n_head"
            self.h_local, self.kv_local = self.H // mp, self.KV // mp
        else:
            self.h_local, self.kv_local = -(-self.H // mp), 1  # pad q heads
        assert self.F % mp == 0
        self.f_local = self.F // mp

    def local_static(self, st):
        """Single-device static view of the sharded model (both families)."""
        return replace(st, n_head=self.h_local, n_head_kv=self.kv_local,
                       n_ff=self.f_local)


def _stack_kq(parts: list[klayout.KernelQuant]) -> klayout.KernelQuant:
    """Per-device KernelQuants -> one with a leading device axis; the aux
    shape/ck stay LOCAL so stripping the axis restores a valid local view."""
    planes = {}
    for k in parts[0].planes:
        arrs = [p.planes[k] for p in parts]
        # scale planes choose int16 (fp16 bits) vs f32 per shard; np.stack
        # would silently promote a mixed set and corrupt the bit patterns —
        # decode any int16 shards back to f32 when mixed
        dtypes = {a.dtype for a in arrs}
        if len(dtypes) > 1 and np.dtype(np.int16) in dtypes:
            arrs = [a.view(np.float16).astype(np.float32)
                    if a.dtype == np.int16 else a for a in arrs]
        planes[k] = np.stack(arrs)
    return klayout.KernelQuant(parts[0].gtype, parts[0].shape, parts[0].ck, planes)


def local_view(kq: klayout.KernelQuant) -> klayout.KernelQuant:
    """Strip the (sharded-away) leading device axis inside shard_map."""
    return klayout.KernelQuant(
        kq.gtype, kq.shape, kq.ck, {k: v[0] for k, v in kq.planes.items()})


def build_tp_layer(qkv: QuantTensor, up: QuantTensor, wo: QuantTensor,
                   down: QuantTensor, plan: TpPlan,
                   merge_up: bool = True) -> dict:
    """Planar layer weights -> device-stacked merged KernelQuants.

    merge_up=False (40B/180B parallel-norms models): FFN-up consumes a
    DIFFERENT layernorm than QKV, so it stays a separate row-sharded weight
    ("wqkv" + "ffn_up") instead of folding into "wqkvu"."""
    D, mp = plan.D, plan.mp
    gt = qkv.gtype
    assert up.gtype == gt and wo.gtype == gt and down.gtype == gt, \
        "TP merge requires a uniform quant type per layer"
    bs = TYPE_TRAITS[gt].block_size
    assert (plan.h_local * D) % bs == 0 and plan.f_local % bs == 0, \
        f"TP shard widths must be multiples of the quant block ({bs})"

    q_rows, k_rows = plan.H * D, plan.KV * D
    E = qkv.shape[1]
    qp, upp, wop, downp = qkv.planes, up.planes, wo.planes, down.planes

    wqkvu_parts, up_parts, w_od_parts = [], [], []
    qkv_rows_dev = (plan.h_local + 2 * plan.kv_local) * D
    rows_per_dev = qkv_rows_dev + (plan.f_local if merge_up else 0)
    k_per_dev = plan.h_local * D + plan.f_local
    for d in range(mp):
        if plan.KV > 1:
            kv_lo = q_rows + d * plan.kv_local * D
            kv_hi = kv_lo + plan.kv_local * D
            v_lo = q_rows + k_rows + d * plan.kv_local * D
            v_hi = v_lo + plan.kv_local * D
        else:
            kv_lo, kv_hi = q_rows, q_rows + k_rows
            v_lo, v_hi = q_rows + k_rows, q_rows + 2 * k_rows
        q_lo = min(q_rows, d * plan.h_local * D)
        q_hi = min(q_rows, (d + 1) * plan.h_local * D)
        parts = [
            _pad_rows(_rows(qp, q_lo, q_hi), q_hi - q_lo, plan.h_local * D),
            _rows(qp, kv_lo, kv_hi),
            _rows(qp, v_lo, v_hi),
        ]
        up_d = _rows(upp, d * plan.f_local, (d + 1) * plan.f_local)
        if merge_up:
            parts.append(up_d)
        else:
            up_parts.append(klayout.to_kernel(gt, up_d, (plan.f_local, E)))
        merged = klayout.merge_out(parts)
        wqkvu_parts.append(klayout.to_kernel(gt, merged, (rows_per_dev, E)))

        od = klayout.merge_in([
            _cols_blocks(wop, q_lo // bs, q_hi // bs,
                         pad_to=plan.h_local * D // bs),
            _cols_blocks(downp, d * plan.f_local // bs,
                         (d + 1) * plan.f_local // bs),
        ])
        w_od_parts.append(klayout.to_kernel(gt, od, (E, k_per_dev)))

    out = {"w_od": _stack_kq(w_od_parts)}
    if merge_up:
        out["wqkvu"] = _stack_kq(wqkvu_parts)
    else:
        out["wqkv"] = _stack_kq(wqkvu_parts)
        out["ffn_up"] = _stack_kq(up_parts)
    return out


def _kq_spec(kq: klayout.KernelQuant, spec: P) -> klayout.KernelQuant:
    return klayout.KernelQuant(kq.gtype, kq.shape, kq.ck,
                               {k: spec for k in kq.planes})


def tp_param_specs(params: dict) -> dict:
    """PartitionSpec pytree for TP-blocked params (shard_map in_specs /
    NamedSharding). Generic over the param dict (both model families)."""
    dev_axis = P("model", None, None, None)

    def leaf(w):
        if isinstance(w, klayout.KernelQuant):
            # device-stacked layer weights shard on the leading axis;
            # replicated KernelQuants (lm_head) have 3-D planes
            ndim = next(iter(w.planes.values())).ndim
            return _kq_spec(w, dev_axis if ndim == 4 else P(None, None, None))
        return P()

    out = {}
    for k, v in params.items():
        if k == "layers":
            out[k] = [{kk: leaf(vv) for kk, vv in lw.items()} for lw in v]
        else:
            out[k] = leaf(v)
    return out


def kv_spec(plan: TpPlan) -> P:
    """(L, 2, B, T, KV, D) cache: kv-head sharded for GQA, replicated MQA."""
    if plan.KV > 1:
        return P(None, None, None, None, "model", None)
    return P(None, None, None, None, None, None)


def shard_tp_params(params: dict, mesh: Mesh) -> dict:
    specs = tp_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), NamedSharding(mesh, s)),
        params, specs)


def build_tp_llama_layer(wq, wk, wv, wo, w1, w2, w3, plan: TpPlan) -> dict:
    """LLaMA planar layer weights -> device-stacked KernelQuants.

    LLaMA (KV == H) shards heads 1:1 and the FFN width; wo and w2 split
    along the contraction dim, each followed by its own psum (sequential
    residuals need two collectives per layer, vs Falcon's one).
    """
    D, mp = plan.D, plan.mp
    mats = [wq, wk, wv, wo, w1, w2, w3]
    gt = wq.gtype
    assert all(m.gtype == gt for m in mats), "TP requires a uniform quant type"
    assert plan.KV == plan.H, "use build_tp_layer for Falcon-family models"
    bs = TYPE_TRAITS[gt].block_size
    assert (plan.h_local * D) % bs == 0 and plan.f_local % bs == 0, \
        f"TP shard widths must be multiples of the quant block ({bs})"

    E = wq.shape[1]
    hD, fl = plan.h_local * D, plan.f_local
    wqkv_p, w13_p, wo_p, w2_p = [], [], [], []
    for d in range(mp):
        h_lo, h_hi = d * hD, (d + 1) * hD
        f_lo, f_hi = d * fl, (d + 1) * fl
        wqkv_p.append(klayout.to_kernel(gt, klayout.merge_out([
            _rows(wq.planes, h_lo, h_hi),
            _rows(wk.planes, h_lo, h_hi),
            _rows(wv.planes, h_lo, h_hi)]), (3 * hD, E)))
        w13_p.append(klayout.to_kernel(gt, klayout.merge_out([
            _rows(w1.planes, f_lo, f_hi),
            _rows(w3.planes, f_lo, f_hi)]), (2 * fl, E)))
        wo_p.append(klayout.to_kernel(
            gt, _cols_blocks(wo.planes, h_lo // bs, h_hi // bs), (E, hD)))
        w2_p.append(klayout.to_kernel(
            gt, _cols_blocks(w2.planes, f_lo // bs, f_hi // bs), (E, fl)))
    return {"wqkv": _stack_kq(wqkv_p), "w13": _stack_kq(w13_p),
            "wo": _stack_kq(wo_p), "w2": _stack_kq(w2_p)}
