"""Memory-fit planning: the TPU answer to the reference's VRAM auto-offload.

The reference simulates per-layer VRAM spend against live free memory and
demotes layers to CPU when it would run out (libfalcon.cpp:1813-1890). On
TPU the capacity lever is SHARDING, not offload: this module computes the
model + KV footprint and suggests the smallest mesh 'model' axis that fits
per-chip HBM, so `-ts auto` works like the reference's automatic layer
placement.
"""

from __future__ import annotations

from dataclasses import dataclass

from ggllm_tpu.core.config import EngineConfig

# measured on the target chip ("Used X of 15.75G hbm" in compile errors);
# leave headroom for activations, the compiled program and fragmentation
DEFAULT_HBM_BYTES = int(15.75 * 2**30)
HEADROOM_FRACTION = 0.10
# the kernel layout stores fp16-bit or f32 scale planes and pads K
# (kernels/layout.py padded_k): measured blowup over raw file bytes
KERNEL_OVERHEAD = 1.06


def model_bytes(mf) -> int:
    """Raw on-disk tensor bytes (the mmap'd footprint the reference counts)."""
    return sum(t.nbytes for t in mf.tensors.values())


def kv_bytes(hp, cfg: EngineConfig, batch: int = 1) -> int:
    """Stacked cache footprint: (L, 2, B, kv_T, KV, D)."""
    from ggllm_tpu.engine.engine import DECODE_CHUNK

    kv_T = cfg.n_ctx + max(cfg.n_batch, DECODE_CHUNK)
    per = {"int8": 1 + 4 / hp.head_dim, "float32": 4}.get(str(cfg.kv_dtype), 2)
    return int(hp.n_layer * 2 * batch * kv_T * hp.n_head_kv * hp.head_dim * per)


@dataclass
class FitPlan:
    model_axis: int  # suggested mesh model-axis size (1 = single chip)
    kv_shard: str  # "heads" (TP) or "sequence"
    per_chip_bytes: int
    hbm_bytes: int

    @property
    def fits(self) -> bool:
        return self.per_chip_bytes <= self.hbm_bytes * (1 - HEADROOM_FRACTION)


def suggest_tensor_split(mf, cfg: EngineConfig | None = None, batch: int = 1,
                         hbm_bytes: int = DEFAULT_HBM_BYTES,
                         max_chips: int = 64) -> FitPlan:
    """Smallest power-of-two model axis whose per-chip footprint fits.

    Weights shard over the axis in TP mode; the KV cache shards only for GQA
    (kv heads divide) — MQA KV replicates but is tiny. When TP cannot divide
    the heads any further but memory still does not fit, falls back to
    sequence sharding (weights replicated — only helps when KV dominates)."""
    cfg = cfg or EngineConfig()
    hp = mf.hparams
    wb = int(model_bytes(mf) * KERNEL_OVERHEAD)
    limit = hbm_bytes * (1 - HEADROOM_FRACTION)

    mp = 1
    while mp <= max_chips:
        kvb = kv_bytes(hp, cfg, batch)
        if hp.n_head_kv > 1 and hp.n_head_kv % mp == 0:
            kvb //= mp
        per_chip = wb // mp + kvb
        plan = FitPlan(mp, "heads", int(per_chip), hbm_bytes)
        if plan.fits:
            return plan
        nxt = mp * 2
        # TP feasibility: query heads (padded for MQA) and FFN must divide
        if hp.n_head_kv > 1 and (hp.n_head % nxt or hp.n_head_kv % nxt):
            break
        if hp.n_ff % nxt:
            break
        mp = nxt

    # sequence sharding: KV / mp, weights replicated
    kvb = kv_bytes(hp, cfg, batch)
    mp_seq = 1
    while mp_seq < max_chips and wb + kvb // mp_seq > limit:
        mp_seq *= 2
    return FitPlan(mp_seq, "sequence", int(wb + kvb // mp_seq), hbm_bytes)


@dataclass
class MeshPlan:
    """Full mesh suggestion for a given chip budget: the smallest fitting
    TP axis (bounded by head divisibility), remaining chips as data-parallel
    serving replicas — e.g. 180B Q4_K on 32 chips = (4 data x 8 model)."""

    data: int
    model: int
    kv_shard: str
    per_chip_bytes: int
    hbm_bytes: int

    @property
    def fits(self) -> bool:
        return self.per_chip_bytes <= self.hbm_bytes * (1 - HEADROOM_FRACTION)


def suggest_mesh(mf, n_chips: int, cfg: EngineConfig | None = None,
                 batch: int = 1,
                 hbm_bytes: int = DEFAULT_HBM_BYTES) -> MeshPlan:
    """Mesh shape for n_chips: TP model axis from suggest_tensor_split
    (never larger than the heads allow), leftover chips replicate the model
    as data-parallel rows (each with its own KV cache and batch slots)."""
    plan = suggest_tensor_split(mf, cfg, batch, hbm_bytes, max_chips=n_chips)
    model = min(plan.model_axis, n_chips)
    data = max(1, n_chips // model)
    return MeshPlan(data, model, plan.kv_shard, plan.per_chip_bytes,
                    hbm_bytes)
