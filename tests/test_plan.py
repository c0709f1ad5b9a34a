"""Memory-fit planner (parallel/plan.py) — the reference's VRAM auto-offload
simulation (libfalcon.cpp:1813-1890) re-imagined as mesh-size selection."""

from dataclasses import dataclass

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.parallel.plan import (FitPlan, kv_bytes, suggest_tensor_split)


@dataclass
class _T:
    nbytes: int


@dataclass
class _MF:
    hparams: object
    tensors: dict


def _mf(hp: FalconHParams, bits_per_weight: float) -> _MF:
    E, H, KV, D, F, V, L = (hp.n_embd, hp.n_head, hp.n_head_kv, hp.head_dim,
                            hp.n_ff, hp.n_vocab, hp.n_layer)
    per_layer = ((H + 2 * KV) * D * E + E * H * D + 2 * F * E)
    total = L * per_layer + 2 * V * E  # + embeddings/lm_head
    return _MF(hp, {"all": _T(int(total * bits_per_weight / 8))})


def test_7b_fits_single_chip():
    plan = suggest_tensor_split(_mf(FalconHParams.falcon7b(), 4.5))
    assert plan.model_axis == 1 and plan.kv_shard == "heads" and plan.fits


def test_40b_needs_two_chips():
    plan = suggest_tensor_split(_mf(FalconHParams.falcon40b(), 4.5))
    assert plan.model_axis == 2 and plan.kv_shard == "heads" and plan.fits


def test_180b_needs_eight_chips():
    plan = suggest_tensor_split(_mf(FalconHParams.falcon180b(), 4.5))
    assert plan.model_axis == 8 and plan.kv_shard == "heads" and plan.fits


def test_180b_mesh_at_8_16_32_chips():
    """180B Q4_K per-chip math: ~101 GB of weights wants an 8-way TP split
    (12.6 GB/chip + sharded KV); the head count (232 = 8*29) forbids a
    16-way split, so extra chips become data-parallel replicas."""
    from ggllm_tpu.parallel.plan import suggest_mesh

    mf = _mf(FalconHParams.falcon180b(), 4.5)
    for chips, want_data in ((8, 1), (16, 2), (32, 4)):
        plan = suggest_mesh(mf, chips)
        assert plan.model == 8 and plan.data == want_data, (chips, plan)
        assert plan.fits
        # per-chip bytes: an 8th of the weights plus an 8th of the KV cache
        # (8 KV heads divide), comfortably under 15.75 GB with 10% headroom
        assert plan.per_chip_bytes < 14.2 * 2**30


def test_huge_context_mqa_falls_back_to_sequence():
    """7B MQA: TP cannot shard the (replicated) KV, so a KV-dominated
    footprint switches to time sharding."""
    hp = FalconHParams.falcon7b()
    cfg = EngineConfig(n_ctx=1 << 21, kv_dtype="float32")  # 2M ctx, f32 KV
    assert kv_bytes(hp, cfg) > 15 * 2**30  # KV alone exceeds one chip
    plan = suggest_tensor_split(_mf(hp, 4.5), cfg)
    assert plan.kv_shard == "sequence"
    assert plan.model_axis > 1


def test_fits_property():
    assert FitPlan(1, "heads", 10 * 2**30, 16 * 2**30).fits
    assert not FitPlan(1, "heads", 15 * 2**30, 16 * 2**30).fits
