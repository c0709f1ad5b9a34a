"""Model hyperparameters and engine configuration."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class FalconHParams:
    """Falcon model hyperparameters (falcon_hparams, libfalcon.cpp:146-160)."""

    n_vocab: int = 65024
    n_embd: int = 4544
    n_head: int = 71
    n_head_kv: int = 1  # 1 = 7B multi-query; 8 = 40B grouped-query
    n_layer: int = 32
    n_falcon_type: int = 7  # 7, 40 or 180
    ftype: int = 1
    n_bpe_merges: int = 64784

    arch = "falcon"

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @property
    def n_ff(self) -> int:
        return 4 * self.n_embd

    @classmethod
    def falcon7b(cls, **kw) -> "FalconHParams":
        return cls(n_embd=4544, n_head=71, n_head_kv=1, n_layer=32, n_falcon_type=7, **kw)

    @classmethod
    def falcon40b(cls, **kw) -> "FalconHParams":
        return cls(n_embd=8192, n_head=128, n_head_kv=8, n_layer=60, n_falcon_type=40, **kw)

    @classmethod
    def falcon180b(cls, **kw) -> "FalconHParams":
        return cls(n_embd=14848, n_head=232, n_head_kv=8, n_layer=80, n_falcon_type=180, **kw)

    @classmethod
    def tiny(cls, **kw) -> "FalconHParams":
        """Small config for tests: same structure, toy sizes."""
        kw.setdefault("n_vocab", 512)
        kw.setdefault("n_bpe_merges", 0)
        return cls(n_embd=128, n_head=4, n_head_kv=1, n_layer=2, n_falcon_type=7, **kw)

    @classmethod
    def tiny_gqa(cls, **kw) -> "FalconHParams":
        """Tiny 40B-style config (grouped-query attention, two layernorms)."""
        kw.setdefault("n_vocab", 512)
        kw.setdefault("n_bpe_merges", 0)
        return cls(n_embd=128, n_head=8, n_head_kv=2, n_layer=2, n_falcon_type=40, **kw)


@dataclass
class LlamaHParams:
    """LLaMA hyperparameters (llama_hparams, llama.cpp:124-133)."""

    n_vocab: int = 32000
    n_embd: int = 4096
    n_mult: int = 256
    n_head: int = 32
    n_layer: int = 32
    n_rot: int = 64
    ftype: int = 1

    arch = "llama"

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @property
    def n_head_kv(self) -> int:
        return self.n_head  # LLaMA-1: no grouped-query attention

    @property
    def n_ff(self) -> int:
        # llama.cpp:1074
        return ((2 * (4 * self.n_embd) // 3 + self.n_mult - 1)
                // self.n_mult) * self.n_mult

    @classmethod
    def llama7b(cls, **kw) -> "LlamaHParams":
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "LlamaHParams":
        kw.setdefault("n_vocab", 512)
        return cls(n_embd=128, n_mult=32, n_head=4, n_layer=2, n_rot=32, **kw)


@dataclass
class RopeConfig:
    """NTK-aware dynamic RoPE scaling knobs (ggml.h:1564-1567, ggml.c:12875-12898)."""

    freq_base: float = 10000.0
    # None = auto: enabled for falcon (falcon_eval turns dynamic mode on by
    # default, libfalcon.cpp:2229-2234), disabled for llama (the reference
    # llama.cpp applies no NTK scaling to classic RoPE)
    dynamic_ntk: bool | None = None
    # In dynamic mode this is the linear scale inside the alpha formula
    # (falcon_eval passes 2.0, libfalcon.cpp:2234); in static mode it is the
    # NTK alpha itself.
    ntk_alpha: float = 2.0
    ang_scale: float = 1.0  # linear angle scaling
    trained_ctx: int = 2048  # context length the base model was trained at


@dataclass
class EngineConfig:
    """Runtime configuration (the gpt_params subset that shapes compute)."""

    n_ctx: int = 2048
    n_batch: int = 512  # prefill chunk
    # tokens generated per device dispatch by the fused decode loop: larger
    # amortizes dispatch overhead (measured 74 -> 88 tok/s from 16 -> 64 on
    # the tunneled chip), smaller streams sooner and wastes less on stops
    decode_chunk: int = 16
    max_decode_batch: int = 1  # concurrent sequences (continuous batching)
    kv_dtype: str = "bfloat16"  # -f16_kv equivalent; "float32" for exactness
    compute_dtype: str = "bfloat16"
    logits_dtype: str = "float32"
    rope: RopeConfig = field(default_factory=RopeConfig)
    # weight handling: "dequant" materializes bf16 weights at load;
    # "fused" keeps packed quant planes in HBM and uses Pallas kernels
    weight_mode: str = "fused"
    # fused-kernel weight layout (kernels/layout.py): None = auto (TPU backend
    # and no mesh — the Pallas kernels don't GSPMD-partition; the mesh path
    # uses the XLA dequant fallback until the shard_map step lands)
    kernel_layout: bool | None = None
    # Pallas flash attention for prefill: None = auto (TPU, no mesh)
    flash_attention: bool | None = None
    # physical layout of the packed quant planes (engine._relayout_planes):
    # "decode" keeps the as-built k-minor layout the VPU-floor decode
    # matvec kernels want; "prefill" relayouts to row-major, removing the
    # per-chunk transposing copies XLA inserts around the MXU prefill
    # kernels (+15% prefill, 6257 -> 6993 tok/s @2048 measured — but
    # decode collapses 111 -> 15 tok/s, so only prefill-dominated tools
    # like perplexity should pick it)
    plane_layout: str = "decode"
    # mesh axes: data (replica), model (tensor-parallel)
    mesh_shape: tuple = (1, 1)
    mesh_axes: tuple = ("data", "model")
    # KV sharding over the model axis: "heads" (TP; GQA kv heads shard, MQA
    # replicates) or "sequence" (time axis shards — per-chip KV memory T/mp
    # with replicated weights; the long-context scaling mode, parallel/sp.py)
    kv_shard: str = "heads"
