"""Model-family registry: one engine, multiple decoder architectures
(the reference ships two parallel runtimes, libfalcon.cpp + llama.cpp;
here both families plug into the same engine/kernel/IO machinery)."""

from __future__ import annotations


def resolve(hparams, flash: bool = False):
    """hparams -> (Static, forward_fn) for the engine."""
    arch = getattr(hparams, "arch", "falcon")
    if arch == "llama":
        from ggllm_tpu.models.llama import LlamaStatic, llama_forward

        return LlamaStatic.from_hparams(hparams, flash=flash), llama_forward
    from ggllm_tpu.models.falcon import FalconStatic, falcon_forward

    return FalconStatic.from_hparams(hparams, flash=flash), falcon_forward
