"""Embedding extraction CLI (examples/embedding analogue): prints the
final-layer hidden state for the last prompt token."""

from __future__ import annotations

import argparse
import sys

from ggllm_tpu.core.config import EngineConfig
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.io.loader import load_model
from ggllm_tpu import tokenizer as tok_mod


def main(argv=None):
    from ggllm_tpu.utils.jaxenv import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser(description="prompt embedding (final hidden state)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", required=True)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("--compute-dtype", default="bfloat16")
    args = ap.parse_args(argv)

    cfg = EngineConfig(n_ctx=args.ctx_size, compute_dtype=args.compute_dtype)
    mf, params = load_model(args.model, cfg)
    engine = FalconEngine(mf.hparams, params, cfg)
    ids = tok_mod.for_model(mf).tokenize(args.prompt, bos=True)
    emb = engine.embed(ids)
    print(" ".join(f"{v:.6f}" for v in emb))
    return 0


if __name__ == "__main__":
    sys.exit(main())
