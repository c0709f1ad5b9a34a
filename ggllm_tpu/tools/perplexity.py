"""falcon_perplexity equivalent CLI."""

from __future__ import annotations

import argparse
import sys
import time

from ggllm_tpu.core.config import EngineConfig
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.engine.perplexity import perplexity
from ggllm_tpu.io.loader import load_model
from ggllm_tpu import tokenizer as tok_mod


def main(argv=None):
    from ggllm_tpu.utils.jaxenv import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser(description="wikitext-style perplexity")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="raw text file (wiki.test.raw)")
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("-b", "--batch-size", type=int, default=512)
    ap.add_argument("--kv-dtype", default="bfloat16")
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--weight-mode", default="fused", choices=["fused", "dequant"])
    ap.add_argument("--max-chunks", type=int, default=0,
                    help="limit evaluated chunks (0 = all)")
    args = ap.parse_args(argv)

    from ggllm_tpu.io.ggcc import read_model

    # perplexity is pure prefill: Falcon engines take row-major quant
    # planes, skipping the per-chunk transposing copies around the MXU
    # kernels (6257 -> 6993 tok/s measured); LLaMA's kernels measure
    # slightly FASTER with the as-built layout (6663 vs 6466), so only
    # falcon opts in. Metadata read is memmap-cheap.
    arch = read_model(args.model).arch
    cfg = EngineConfig(
        n_ctx=args.ctx_size,
        n_batch=args.batch_size,
        kv_dtype=args.kv_dtype,
        compute_dtype=args.compute_dtype,
        weight_mode=args.weight_mode,
        plane_layout="prefill" if arch == "falcon" else "decode",
    )
    t0 = time.time()
    mf, params = load_model(args.model, cfg)
    engine = FalconEngine(mf.hparams, params, cfg)
    engine.timings.t_load_us = (time.time() - t0) * 1e6

    with open(args.file, "rb") as f:
        text = f.read().decode("utf-8", errors="replace")
    tokens = tok_mod.for_model(mf).tokenize(text, bos=True)
    print(f"tokenized {len(tokens)} tokens; "
          f"{len(tokens) // cfg.n_ctx} chunks of {cfg.n_ctx}", file=sys.stderr)

    def progress(i, n, ppl):
        print(f"[{i}]{ppl:.4f},", end="", flush=True)

    res = perplexity(engine, tokens, progress=progress, max_chunks=args.max_chunks)
    print(f"\nperplexity: {res.ppl:.4f} [{res.n_chunks} chunks, {res.count} tokens]")
    print(engine.timings.report(), file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
