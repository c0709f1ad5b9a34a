"""falcon_main equivalent: generation CLI.

Covers the core falcon_main surface (examples/falcon/falcon_main.cpp): prompt
generation with the full sampling cascade, antiprompts, stopwords (with
streaming holdback so a stop string split across tokens never leaks),
finetune template detection, interactive mode, session (prompt-cache)
save/reuse, context swap for infinite generation (n_keep semantics,
falcon_main.cpp:694-760), and logit biasing.

Generation runs the engine's fused multi-token decode loop (forward + full
device sampling cascade per DECODE_CHUNK dispatch) whenever the sampler
config is device-coverable; mirostat/tfs/typical fall back to the exact
per-token host cascade.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax

from ggllm_tpu.core.config import EngineConfig
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.engine.generator import Generator
from ggllm_tpu.engine import session as session_mod
from ggllm_tpu.io.loader import load_model
from ggllm_tpu.ops import sampling
from ggllm_tpu import tokenizer as tok_mod
from ggllm_tpu.utils.finetune import detect_finetune, build_prompt, finetune_stopwords
from ggllm_tpu.utils.stream import StopStream


def parse_logit_bias(specs: list[str]) -> dict[int, float]:
    """--logit-bias TOKEN_ID(+|-)BIAS, e.g. '15043+1.5' or '2-inf' to ban
    (falcon_common.cpp gpt_params_parse logit-bias handling)."""
    out: dict[int, float] = {}
    for spec in specs:
        for sep in ("+", "-"):
            i = spec.find(sep, 1)
            if i > 0:
                tid = int(spec[:i])
                val = spec[i + 1 :]
                bias = float("-inf") if val.lower() == "inf" and sep == "-" else \
                    float(val) * (1 if sep == "+" else -1)
                out[tid] = bias
                break
        else:
            raise ValueError(f"bad --logit-bias spec: {spec!r}")
    return out


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="Falcon generation (TPU)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="")
    ap.add_argument("-f", "--file", help="read prompt from file")
    ap.add_argument("-n", "--n-predict", type=int, default=128)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("-b", "--batch-size", type=int, default=512)
    ap.add_argument("-s", "--seed", type=int, default=-1)
    ap.add_argument("--keep", type=int, default=0, dest="n_keep",
                    help="tokens kept from the prompt head on context swap; "
                         "-1 = whole prompt")
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--tfs", type=float, default=1.0)
    ap.add_argument("--typical", type=float, default=1.0)
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--repeat-penalty", type=float, default=1.1)
    ap.add_argument("--repeat-last-n", type=int, default=64)
    ap.add_argument("--frequency-penalty", type=float, default=0.0)
    ap.add_argument("--presence-penalty", type=float, default=0.0)
    ap.add_argument("--mirostat", type=int, default=0, choices=[0, 1, 2])
    ap.add_argument("--mirostat-tau", type=float, default=5.0)
    ap.add_argument("--mirostat-eta", type=float, default=0.1)
    ap.add_argument("--no-penalize-nl", action="store_true")
    ap.add_argument("-l", "--logit-bias", action="append", default=[],
                    metavar="TOKEN_ID(+|-)BIAS",
                    help="add BIAS to a token's logit ('-inf' bans it); repeatable")
    ap.add_argument("--ignore-eos", action="store_true",
                    help="never emit end-of-text (bans the EOS logit, the "
                         "reference's --ignore-eos logit_bias[eos]=-inf)")
    ap.add_argument("-r", "--reverse-prompt", action="append", default=[],
                    help="antiprompt: stop generation when seen")
    ap.add_argument("-S", "--stopwords", default=None,
                    help="pipe-separated stopwords ('' disables finetune defaults)")
    ap.add_argument("-i", "--interactive", action="store_true")
    ap.add_argument("-ins", "--instruct", action="store_true")
    ap.add_argument("--sys-prompt", default=None, help="system prompt (finetune templated)")
    ap.add_argument("-enc", "--enclose-prompt", action="store_true",
                    help="wrap -p in the detected finetune template")
    ap.add_argument("--finetune", default="auto",
                    choices=["auto", "none", "alpaca", "openassistant", "wizard", "falcon_ins"],
                    help="finetune template override")
    ap.add_argument("--lora", default=None, help="apply a 'ggla' LoRA adapter")
    ap.add_argument("--prompt-cache", default=None, help="session file path")
    ap.add_argument("--kv-dtype", default="bfloat16")
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--weight-mode", default="fused", choices=["fused", "dequant"])
    ap.add_argument("--no-fused-decode", action="store_true",
                    help="force the per-token host sampling path")
    ap.add_argument("--decode-chunk", type=int, default=16,
                    help="tokens per device dispatch in the fused decode "
                         "loop (larger = faster, chunkier streaming)")
    ap.add_argument("-ts", "--tensor-split", default="1", metavar="N|auto",
                    dest="mesh_model",
                    help="shard the model over N chips (the reference's "
                         "--tensor-split, as a mesh 'model' axis size); "
                         "'auto' picks the smallest mesh whose per-chip "
                         "footprint fits HBM (the reference's VRAM "
                         "auto-offload analogue)")
    ap.add_argument("--kv-shard", default="heads", choices=["heads", "sequence"],
                    help="KV sharding over the model axis: 'heads' (tensor "
                         "parallel) or 'sequence' (time-sharded cache for "
                         "long contexts)")
    ap.add_argument("--multihost", action="store_true",
                    help="call jax.distributed.initialize() (TPU pod "
                         "auto-discovery) before building the mesh")
    ap.add_argument("--verbose-timings", action="store_true")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax profiler trace of generation to DIR "
                         "(the reference's --debug-timings per-op analogue)")
    return ap


def main(argv=None):
    args = build_argparser().parse_args(argv)

    if args.ctx_size < 8:
        print("warning: minimum context size is 8", file=sys.stderr)
        args.ctx_size = 8
    # large-context default-temperature derating (falcon_main.cpp:110-125
    # intent: offset the perplexity increase at long NTK-scaled contexts;
    # only when the user left --temp at its default)
    if args.temp == build_argparser().get_default("temp"):
        derate = {16384: 0.5, 8192: 0.6, 4096: 0.7}
        for ctx, t in sorted(derate.items(), reverse=True):
            if args.ctx_size >= ctx:
                print(f"info: context size {args.ctx_size} is large; reducing "
                      f"default temperature to {t}", file=sys.stderr)
                args.temp = t
                break

    cfg = EngineConfig(
        n_ctx=args.ctx_size,
        n_batch=args.batch_size,
        kv_dtype=args.kv_dtype,
        compute_dtype=args.compute_dtype,
        weight_mode=args.weight_mode,
        kv_shard=args.kv_shard,
        decode_chunk=args.decode_chunk,
    )
    mesh = None
    if args.multihost:
        from ggllm_tpu.parallel.mesh import init_distributed

        init_distributed()
    if args.mesh_model == "auto":
        from ggllm_tpu.io.ggcc import read_model
        from ggllm_tpu.parallel.plan import suggest_tensor_split

        plan = suggest_tensor_split(read_model(args.model), cfg=None)
        args.mesh_model = plan.model_axis
        args.kv_shard = plan.kv_shard
        print(f"auto tensor split: {plan.model_axis} chip(s), "
              f"kv_shard={plan.kv_shard} "
              f"({plan.per_chip_bytes / 2**30:.2f} GB/chip)", file=sys.stderr)
    else:
        args.mesh_model = int(args.mesh_model)
    if args.mesh_model > 1:
        from ggllm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=1, model=args.mesh_model)
        print(f"mesh: 1 x {args.mesh_model} (kv_shard={args.kv_shard})",
              file=sys.stderr)
    t0 = time.time()

    def progress(frac: float, what: str):
        # the reference's 50-char load bar (libfalcon.cpp:3852-3885)
        width = 50
        pos = int(frac * width)
        bar = "=" * pos + (">" if pos < width else "") + "-" * max(0, width - pos - 1)
        end = "\n" if frac >= 1 else ""
        print(f"\r[{bar}] {frac * 100:3.0f}%  {what:<20s}", file=sys.stderr,
              end=end, flush=True)

    if mesh is not None and args.kv_shard == "sequence":
        # sequence-parallel replicates weights: load the single-chip fused
        # layout (the engine shards only the KV cache)
        cfg.kernel_layout = True
        mf, params = load_model(args.model, cfg, lora=args.lora,
                                progress=progress)
    else:
        mf, params = load_model(args.model, cfg, lora=args.lora, mesh=mesh,
                                progress=progress)
    engine = FalconEngine(mf.hparams, params, cfg, mesh=mesh)
    engine.timings.t_load_us = (time.time() - t0) * 1e6
    vocab = mf.vocab
    tk = tok_mod.for_model(mf)

    sampler = sampling.SamplerParams(
        top_k=args.top_k, top_p=args.top_p, tfs_z=args.tfs, typical_p=args.typical,
        temp=args.temp, repeat_penalty=args.repeat_penalty,
        repeat_last_n=args.repeat_last_n,
        frequency_penalty=args.frequency_penalty, presence_penalty=args.presence_penalty,
        mirostat=args.mirostat, mirostat_tau=args.mirostat_tau,
        mirostat_eta=args.mirostat_eta, penalize_nl=not args.no_penalize_nl,
        logit_bias=parse_logit_bias(args.logit_bias),
        seed=args.seed,
    )

    prompt = args.prompt
    if args.file:
        with open(args.file, "rb") as f:
            prompt = f.read().decode("utf-8", errors="replace")

    finetune = detect_finetune(args.model, vocab) if args.finetune == "auto" else args.finetune
    if args.enclose_prompt or args.instruct:
        prompt = build_prompt(finetune, prompt, args.sys_prompt)
    stopwords = finetune_stopwords(finetune)
    if args.stopwords is not None:
        stopwords = [s for s in args.stopwords.split("|") if s]
    print(f"finetune: {finetune}; stopwords: {stopwords}", file=sys.stderr)

    prompt_ids = tk.tokenize(prompt, bos=not prompt.startswith("<|endoftext|>"))
    if not prompt_ids:
        prompt_ids = [tk.bos_id]
    if args.ignore_eos:
        sampler.logit_bias[tk.eos_id] = float("-inf")
    # keep the whole prompt on context swap when requested (reference
    # falcon_main: n_keep < 0 or instruct mode -> full prompt)
    n_keep = len(prompt_ids) if (args.n_keep < 0 or args.instruct) else args.n_keep

    # session reuse (--prompt-cache): skip matching prefix
    eval_ids = list(prompt_ids)
    if args.prompt_cache:
        eval_ids = session_mod.try_load(args.prompt_cache, engine, prompt_ids)
        reused = len(prompt_ids) - len(eval_ids)
        if reused:
            print(f"session: reused {reused} prompt tokens", file=sys.stderr)

    gen = Generator(engine, sampler, tk.eos_id, n_keep,
                    fused_ok=not args.no_fused_decode,
                    log=lambda m: print(f"\n[{m}]", file=sys.stderr))
    if args.prompt_cache:
        # restore rng/sampler state so a sampled continuation reproduces
        # (falcon_copy_state_data rng parity, libfalcon.cpp:4254)
        gen.state, rng_key, _ = session_mod.load_sampler_state(
            args.prompt_cache, sampler)
        if rng_key is not None:
            gen.rng = rng_key
    gen.all_tokens = list(prompt_ids[: len(prompt_ids) - len(eval_ids)])

    stop_suffixes = [s.encode() for s in stopwords]
    antiprompts = [a.encode() for a in args.reverse_prompt]

    sys.stdout.buffer.write(prompt.encode())
    sys.stdout.flush()

    if args.profile:
        jax.profiler.start_trace(args.profile)

    if not eval_ids:
        eval_ids = [prompt_ids[-1]]
        gen.all_tokens = gen.all_tokens[:-1]
        engine.n_past = max(0, engine.n_past - 1)
    logits = gen.prefill(eval_ids)
    if args.prompt_cache and len(eval_ids) > 1:
        # cache the evaluated prompt immediately (falcon_main.cpp:867-871
        # saves at first sample) so an interrupted run still reuses it
        session_mod.save(args.prompt_cache, engine,
                         gen.all_tokens[: engine.n_past],
                         sampler_state=gen.state, rng_key=gen.rng)

    def run_turn(logits):
        ss = StopStream(stop_suffixes, antiprompts)

        def on_token(tok: int) -> bool:
            out = ss.push(vocab.id_to_token[tok])
            if out:
                sys.stdout.buffer.write(out)
                sys.stdout.flush()
            return not ss.stopped

        reason = gen.generate(logits, args.n_predict, on_token)
        if not ss.stopped:
            tail = ss.flush()
            if tail:
                sys.stdout.buffer.write(tail)
                sys.stdout.flush()
        print()
        return reason

    run_turn(logits)

    if args.profile:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {args.profile}", file=sys.stderr)
    if args.prompt_cache:
        if gen.swapped:
            print("session: not saved (context swap invalidated the cache)",
                  file=sys.stderr)
        else:
            session_mod.save(args.prompt_cache, engine,
                             gen.all_tokens[: engine.n_past],
                             sampler_state=gen.state, rng_key=gen.rng)
    print(engine.timings.report(), file=sys.stderr)

    if args.interactive:
        print("== interactive mode: empty line to exit ==", file=sys.stderr)
        while True:
            try:
                line = input("> ")
            except EOFError:
                break
            if not line:
                break
            text = build_prompt(finetune, line, None) if args.instruct else line
            ids = tk.tokenize(text)
            logits = gen.prefill(ids)
            run_turn(logits)


if __name__ == "__main__":
    sys.exit(main())
