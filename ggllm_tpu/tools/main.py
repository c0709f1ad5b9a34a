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
import dataclasses
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
from ggllm_tpu.utils.jaxenv import enable_compile_cache
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


ANSI_RESET = "\x1b[0m"
ANSI_PROMPT = "\x1b[33m"        # yellow: prompt echo
ANSI_USER = "\x1b[1;32m"        # bold green: user input
ANSI_ERROR = "\x1b[31m"         # red

RANDOM_PROMPTS = ["So", "Once upon a time", "When", "The", "After",
                  "If", "import", "He", "She", "They"]


def read_user_input(multiline: bool) -> str | None:
    """Console line protocol (examples/common.cpp console_readline):

    default mode — Return submits; a trailing '\\' continues on another
    line; a trailing '/' submits without the final newline.
    multiline mode — Return inserts a newline; a trailing '\\' submits;
    '/' submits without the newline. Returns None at EOF with no input.
    """
    lines: list[str] = []
    while True:
        try:
            line = input()
        except EOFError:
            return None if not lines else "\n".join(lines) + "\n"
        if line.endswith("\\"):
            lines.append(line[:-1])
            if multiline:
                return "\n".join(lines) + "\n"
            continue
        if line.endswith("/"):
            lines.append(line[:-1])
            return "\n".join(lines)
        lines.append(line)
        if not multiline:
            return "\n".join(lines) + "\n"


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="Falcon generation (TPU)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="")
    ap.add_argument("-f", "--file", help="read prompt from file")
    ap.add_argument("--random-prompt", action="store_true",
                    help="start with a short randomized prompt")
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
    ap.add_argument("--mirostat-tau", "--mirostat-ent", type=float,
                    default=5.0, dest="mirostat_tau",
                    help="mirostat target entropy tau")
    ap.add_argument("--mirostat-eta", "--mirostat-lr", type=float,
                    default=0.1, dest="mirostat_eta",
                    help="mirostat learning rate eta")
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
    ap.add_argument("--interactive-first", action="store_true",
                    help="interactive mode, waiting for input before "
                         "generating anything")
    ap.add_argument("-ins", "--instruct", action="store_true")
    ap.add_argument("--in-prefix", default="",
                    help="string prepended to every interactive user input")
    ap.add_argument("--in-suffix", default="",
                    help="string appended to every interactive user input")
    ap.add_argument("--multiline-input", action="store_true",
                    help="interactive input spans lines until a trailing '\\'")
    ap.add_argument("--color", action="store_true",
                    help="colorize output: prompt yellow, input green")
    ap.add_argument("--sys-prompt", "--system", default=None,
                    dest="sys_prompt", help="system prompt (finetune templated)")
    ap.add_argument("--system-file", default=None,
                    help="read the system prompt from a file")
    ap.add_argument("--system-raw", action="store_true",
                    help="prepend the system prompt verbatim, no template")
    ap.add_argument("-enc", "--enclose-prompt", action="store_true",
                    help="wrap -p in the detected finetune template")
    ap.add_argument("--finetune", default="auto",
                    choices=["auto", "none", "alpaca", "openassistant", "wizard", "falcon_ins"],
                    help="finetune template override")
    ap.add_argument("--lora", default=None, help="apply a 'ggla' LoRA adapter")
    ap.add_argument("--lora-base", default=None,
                    help="unquantized model whose tensors serve as the base "
                         "for LoRA-patched weights")
    ap.add_argument("--prompt-cache", default=None, help="session file path")
    ap.add_argument("--prompt-cache-all", action="store_true",
                    help="also save generated output to the session file")
    ap.add_argument("--prompt-cache-ro", action="store_true",
                    help="use the session file read-only, never update it")
    ap.add_argument("--verbose-prompt", action="store_true",
                    help="print the tokenization of every ingested prompt")
    ap.add_argument("--perplexity", action="store_true",
                    help="compute perplexity over -f FILE and exit (the "
                         "falcon_perplexity protocol)")
    ap.add_argument("--embedding", action="store_true",
                    help="print the prompt's final hidden state and exit "
                         "(the examples/embedding mode)")
    ap.add_argument("--mtest", action="store_true",
                    help="compute maximum-memory usage (full-batch prefill + "
                         "one decode step), report, and exit")
    ap.add_argument("--export", default=None, metavar="PATH",
                    help="write the lowered StableHLO of the forward graph "
                         "(the reference's cgraph --export analogue) and exit")
    # accepted-and-ignored reference flags, so reference command lines run
    # unchanged (threads/VRAM knobs have no TPU meaning; XLA owns memory)
    for flag, extra in (("--threads", {"type": int}), ("-t", {"type": int}),
                        ("--n-gpu-layers", {"type": int}),
                        ("-ngl", {"type": int}), ("--gpu-layers", {"type": int}),
                        ("--main-gpu", {"type": int}),
                        ("--gpu-reserve-mb-main", {"type": int}),
                        ("--gpu-reserve-mb-other", {"type": int}),
                        ("--override-max-gpu", {"type": int}),
                        ("--mlock", {"action": "store_true"}),
                        ("--low-vram", {"action": "store_true"}),
                        ("--no-mmap", {"action": "store_true"})):
        ap.add_argument(flag, dest="_compat", help=argparse.SUPPRESS, **extra)
    ap.add_argument("--alias", default=None,
                    help="model display name in reports (falcon_common "
                         "model_alias)")
    ap.add_argument("--display-timings", dest="verbose_timings",
                    action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--memory-f32", action="store_true",
                    help="store the KV cache in f32 (sets --kv-dtype float32)")
    ap.add_argument("--kv-dtype", default="bfloat16")
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--weight-mode", default="fused", choices=["fused", "dequant"])
    ap.add_argument("--no-fused-decode", action="store_true",
                    help="force the per-token host sampling path")
    ap.add_argument("--decode-chunk", type=int, default=16,
                    help="tokens per device dispatch in the fused decode "
                         "loop (larger = faster, chunkier streaming)")
    ap.add_argument("--draft-model", default=None, metavar="FNAME",
                    help="speculative decoding: a smaller same-vocab model "
                         "drafts tokens the main model verifies in batches; "
                         "output is distributed exactly as without a draft "
                         "(engine/speculative.py; not in the reference)")
    ap.add_argument("--draft-k", type=int, default=6,
                    help="draft tokens per speculative round")
    ap.add_argument("--grammar", default="", metavar="GBNF",
                    help="constrain generation to a GBNF grammar "
                         "(llama.cpp grammar dialect; fused masked device "
                         "steps, multi-step chunks over self-looping states)")
    ap.add_argument("--grammar-file", default="", metavar="FNAME",
                    help="read the GBNF grammar from a file")
    ap.add_argument("--self-draft", type=int, default=0, metavar="N",
                    help="speculative decoding with a depth-truncated view "
                         "of the SAME model as the draft (its first N "
                         "layers; in the default kernel weight layout the "
                         "views alias the loaded weights — scan-layout "
                         "trees pay a sliced device copy of those layers)")
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
                    help="write a jax profiler trace of generation to DIR")
    ap.add_argument("-dt", "--debug-timings", type=int, default=0,
                    metavar="LEVEL", choices=[0, 1, 2, 3],
                    help="print a per-op device timing table after "
                         "generation (1=top ops, 2=more, 3=all; the "
                         "reference's falcon_main -dt / "
                         "ggml_graph_print_impl table)")
    return ap


def main(argv=None):
    args = build_argparser().parse_args(argv)
    enable_compile_cache()

    if args.interactive_first:
        args.interactive = True
    if args.memory_f32:
        args.kv_dtype = "float32"
    if args.system_file:
        with open(args.system_file, "rb") as f:
            args.sys_prompt = f.read().decode("utf-8", errors="replace")
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
                                lora_base=args.lora_base, progress=progress)
    else:
        mf, params = load_model(args.model, cfg, lora=args.lora,
                                lora_base=args.lora_base, mesh=mesh,
                                progress=progress)
    engine = FalconEngine(mf.hparams, params, cfg, mesh=mesh)
    engine.timings.t_load_us = (time.time() - t0) * 1e6
    if args.alias:
        print(f"model alias: {args.alias}", file=sys.stderr)
    vocab = mf.vocab
    tk = tok_mod.for_model(mf)

    if args.mtest:
        # the reference's --mtest: run the worst-case paths (full-batch
        # prefill + a single-token step), report time and device memory
        engine.eval([0] * min(cfg.n_batch, cfg.n_ctx - 1))
        engine.eval([0])
        print(engine.timings.report(), file=sys.stderr)
        stats = jax.local_devices()[0].memory_stats() or {}
        if "bytes_in_use" in stats:
            print(f"mtest: {stats['bytes_in_use'] / 2**20:.1f} MiB in use, "
                  f"peak {stats.get('peak_bytes_in_use', 0) / 2**20:.1f} MiB",
                  file=sys.stderr)
        return 0
    if args.export:
        with open(args.export, "w") as f:
            f.write(engine.export_hlo())
        print(f"forward graph (StableHLO) exported to {args.export}",
              file=sys.stderr)
        return 0

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
    if args.random_prompt and not prompt:
        import random

        prompt = random.Random(args.seed if args.seed >= 0
                               else None).choice(RANDOM_PROMPTS)
    if args.sys_prompt and args.system_raw:
        prompt = args.sys_prompt + prompt

    finetune = detect_finetune(args.model, vocab) if args.finetune == "auto" else args.finetune
    if args.enclose_prompt or args.instruct:
        prompt = build_prompt(finetune, prompt,
                              None if args.system_raw else args.sys_prompt)
    stopwords = finetune_stopwords(finetune)
    if args.stopwords is not None:
        stopwords = [s for s in args.stopwords.split("|") if s]
    print(f"finetune: {finetune}; stopwords: {stopwords}", file=sys.stderr)

    prompt_ids = tk.tokenize(prompt, bos=not prompt.startswith("<|endoftext|>"))
    if not prompt_ids:
        prompt_ids = [tk.bos_id]

    def verbose_tokens(ids, label):
        # falcon_main.cpp:542-555 "number of tokens in prompt" dump
        if not args.verbose_prompt:
            return
        print(f"{label}: {len(ids)} tokens", file=sys.stderr)
        for tid in ids:
            s = vocab.id_to_token[tid].decode("utf-8", errors="replace")
            s = s.replace("\n", "\\n").replace("\r", "\\r")
            print(f"{tid:6d} -> '{s}'", file=sys.stderr)

    verbose_tokens(prompt_ids, "prompt")

    if args.embedding:
        emb = engine.embed(prompt_ids)
        print(" ".join(f"{v:.6f}" for v in emb))
        return 0

    if args.perplexity:
        # falcon_main's --perplexity mode delegates to the perplexity
        # protocol over the -f text (falcon_perplexity.cpp:28-115)
        from ggllm_tpu.engine.perplexity import perplexity as ppl_run

        tokens = tk.tokenize(prompt, bos=True)
        res = ppl_run(engine, tokens)
        print(f"perplexity: {res.ppl:.4f} "
              f"[{res.n_chunks} chunks, {res.count} tokens]")
        return 0

    def set_color(code: str):
        if args.color:
            sys.stdout.write(code)
            sys.stdout.flush()

    if args.ignore_eos:
        sampler.logit_bias[tk.eos_id] = float("-inf")
    # keep the whole prompt on context swap when requested (reference
    # falcon_main: n_keep < 0 or instruct mode -> full prompt)
    n_keep = len(prompt_ids) if (args.n_keep < 0 or args.instruct) else args.n_keep

    if args.draft_model or args.self_draft:
        if args.interactive or args.instruct or args.prompt_cache:
            print("error: speculative decoding supports plain generation "
                  "only (no interactive/instruct/session modes)",
                  file=sys.stderr)
            return 1
        if mesh is not None:
            print("error: speculative decoding is single-chip "
                  "(drop -ts/--tensor-split)", file=sys.stderr)
            return 1
        from ggllm_tpu.engine.speculative import (SpeculativeDecoder,
                                                  truncate_params)

        t0 = time.time()
        if args.self_draft:
            if not 0 < args.self_draft < mf.hparams.n_layer:
                print(f"error: --self-draft must be in 1.."
                      f"{mf.hparams.n_layer - 1}", file=sys.stderr)
                return 1
            dhp = dataclasses.replace(mf.hparams, n_layer=args.self_draft)
            draft = FalconEngine(dhp, truncate_params(params, args.self_draft),
                                 cfg)
            aliased = isinstance(params.get("layers"), (list, tuple))
            print(f"self-draft: first {args.self_draft}/{mf.hparams.n_layer} "
                  f"layers ({'weights aliased' if aliased else 'layer copies'})",
                  file=sys.stderr)
        else:
            dmf, dparams = load_model(args.draft_model, cfg)
            draft = FalconEngine(dmf.hparams, dparams, cfg)
            print(f"draft model loaded in {time.time() - t0:.1f}s",
                  file=sys.stderr)
        spec = SpeculativeDecoder(engine, draft, k=args.draft_k)
        if args.prompt_cache:
            # sessions snapshot only the TARGET's cache; restoring it would
            # desynchronize the draft — speculative runs prefill fresh
            print("note: --prompt-cache is ignored in speculative mode "
                  "(the draft cache is not part of session state)",
                  file=sys.stderr)
        ss = StopStream([s.encode() for s in stopwords],
                        [a.encode() for a in args.reverse_prompt])
        set_color(ANSI_PROMPT)
        sys.stdout.buffer.write(prompt.encode())
        sys.stdout.flush()
        set_color(ANSI_RESET)

        def on_tok(tok: int):
            out = ss.push(vocab.id_to_token[tok])
            if out:
                sys.stdout.buffer.write(out)
                sys.stdout.flush()
            return not ss.stopped

        spec.generate(prompt_ids, args.n_predict, sampler,
                      stop_ids={tk.eos_id}, on_token=on_tok)
        if not ss.stopped:
            tail = ss.flush()
            if tail:
                sys.stdout.buffer.write(tail)
                sys.stdout.flush()
        print()
        print(spec.stats.report(), file=sys.stderr)
        print(engine.timings.report(), file=sys.stderr)
        return 0

    # session reuse (--prompt-cache): skip matching prefix
    eval_ids = list(prompt_ids)
    if args.prompt_cache:
        eval_ids = session_mod.try_load(args.prompt_cache, engine, prompt_ids)
        reused = len(prompt_ids) - len(eval_ids)
        if reused:
            print(f"session: reused {reused} prompt tokens", file=sys.stderr)

    grammar = None
    if args.grammar or args.grammar_file:
        from ggllm_tpu.ops.grammar import GrammarSampler, parse_gbnf
        text = args.grammar
        if args.grammar_file:
            with open(args.grammar_file) as f:
                text = f.read()
        grammar = GrammarSampler(parse_gbnf(text), vocab.id_to_token,
                                 tk.eos_id)

    gen = Generator(engine, sampler, tk.eos_id, n_keep,
                    fused_ok=not args.no_fused_decode,
                    log=lambda m: print(f"\n[{m}]", file=sys.stderr),
                    grammar=grammar)
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

    set_color(ANSI_PROMPT)
    sys.stdout.buffer.write(prompt.encode())
    sys.stdout.flush()
    set_color(ANSI_RESET)

    if args.debug_timings and not args.profile:
        import tempfile

        args.profile = tempfile.mkdtemp(prefix="ggllm_dt_")
    if args.profile:
        jax.profiler.start_trace(args.profile)

    if not eval_ids:
        eval_ids = [prompt_ids[-1]]
        gen.all_tokens = gen.all_tokens[:-1]
        engine.n_past = max(0, engine.n_past - 1)
    logits = gen.prefill(eval_ids)
    if args.prompt_cache and not args.prompt_cache_ro and len(eval_ids) > 1:
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

    # prefill logits not yet consumed by a generation turn (interactive-first
    # defers the first turn until the user has spoken — or pressed Enter)
    pending_logits = None
    if args.interactive_first:
        pending_logits = logits
    else:
        run_turn(logits)

    if args.interactive:
        control = (
            " - To submit your input, end it with '\\'.\n"
            if args.multiline_input else
            " - Return submits; a trailing '\\' continues on another line;\n"
            "   a trailing '/' submits without the final newline.\n")
        print("== Running in interactive mode. ==\n"
              " - An empty input continues the generation; Ctrl+D exits.\n"
              + control, file=sys.stderr)
        while True:
            set_color(ANSI_USER)
            if args.in_prefix:
                sys.stdout.write(args.in_prefix)
                sys.stdout.flush()
            line = read_user_input(args.multiline_input)
            set_color(ANSI_RESET)
            if line is None:
                break
            if line.strip():
                text = args.in_prefix + line + args.in_suffix
                if args.in_suffix:
                    sys.stdout.write(args.in_suffix)
                    sys.stdout.flush()
                if args.instruct:
                    text = build_prompt(finetune, text, None)
                ids = tk.tokenize(text)
                verbose_tokens(ids, "input")
                logits = gen.prefill(ids)
            elif pending_logits is not None:
                # interactive-first + empty input: generate from the prompt
                logits = pending_logits
            elif gen.pending_feed:
                logits = gen.prefill([])  # continue the generation
            else:
                continue
            pending_logits = None
            run_turn(logits)

    if args.profile:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {args.profile}", file=sys.stderr)
    if args.debug_timings:
        from ggllm_tpu.utils import traceview

        try:
            stats = traceview.load_op_stats(args.profile)
            print(traceview.format_table(stats, args.debug_timings),
                  file=sys.stderr)
        except (OSError, ValueError) as e:
            print(f"debug-timings: could not parse trace: {e}",
                  file=sys.stderr)
    if args.prompt_cache and args.prompt_cache_all and not args.prompt_cache_ro:
        # --prompt-cache-all: the final save includes generated output
        # (falcon_main.cpp:1228-1231); without it the session keeps only the
        # prompt saved after prefill above
        if gen.swapped:
            print("session: not saved (context swap invalidated the cache)",
                  file=sys.stderr)
        else:
            session_mod.save(args.prompt_cache, engine,
                             gen.all_tokens[: engine.n_past],
                             sampler_state=gen.state, rng_key=gen.rng)
    print(engine.timings.report(), file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
