"""HTTP inference server.

The capability analogue of examples/server/server.cpp (:784-895 route table):

  POST /completion  — generate from a prompt; JSON body with the sampling
                      surface of llama_server_context; ``stream: true`` sends
                      SSE chunks (``data: {json}\n\n``), else one JSON object.
  POST /tokenize    — {"content": str} -> {"tokens": [int]}
  GET  /            — liveness/info JSON.

Like the reference (one llama_server_context, server.cpp:29), the server
wraps ONE engine and serializes generation requests; prompt-prefix reuse
(common_part, server.cpp:281-292) keeps the KV cache warm across turns by
rolling n_past back to the longest shared prefix. Stop strings are matched
over the generated text with partial-suffix holdback in streaming mode so a
stop word split across tokens is never leaked.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import queue as queue_mod

from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.engine.generator import Generator
from ggllm_tpu.ops import sampling
from ggllm_tpu import tokenizer as tok_mod
from ggllm_tpu.utils.stream import StopStream


def _common_part(a: list[int], b: list[int]) -> int:
    n = 0
    while n < len(a) and n < len(b) and a[n] == b[n]:
        n += 1
    return n


def _generation_settings(sampler: sampling.SamplerParams, n_predict: int,
                         n_keep: int, stops: list[bytes],
                         eos_id: int) -> dict:
    """format_generation_settings analogue (server.cpp:620-645)."""
    return {
        "n_predict": n_predict, "n_keep": n_keep,
        "temp": sampler.temp, "top_k": sampler.top_k, "top_p": sampler.top_p,
        "tfs_z": sampler.tfs_z, "typical_p": sampler.typical_p,
        "repeat_last_n": sampler.repeat_last_n,
        "repeat_penalty": sampler.repeat_penalty,
        "presence_penalty": sampler.presence_penalty,
        "frequency_penalty": sampler.frequency_penalty,
        "mirostat": sampler.mirostat, "mirostat_tau": sampler.mirostat_tau,
        "mirostat_eta": sampler.mirostat_eta,
        "penalize_nl": sampler.penalize_nl, "seed": sampler.seed,
        "stop": [s.decode("utf-8", "replace") for s in stops],
        # server.cpp: specifically whether the EOS logit is banned
        "ignore_eos": sampler.logit_bias.get(eos_id) == float("-inf"),
    }


def _stop_fields(stop_reason: str, stop_match: bytes | None) -> dict:
    """The reference's stopped_* booleans (server.cpp:650-662)."""
    return {
        "stopped_eos": stop_reason == "eos",
        "stopped_word": stop_reason == "stop",
        "stopped_limit": stop_reason == "limit",
        "stopping_word": (stop_match or b"").decode("utf-8", "replace"),
    }


class ServerState:
    """One engine + its conversation cache, guarded by a lock."""

    def __init__(self, engine: FalconEngine, vocab, arch: str = "falcon",
                 alias: str = "unknown"):
        self.engine = engine
        self.vocab = vocab
        self.alias = alias
        self.tk = tok_mod.Tokenizer(vocab=vocab, arch=arch)
        self.lock = threading.Lock()
        self.cache_tokens: list[int] = []

    # ------------------------------------------------------------ generate

    def sampler_from(self, body: dict) -> sampling.SamplerParams:
        logit_bias = {int(t): (float("-inf") if b is False else float(b))
                      for t, b in body.get("logit_bias", [])}
        if body.get("ignore_eos"):
            # server.cpp parse_options_completion: logit_bias[eos] = -inf
            logit_bias[self.tk.eos_id] = float("-inf")
        return sampling.SamplerParams(
            top_k=int(body.get("top_k", 40)),
            top_p=float(body.get("top_p", 0.95)),
            tfs_z=float(body.get("tfs_z", 1.0)),
            typical_p=float(body.get("typical_p", 1.0)),
            temp=float(body.get("temperature", 0.8)),
            repeat_penalty=float(body.get("repeat_penalty", 1.1)),
            repeat_last_n=int(body.get("repeat_last_n", 64)),
            frequency_penalty=float(body.get("frequency_penalty", 0.0)),
            presence_penalty=float(body.get("presence_penalty", 0.0)),
            mirostat=int(body.get("mirostat", 0)),
            mirostat_tau=float(body.get("mirostat_tau", 5.0)),
            mirostat_eta=float(body.get("mirostat_eta", 0.1)),
            penalize_nl=bool(body.get("penalize_nl", True)),
            # [[token_id, bias], ...]; false bans the token (server.cpp parity)
            logit_bias=logit_bias,
            seed=int(body.get("seed", -1)),
        )

    def completion(self, body: dict, emit=None) -> dict:
        """Run one completion. emit(chunk_dict) streams; returns final dict.

        Generation goes through the shared Generator, so device-coverable
        sampler configs run the engine's fused multi-token decode loop
        (DECODE_CHUNK forward+sample steps per dispatch) instead of
        per-token host round trips."""
        eng = self.engine
        cfg = eng.cfg
        prompt = body.get("prompt", "")
        n_predict = int(body.get("n_predict", 128))
        stops = [s.encode() for s in body.get("stop", []) if s]
        sampler = self.sampler_from(body)

        prompt_ids = self.tk.tokenize(prompt, bos=True)
        n_keep = int(body.get("n_keep", 0)) or cfg.n_ctx // 4
        truncated = False
        if len(prompt_ids) >= cfg.n_ctx:
            # keep n_keep head + most recent tail (server.cpp truncation);
            # clamp so head + tail + n_predict always fits in n_ctx
            n_keep = max(0, min(n_keep, cfg.n_ctx - n_predict - 1))
            tail = max(1, cfg.n_ctx - n_keep - n_predict)
            prompt_ids = prompt_ids[:n_keep] + prompt_ids[-tail:]
            truncated = True

        # prefix reuse against the previous request's tokens
        n_common = _common_part(self.cache_tokens, prompt_ids)
        if n_common == len(prompt_ids):
            n_common -= 1  # always re-eval at least the final token
        if n_common > 0 and n_common <= eng.n_past:
            eng.n_past = n_common
            to_eval = prompt_ids[n_common:]
        else:
            eng.reset()
            n_common = 0
            to_eval = prompt_ids

        gen = Generator(eng, sampler, self.tk.eos_id, n_keep)
        gen.all_tokens = list(prompt_ids[:n_common])

        t0 = time.perf_counter()
        logits = gen.prefill(to_eval)
        t_prompt = time.perf_counter() - t0

        ss = StopStream(stops)
        tokens_predicted = 0
        parts: list[bytes] = []

        def on_token(tok: int) -> bool:
            nonlocal tokens_predicted
            tokens_predicted += 1
            out = ss.push(self.vocab.id_to_token[tok])
            if out:
                parts.append(out)
                if emit is not None:
                    emit({"content": out.decode("utf-8", "replace"),
                          "stop": False})
            return not ss.stopped

        t0 = time.perf_counter()
        reason = gen.generate(logits, n_predict, on_token)
        if not ss.stopped:
            tail = ss.flush()
            if tail:
                parts.append(tail)
                if emit is not None:
                    emit({"content": tail.decode("utf-8", "replace"),
                          "stop": False})
        t_gen = time.perf_counter() - t0

        stop_reason = {"callback": "stop", "eos": "eos"}.get(reason, "limit")
        self.cache_tokens = list(gen.all_tokens) if not gen.swapped else []
        out = b"".join(parts)
        final = {
            "content": "" if emit else out.decode("utf-8", "replace"),
            "stop": True,
            "model": self.alias,
            "prompt": prompt,
            "truncated": truncated,
            "stopped_reason": stop_reason,
            **_stop_fields(stop_reason, ss.stop_match),
            "generation_settings": _generation_settings(
                sampler, n_predict, n_keep, stops, self.tk.eos_id),
            "tokens_predicted": tokens_predicted,
            "tokens_evaluated": len(to_eval),
            "timings": {
                "prompt_ms": round(t_prompt * 1e3, 2),
                "predicted_ms": round(t_gen * 1e3, 2),
                "predicted_per_second": round(tokens_predicted / t_gen, 2) if t_gen > 0 else None,
            },
        }
        return final


class BatchedServerState:
    """Continuous-batching server state (--parallel N > 1): one scheduler
    thread owns the engine; concurrent /completion requests decode TOGETHER
    in fused batched chunks instead of serializing behind a lock.

    Sampler coverage per request: greedy/temp/top-k/top-p + repeat/frequency/
    presence penalties (fixed 64-token window). tfs/typical/mirostat/
    logit_bias requests are rejected with a clear error — use --parallel 1
    for the full per-token cascade."""

    def __init__(self, engine: FalconEngine, vocab, arch: str = "falcon",
                 chunk: int = 8, alias: str = "unknown"):
        from ggllm_tpu.engine.batching import ContinuousBatcher

        self.engine = engine
        self.vocab = vocab
        self.alias = alias
        self.tk = tok_mod.Tokenizer(vocab=vocab, arch=arch)
        self.batcher = ContinuousBatcher(engine, chunk=chunk)
        self.cv = threading.Condition()
        self._stop = False
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def shutdown(self):
        with self.cv:
            self._stop = True
            self.cv.notify_all()

    def _loop(self):
        while True:
            with self.cv:
                while not self._stop and not (self.batcher.queue
                                              or self.batcher.active):
                    self.cv.wait()
                if self._stop:
                    return
            try:
                self.batcher.step()
            except Exception as e:  # surface scheduler faults to waiters
                import sys
                import traceback

                traceback.print_exc(file=sys.stderr)
                with self.cv:
                    for r in list(self.batcher.queue) + self.batcher.active:
                        r.done = True
                        if r.stream is not None:
                            r.stream(-1)
                    self.batcher.queue.clear()
                    self._stop = True
                raise e

    @staticmethod
    def unsupported(body: dict) -> str | None:
        """Why this request can't run in batched mode (None = it can)."""
        if int(body.get("mirostat", 0)):
            return "mirostat requires --parallel 1"
        if float(body.get("tfs_z", 1.0)) < 1.0:
            return "tfs_z requires --parallel 1"
        if float(body.get("typical_p", 1.0)) < 1.0:
            return "typical_p requires --parallel 1"
        if body.get("logit_bias"):
            return "logit_bias requires --parallel 1"
        if body.get("ignore_eos"):
            return "ignore_eos requires --parallel 1"
        if not body.get("penalize_nl", True):
            return "penalize_nl=false requires --parallel 1"
        if float(body.get("temperature", 0.8)) > 0 and \
                not (0 < int(body.get("top_k", 40)) <= 64):
            return "top_k must be in 1..64 in batched mode"
        return None

    def completion(self, body: dict, emit=None) -> dict:
        from ggllm_tpu.engine.batching import Request

        cfg = self.engine.cfg
        n_predict = int(body.get("n_predict", 128))
        stops = [s.encode() for s in body.get("stop", []) if s]
        prompt_ids = self.tk.tokenize(body.get("prompt", ""), bos=True)
        truncated = False
        if len(prompt_ids) + n_predict >= cfg.n_ctx:
            n_keep = max(0, min(int(body.get("n_keep", 0)) or cfg.n_ctx // 4,
                                cfg.n_ctx - n_predict - 1))
            tail = max(1, cfg.n_ctx - n_keep - n_predict)
            prompt_ids = prompt_ids[:n_keep] + prompt_ids[-tail:]
            truncated = True

        ss = StopStream(stops)
        q: queue_mod.Queue = queue_mod.Queue()
        eos = self.tk.eos_id
        outcome = {"reason": "limit"}

        def stream(tok: int) -> bool:
            if tok < 0:  # scheduler fault sentinel
                outcome["reason"] = "error"
                q.put(None)
                return False
            if tok == eos:
                outcome["reason"] = "eos"
                q.put(None)
                return False
            out = ss.push(self.vocab.id_to_token[tok])
            if out:
                q.put(out)
            if ss.stopped:
                outcome["reason"] = "stop"
                q.put(None)
                return False
            return True

        req = Request(
            prompt_ids=prompt_ids, n_predict=n_predict,
            temp=float(body.get("temperature", 0.8)),
            top_p=float(body.get("top_p", 0.95)),
            top_k=int(body.get("top_k", 40)),
            repeat_penalty=float(body.get("repeat_penalty", 1.1)),
            frequency_penalty=float(body.get("frequency_penalty", 0.0)),
            presence_penalty=float(body.get("presence_penalty", 0.0)),
            stream=stream,
        )
        req.on_done = lambda: q.put(None)
        t0 = time.perf_counter()
        with self.cv:
            self.batcher.submit(req)
            self.cv.notify()

        parts: list[bytes] = []
        while True:
            item = q.get()
            if item is None:
                break
            parts.append(item)
            if emit is not None:
                emit({"content": item.decode("utf-8", "replace"),
                      "stop": False})
        if not ss.stopped:
            tail = ss.flush()
            if tail:
                parts.append(tail)
                if emit is not None:
                    emit({"content": tail.decode("utf-8", "replace"),
                          "stop": False})
        dt = time.perf_counter() - t0
        out = b"".join(parts)
        n_out = len(req.out)
        # batched-mode settings echo: same schema as the single-stream path
        # (the batched sampler covers a subset; unsupported knobs were
        # rejected up front, so defaults here are accurate)
        gs_sampler = sampling.SamplerParams(
            temp=req.temp, top_p=req.top_p, top_k=req.top_k,
            repeat_penalty=req.repeat_penalty,
            frequency_penalty=req.frequency_penalty,
            presence_penalty=req.presence_penalty,
            seed=int(body.get("seed", -1)))
        return {
            "content": "" if emit else out.decode("utf-8", "replace"),
            "stop": True,
            "model": self.alias,
            "prompt": body.get("prompt", ""),
            "truncated": truncated,
            "stopped_reason": outcome["reason"],
            **_stop_fields(outcome["reason"], ss.stop_match),
            "generation_settings": _generation_settings(
                gs_sampler, n_predict, int(body.get("n_keep", 0)), stops,
                self.tk.eos_id),
            "tokens_predicted": n_out,
            "tokens_evaluated": len(prompt_ids),
            "timings": {
                "total_ms": round(dt * 1e3, 2),
                "predicted_per_second": round(n_out / dt, 2) if dt > 0 else None,
            },
        }


def make_handler(state: ServerState):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # structured one-liners to stderr
            import sys
            print(json.dumps({"ts": time.time(), "msg": fmt % args}), file=sys.stderr)

        def _json(self, code: int, obj: dict):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n) if n else b"{}"
            return json.loads(raw or b"{}")

        def do_GET(self):
            if self.path == "/":
                hp = state.engine.hp
                mtype = (f"falcon-{hp.n_falcon_type}b"
                         if getattr(hp, "arch", "falcon") == "falcon" else "llama")
                self._json(200, {
                    "status": "ok",
                    "model": {"n_vocab": hp.n_vocab, "n_embd": hp.n_embd,
                              "n_layer": hp.n_layer, "n_head": hp.n_head,
                              "n_head_kv": hp.n_head_kv,
                              "type": mtype},
                    "n_ctx": state.engine.cfg.n_ctx,
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            try:
                body = self._body()
            except (ValueError, json.JSONDecodeError):
                self._json(400, {"error": "invalid json"})
                return
            if self.path == "/tokenize":
                ids = state.tk.tokenize(body.get("content", ""), bos=False)
                self._json(200, {"tokens": [int(t) for t in ids]})
                return
            if self.path == "/detokenize":
                ids = body.get("tokens", [])
                text = b"".join(state.vocab.id_to_token[int(t)] for t in ids)
                self._json(200, {"content": text.decode("utf-8", "replace")})
                return
            if self.path == "/completion":
                batched = isinstance(state, BatchedServerState)
                if batched:
                    why = state.unsupported(body)
                    if why is not None:
                        self._json(400, {"error": why})
                        return

                def run(emit=None):
                    if batched:  # concurrent: the scheduler thread batches
                        return state.completion(body, emit=emit)
                    with state.lock:
                        return state.completion(body, emit=emit)

                if body.get("stream"):
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.send_header("Cache-Control", "no-cache")
                    self.send_header("Connection", "close")
                    self.end_headers()

                    def emit(chunk):
                        self.wfile.write(b"data: " + json.dumps(chunk).encode() + b"\n\n")
                        self.wfile.flush()

                    emit(run(emit=emit))
                    return
                self._json(200, run())
                return
            self._json(404, {"error": "not found"})

    return Handler


def serve(engine: FalconEngine, vocab, host: str = "127.0.0.1", port: int = 8080,
          arch: str = "falcon", parallel: int = 1, chunk: int = 8,
          alias: str = "unknown"):
    """parallel > 1 serves concurrent requests through the continuous
    batcher (the engine must be built with batch_size=parallel)."""
    if parallel > 1:
        assert engine.batch == parallel, "engine batch_size must match --parallel"
        state = BatchedServerState(engine, vocab, arch, chunk=chunk, alias=alias)
    else:
        state = ServerState(engine, vocab, arch, alias=alias)
    httpd = ThreadingHTTPServer((host, port), make_handler(state))
    httpd.state = state
    return httpd


def main(argv=None):
    import argparse

    from ggllm_tpu.core.config import EngineConfig
    from ggllm_tpu.io.loader import load_model

    from ggllm_tpu.utils.jaxenv import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser(description="Falcon inference server (TPU)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("-b", "--batch-size", type=int, default=512)
    ap.add_argument("-np", "--parallel", type=int, default=1,
                    help="serve N concurrent requests via continuous batching")
    ap.add_argument("--decode-chunk", type=int, default=8,
                    help="batched decode tokens per dispatch")
    ap.add_argument("--kv-dtype", default="bfloat16")
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--weight-mode", default="fused", choices=["fused", "dequant"])
    ap.add_argument("-a", "--alias", default=None,
                    help="model name returned in responses (server.cpp "
                         "model_alias; defaults to the model path)")
    ap.add_argument("--lora", default=None, help="apply a 'ggla' LoRA adapter")
    ap.add_argument("--lora-base", default=None,
                    help="unquantized base model for --lora")
    args = ap.parse_args(argv)

    cfg = EngineConfig(n_ctx=args.ctx_size, n_batch=args.batch_size,
                       kv_dtype=args.kv_dtype, compute_dtype=args.compute_dtype,
                       weight_mode=args.weight_mode)
    mf, params = load_model(args.model, cfg, lora=args.lora,
                            lora_base=args.lora_base)
    engine = FalconEngine(mf.hparams, params, cfg, batch_size=args.parallel)
    httpd = serve(engine, mf.vocab, args.host, args.port, arch=mf.arch,
                  parallel=args.parallel, chunk=args.decode_chunk,
                  alias=args.alias or args.model)
    print(f"listening on http://{args.host}:{httpd.server_address[1]}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
