"""HTTP inference server.

The capability analogue of examples/server/server.cpp (:784-895 route table):

  POST /completion  — generate from a prompt; JSON body with the sampling
                      surface of llama_server_context; ``stream: true`` sends
                      SSE chunks (``data: {json}\n\n``), else one JSON object.
                      ``grammar`` (GBNF text) constrains sampling
                      (ops/grammar.py; single-stream AND batched modes —
                      batched rows decode 1-step with per-row masks).
  POST /tokenize    — {"content": str} -> {"tokens": [int]}
  GET  /            — liveness/info JSON.

OpenAI-compatible surface (beyond the reference, for drop-in clients):

  POST /v1/completions       — text completion, incl. SSE streaming + [DONE]
  POST /v1/chat/completions  — chat completion (role-tagged fallback template)
  GET  /v1/models            — model listing
  GET  /metrics              — Prometheus counters (requests/tokens)

Like the reference (one llama_server_context, server.cpp:29), the server
wraps ONE engine and serializes generation requests; prompt-prefix reuse
(common_part, server.cpp:281-292) keeps the KV cache warm across turns by
rolling n_past back to the longest shared prefix. Stop strings are matched
over the generated text with partial-suffix holdback in streaming mode so a
stop word split across tokens is never leaked.
"""

from __future__ import annotations

import itertools
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
                 alias: str = "unknown", spec=None):
        self.engine = engine
        self.vocab = vocab
        self.alias = alias
        self.tk = tok_mod.Tokenizer(vocab=vocab, arch=arch)
        self.lock = threading.Lock()
        self.cache_tokens: list[int] = []
        self._grammar_trie = None  # lazily built, shared across requests
        # speculative decoding (engine/speculative.SpeculativeDecoder over
        # THIS engine + a draft): requests whose sampler fits the fused
        # device round (greedy or penalty-free cascade) ride draft/verify
        # rounds; everything else falls back to the plain Generator path
        self.spec = spec
        self.draft_tokens: list[int] = []  # stream the draft cache has seen

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

        use_spec = (self.spec is not None and not body.get("grammar")
                    and self.spec._fused_ok(sampler) and n_predict > 0)

        # prefix reuse against the previous request's tokens
        n_common = _common_part(self.cache_tokens, prompt_ids)
        if use_spec:
            # the draft cache must also cover the reused prefix; clamp to
            # the stream the draft engine has actually seen
            n_common = min(n_common,
                           _common_part(self.draft_tokens, prompt_ids),
                           self.spec.draft.n_past)
        if n_common == len(prompt_ids):
            n_common -= 1  # always re-eval at least the final token
        if n_common > 0 and n_common <= eng.n_past:
            eng.n_past = n_common
            to_eval = prompt_ids[n_common:]
        else:
            n_common = 0
            to_eval = prompt_ids
        if use_spec:
            if n_common > 0:
                self.spec.draft.n_past = n_common
            else:
                eng.reset()
                self.spec.draft.reset()
            return self._spec_completion(body, prompt_ids, to_eval, n_common,
                                         n_predict, stops, sampler,
                                         truncated, n_keep, emit)
        if n_common == 0:
            eng.reset()

        grammar = None
        if body.get("grammar"):
            from ggllm_tpu.ops.grammar import (GrammarSampler,
                                               build_token_trie, parse_gbnf)
            if self._grammar_trie is None:
                self._grammar_trie = build_token_trie(
                    self.vocab.id_to_token, self.tk.eos_id)
            # the handler already parsed the text for validation — reuse it
            g = body.get("_grammar") or parse_gbnf(body["grammar"])
            grammar = GrammarSampler(g, self.vocab.id_to_token,
                                     self.tk.eos_id, trie=self._grammar_trie)

        gen = Generator(eng, sampler, self.tk.eos_id, n_keep, grammar=grammar)
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


    def _spec_completion(self, body: dict, prompt_ids, to_eval, n_common,
                         n_predict, stops, sampler, truncated, n_keep,
                         emit=None) -> dict:
        """Run one completion through the speculative decoder (fused
        draft/verify rounds): streaming, stop strings, and the response
        schema match the Generator path; greedy output is bit-identical
        with or without the draft (tests/test_server.py)."""
        spec = self.spec
        eng = self.engine

        t0 = time.perf_counter()
        if len(to_eval) > 1:  # prefill both models up to the pending token
            eng.eval_tokens(to_eval[:-1])
            spec.draft.eval_tokens(to_eval[:-1])
        t_prompt = time.perf_counter() - t0

        ss = StopStream(stops)
        tokens_predicted = 0
        parts: list[bytes] = []
        outcome = {"reason": "limit"}
        eos = self.tk.eos_id

        def on_token(tok: int) -> bool:
            nonlocal tokens_predicted
            if tok == eos:
                outcome["reason"] = "eos"
                return False
            tokens_predicted += 1
            out = ss.push(self.vocab.id_to_token[tok])
            if out:
                parts.append(out)
                if emit is not None:
                    emit({"content": out.decode("utf-8", "replace"),
                          "stop": False})
            if ss.stopped:
                outcome["reason"] = "stop"
                return False
            return True

        t0 = time.perf_counter()
        out_ids = spec.generate([to_eval[-1]], n_predict, sampler,
                                on_token=on_token)
        if not ss.stopped and outcome["reason"] != "eos":
            tail = ss.flush()
            if tail:
                parts.append(tail)
                if emit is not None:
                    emit({"content": tail.decode("utf-8", "replace"),
                          "stop": False})
        t_gen = time.perf_counter() - t0

        stream_tokens = prompt_ids + list(out_ids)
        self.cache_tokens = stream_tokens
        self.draft_tokens = stream_tokens
        st = spec.stats
        out = b"".join(parts)
        return {
            "content": "" if emit else out.decode("utf-8", "replace"),
            "stop": True,
            "model": self.alias,
            "prompt": body.get("prompt", ""),
            "truncated": truncated,
            "stopped_reason": outcome["reason"],
            **_stop_fields(outcome["reason"], ss.stop_match),
            "generation_settings": _generation_settings(
                sampler, n_predict, n_keep, stops, eos),
            "tokens_predicted": tokens_predicted,
            "tokens_evaluated": len(to_eval),
            "speculative": {
                "rounds": st.n_rounds, "drafted": st.n_drafted,
                "accepted": st.n_accepted, "emitted": st.n_emitted,
                "acceptance": round(st.acceptance, 4),
            },
            "timings": {
                "prompt_ms": round(t_prompt * 1e3, 2),
                "predicted_ms": round(t_gen * 1e3, 2),
                "predicted_per_second": round(tokens_predicted / t_gen, 2)
                if t_gen > 0 else None,
            },
        }


class BatchedServerState:
    """Continuous-batching server state (--parallel N > 1): one scheduler
    thread owns the engine; concurrent /completion requests decode TOGETHER
    in fused batched chunks instead of serializing behind a lock.

    Sampler coverage per request: the full per-row device cascade —
    greedy/temp/top-k/top-p/tfs/typical, repeat/frequency/presence penalties
    (fixed 64-token window), sparse logit bias (<= 64 entries, incl.
    ignore_eos), mirostat v1/v2 with per-row adaptive mu, and GBNF grammar
    constraints (per-row validity masks; while a grammar row is active the
    whole batch decodes in 1-step dispatches). Only penalize_nl=false and
    top_k > the 64-candidate device cap still require --parallel 1."""

    def __init__(self, engine: FalconEngine, vocab, arch: str = "falcon",
                 chunk: int = 8, alias: str = "unknown",
                 prefill_chunk: int = 256):
        from ggllm_tpu.engine.batching import ContinuousBatcher

        self.engine = engine
        self.vocab = vocab
        self.alias = alias
        self.tk = tok_mod.Tokenizer(vocab=vocab, arch=arch)
        self._grammar_trie = None  # lazily built, shared across requests
        self.batcher = ContinuousBatcher(engine, chunk=chunk,
                                         prefill_chunk=prefill_chunk)
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

    def unsupported(self, body: dict) -> str | None:
        """Why this request can't run in batched mode (None = it can)."""
        if not body.get("penalize_nl", True):
            return "penalize_nl=false requires --parallel 1"
        if body.get("grammar") and self.engine.mesh is not None:
            return "grammar in batched mode requires a single-device engine"
        # count MERGED bias entries: ignore_eos adds a -inf bias on eos, so
        # 64 explicit entries + ignore_eos would overflow the device arrays
        # and silently drop one (the cap check must see what _bias_arrays
        # will see)
        bias_ids = {int(t) for t, _ in body.get("logit_bias", [])}
        if body.get("ignore_eos"):
            bias_ids.add(self.tk.eos_id)
        if len(bias_ids) > 64:
            return ("logit_bias is capped at 64 entries in batched mode "
                    "(ignore_eos counts as one)")
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

        logit_bias = {int(t): (float("-inf") if b is False else float(b))
                      for t, b in body.get("logit_bias", [])}
        if body.get("ignore_eos"):
            logit_bias[eos] = float("-inf")
        gs = None
        if body.get("grammar"):
            from ggllm_tpu.ops.grammar import (GrammarSampler,
                                               build_token_trie, parse_gbnf)
            if self._grammar_trie is None:
                self._grammar_trie = build_token_trie(
                    self.vocab.id_to_token, eos)
            g = body.get("_grammar") or parse_gbnf(body["grammar"])
            gs = GrammarSampler(g, self.vocab.id_to_token, eos,
                                trie=self._grammar_trie)
        req = Request(
            prompt_ids=prompt_ids, n_predict=n_predict,
            temp=float(body.get("temperature", 0.8)),
            top_p=float(body.get("top_p", 0.95)),
            top_k=int(body.get("top_k", 40)),
            repeat_penalty=float(body.get("repeat_penalty", 1.1)),
            frequency_penalty=float(body.get("frequency_penalty", 0.0)),
            presence_penalty=float(body.get("presence_penalty", 0.0)),
            tfs_z=float(body.get("tfs_z", 1.0)),
            typical_p=float(body.get("typical_p", 1.0)),
            mirostat=int(body.get("mirostat", 0)),
            mirostat_tau=float(body.get("mirostat_tau", 5.0)),
            mirostat_eta=float(body.get("mirostat_eta", 0.1)),
            logit_bias=logit_bias,
            stream=stream,
            grammar_sampler=gs,
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
        gs_sampler = sampling.SamplerParams(
            temp=req.temp, top_p=req.top_p, top_k=req.top_k,
            tfs_z=req.tfs_z, typical_p=req.typical_p,
            repeat_penalty=req.repeat_penalty,
            frequency_penalty=req.frequency_penalty,
            presence_penalty=req.presence_penalty,
            mirostat=req.mirostat, mirostat_tau=req.mirostat_tau,
            mirostat_eta=req.mirostat_eta, logit_bias=req.logit_bias,
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


def _chat_to_prompt(messages: list[dict]) -> tuple[str, list[str]]:
    """Minimal chat templating for /v1/chat/completions: role-tagged turns
    with the assistant turn left open. Returns (prompt, extra stop strings).
    Falcon instruction finetunes mostly train on User:/Assistant: style
    turns (utils/finetune.py templates); this is the generic fallback."""
    parts = []
    for m in messages:
        role = m.get("role", "user")
        content = m.get("content", "")
        if role == "system":
            parts.append(f"{content}\n")
        elif role == "assistant":
            parts.append(f"Assistant: {content}\n")
        else:
            parts.append(f"User: {content}\n")
    parts.append("Assistant:")
    return "".join(parts), ["\nUser:"]


def _openai_to_native(body: dict, chat: bool) -> dict:
    """Translate an OpenAI-style request body to the native /completion
    schema (the subset both schemas express)."""
    if chat:
        prompt, extra_stops = _chat_to_prompt(body.get("messages", []))
    else:
        prompt = body.get("prompt", "")
        if isinstance(prompt, list):
            prompt = "".join(prompt)
        extra_stops = []
    stop = body.get("stop") or []
    if isinstance(stop, str):
        stop = [stop]
    native = {
        "prompt": prompt,
        "n_predict": int(body.get("max_tokens", 128)),
        "temperature": float(body.get("temperature", 0.8)),
        "top_p": float(body.get("top_p", 0.95)),
        "stop": list(stop) + extra_stops,
        "frequency_penalty": float(body.get("frequency_penalty", 0.0)),
        "presence_penalty": float(body.get("presence_penalty", 0.0)),
        "seed": int(body.get("seed", -1)),
        # OpenAI logit_bias is {"token_id": bias}; native is [[id, bias]]
        "logit_bias": [[int(t), float(b)]
                       for t, b in (body.get("logit_bias") or {}).items()],
    }
    if "top_k" in body:  # common extension
        native["top_k"] = int(body["top_k"])
    return native


def _openai_response(final: dict, chat: bool, rid: int, model: str) -> dict:
    finish = "length" if final.get("stopped_limit") else "stop"
    text = final.get("content", "")
    if chat:
        choice = {"index": 0, "finish_reason": finish,
                  "message": {"role": "assistant", "content": text}}
        obj = "chat.completion"
    else:
        choice = {"index": 0, "finish_reason": finish, "logprobs": None,
                  "text": text}
        obj = "text_completion"
    return {
        "id": f"{'chatcmpl' if chat else 'cmpl'}-{rid}",
        "object": obj,
        "created": int(time.time()),
        "model": model,
        "choices": [choice],
        "usage": {
            "prompt_tokens": final.get("tokens_evaluated", 0),
            "completion_tokens": final.get("tokens_predicted", 0),
            "total_tokens": (final.get("tokens_evaluated", 0)
                             + final.get("tokens_predicted", 0)),
        },
    }


def make_handler(state: ServerState):
    # handler threads are concurrent in batched mode: request ids come from
    # an atomic counter and metrics updates take a lock (states built
    # outside serve() get them here)
    if not hasattr(state, "rid_counter"):
        state.rid_counter = itertools.count(1)
        state.metrics_lock = threading.Lock()

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
            if self.path == "/v1/models":
                self._json(200, {"object": "list", "data": [{
                    "id": state.alias, "object": "model",
                    "created": 0, "owned_by": "ggllm_tpu"}]})
                return
            if self.path == "/metrics":
                # Prometheus text exposition (no reference analogue; the
                # reference's observability is stderr tables, SURVEY §5.5)
                m = getattr(state, "metrics", None) or {}
                lines = []
                names = [
                    ("requests_total", "Completed completion requests"),
                    ("prompt_tokens_total", "Prompt tokens evaluated"),
                    ("generated_tokens_total", "Tokens generated")]
                if getattr(state, "spec", None) is not None:
                    names += [
                        ("spec_rounds_total", "Speculative draft/verify rounds"),
                        ("spec_drafted_total", "Draft tokens proposed"),
                        ("spec_accepted_total", "Draft tokens accepted")]
                for name, help_ in names:
                    lines.append(f"# HELP ggllm_{name} {help_}")
                    lines.append(f"# TYPE ggllm_{name} counter")
                    lines.append(f"ggllm_{name} {m.get(name, 0)}")
                data = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return
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
                self._run_completion(body, openai=None)
                return
            if self.path == "/v1/completions":
                self._run_completion(_openai_to_native(body, chat=False),
                                     openai="completion",
                                     stream=bool(body.get("stream")))
                return
            if self.path == "/v1/chat/completions":
                self._run_completion(_openai_to_native(body, chat=True),
                                     openai="chat",
                                     stream=bool(body.get("stream")))
                return
            self._json(404, {"error": "not found"})

        def _run_completion(self, body: dict, openai: str | None,
                            stream: bool | None = None):
            batched = isinstance(state, BatchedServerState)
            if batched:
                why = state.unsupported(body)
                if why is not None:
                    self._json(400, {"error": why})
                    return
            if body.get("grammar"):
                from ggllm_tpu.ops.grammar import GrammarError, parse_gbnf
                try:
                    body["_grammar"] = parse_gbnf(body["grammar"])
                except GrammarError as e:
                    self._json(400, {"error": f"bad grammar: {e}"})
                    return
            if stream is None:
                stream = bool(body.get("stream"))
            metrics = getattr(state, "metrics", None)
            # handler threads run concurrently in batched mode: rids come
            # from an atomic counter and counter updates take the lock so
            # no increment is lost
            rid = next(state.rid_counter)

            def account(final):
                if metrics is not None:
                    sp = final.get("speculative") or {}
                    with state.metrics_lock:
                        metrics["requests_total"] += 1
                        metrics["prompt_tokens_total"] += \
                            final.get("tokens_evaluated", 0)
                        metrics["generated_tokens_total"] += \
                            final.get("tokens_predicted", 0)
                        if sp:
                            metrics["spec_rounds_total"] += sp.get("rounds", 0)
                            metrics["spec_drafted_total"] += \
                                sp.get("drafted", 0)
                            metrics["spec_accepted_total"] += \
                                sp.get("accepted", 0)

            def run(emit=None):
                if batched:  # concurrent: the scheduler thread batches
                    final = state.completion(body, emit=emit)
                else:
                    with state.lock:
                        final = state.completion(body, emit=emit)
                account(final)
                return final

            chat = openai == "chat"
            if stream:
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Connection", "close")
                self.end_headers()

                def send(obj):
                    self.wfile.write(b"data: " + json.dumps(obj).encode()
                                     + b"\n\n")
                    self.wfile.flush()

                if openai is None:
                    send(run(emit=send))
                    return
                # OpenAI streaming: per-token delta chunks + [DONE]
                base = {"id": f"{'chatcmpl' if chat else 'cmpl'}-{rid}",
                        "object": ("chat.completion.chunk" if chat
                                   else "text_completion"),
                        "created": int(time.time()), "model": state.alias}

                def emit(chunk):
                    text = chunk.get("content", "")
                    if not text and chunk.get("stop"):
                        return
                    delta = ({"delta": {"content": text}} if chat
                             else {"text": text, "logprobs": None})
                    send({**base, "choices": [
                        {"index": 0, "finish_reason": None, **delta}]})

                final = run(emit=emit)
                finish = "length" if final.get("stopped_limit") else "stop"
                tail = ({"delta": {}} if chat else {"text": "",
                                                    "logprobs": None})
                send({**base, "choices": [
                    {"index": 0, "finish_reason": finish, **tail}]})
                self.wfile.write(b"data: [DONE]\n\n")
                self.wfile.flush()
                return
            final = run()
            if openai is None:
                self._json(200, final)
            else:
                self._json(200, _openai_response(final, chat, rid,
                                                 state.alias))

    return Handler


def serve(engine: FalconEngine, vocab, host: str = "127.0.0.1", port: int = 8080,
          arch: str = "falcon", parallel: int = 1, chunk: int = 8,
          alias: str = "unknown", draft_engine=None, draft_k: int = 6,
          prefill_chunk: int = 256):
    """parallel > 1 serves concurrent requests through the continuous
    batcher (the engine must be built with batch_size=parallel).
    draft_engine enables speculative decoding for fused-coverable samplers
    (single-stream serving only)."""
    if parallel > 1:
        assert engine.batch == parallel, "engine batch_size must match --parallel"
        assert draft_engine is None, \
            "speculative serving requires --parallel 1"
        state = BatchedServerState(engine, vocab, arch, chunk=chunk,
                                   alias=alias, prefill_chunk=prefill_chunk)
    else:
        spec = None
        if draft_engine is not None:
            from ggllm_tpu.engine.speculative import SpeculativeDecoder
            spec = SpeculativeDecoder(engine, draft_engine, k=draft_k)
        state = ServerState(engine, vocab, arch, alias=alias, spec=spec)
    state.metrics = {"requests_total": 0, "prompt_tokens_total": 0,
                     "generated_tokens_total": 0, "spec_rounds_total": 0,
                     "spec_drafted_total": 0, "spec_accepted_total": 0}
    httpd = _Server((host, port), make_handler(state))
    httpd.state = state
    return httpd


class _Server(ThreadingHTTPServer):
    # the stdlib default listen backlog is 5: a burst of concurrent clients
    # (the whole point of --parallel) overflows it and the kernel RSTs the
    # excess connections. Size it for continuous-batching fan-in.
    request_queue_size = 256
    daemon_threads = True


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
    ap.add_argument("--prefill-chunk", type=int, default=256,
                    help="admission prefill tokens per dispatch: bounds the "
                         "decode stall in-flight streams see while a new "
                         "request's prompt evaluates (smaller = smoother, "
                         "larger = higher prefill throughput)")
    ap.add_argument("--kv-dtype", default="bfloat16")
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--weight-mode", default="fused", choices=["fused", "dequant"])
    ap.add_argument("-a", "--alias", default=None,
                    help="model name returned in responses (server.cpp "
                         "model_alias; defaults to the model path)")
    ap.add_argument("--lora", default=None, help="apply a 'ggla' LoRA adapter")
    ap.add_argument("--lora-base", default=None,
                    help="unquantized base model for --lora")
    ap.add_argument("--draft-model", default=None, metavar="FNAME",
                    help="speculative decoding: a smaller same-vocab model "
                         "drafts tokens the main model verifies (fused "
                         "device rounds; --parallel 1 only)")
    ap.add_argument("--self-draft", type=int, default=0, metavar="N",
                    help="speculative decoding with the model's own first N "
                         "layers as the draft (--parallel 1 only)")
    ap.add_argument("--draft-k", type=int, default=6,
                    help="draft tokens per speculative round")
    args = ap.parse_args(argv)

    cfg = EngineConfig(n_ctx=args.ctx_size, n_batch=args.batch_size,
                       kv_dtype=args.kv_dtype, compute_dtype=args.compute_dtype,
                       weight_mode=args.weight_mode)
    mf, params = load_model(args.model, cfg, lora=args.lora,
                            lora_base=args.lora_base)
    engine = FalconEngine(mf.hparams, params, cfg, batch_size=args.parallel)
    draft = None
    if args.draft_model or args.self_draft:
        import dataclasses
        import sys

        if args.parallel > 1:
            print("error: speculative serving requires --parallel 1",
                  file=sys.stderr)
            return 1
        if args.self_draft:
            from ggllm_tpu.engine.speculative import truncate_params

            if not 0 < args.self_draft < mf.hparams.n_layer:
                print(f"error: --self-draft must be in 1.."
                      f"{mf.hparams.n_layer - 1}", file=sys.stderr)
                return 1
            dhp = dataclasses.replace(mf.hparams, n_layer=args.self_draft)
            draft = FalconEngine(dhp,
                                 truncate_params(params, args.self_draft),
                                 cfg)
        else:
            dmf, dparams = load_model(args.draft_model, cfg)
            draft = FalconEngine(dmf.hparams, dparams, cfg)
    httpd = serve(engine, mf.vocab, args.host, args.port, arch=mf.arch,
                  parallel=args.parallel, chunk=args.decode_chunk,
                  alias=args.alias or args.model, draft_engine=draft,
                  draft_k=args.draft_k, prefill_chunk=args.prefill_chunk)
    print(f"listening on http://{args.host}:{httpd.server_address[1]}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
