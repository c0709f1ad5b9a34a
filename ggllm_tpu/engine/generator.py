"""Shared generation driver for the CLI and the server.

Wraps a FalconEngine with the falcon_main generation-loop semantics
(falcon_main.cpp:676-1056): host-sampled first token, fused multi-token
device decode when the sampler config is device-coverable (engine
decode_chunk), per-token host cascade otherwise, and context swap with
n_keep on overflow (falcon_main.cpp:694-760).
"""

from __future__ import annotations

import time

from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.ops import sampling, sampling_device


class Generator:
    """One generation stream over an engine: fused decode when the sampler
    allows, host cascade otherwise; context swap on overflow.

    Invariant between calls: every token in all_tokens except those in
    pending_feed has been forwarded through the model (is in the KV cache);
    at a turn boundary pending_feed holds the final sampled token, which the
    next turn's prefill (or the fused/host forward) consumes."""

    def __init__(self, engine: FalconEngine, sampler: sampling.SamplerParams,
                 eos_id: int, n_keep: int = 0, fused_ok: bool = True,
                 log=None, grammar=None):
        self.eng = engine
        self.sampler = sampler
        self.state = sampling.SamplerState.init(sampler)
        self.eos_id = eos_id
        self.n_keep = n_keep
        self.grammar = grammar  # ops.grammar.GrammarSampler or None
        # grammar masking is data-dependent per step -> host sampling path
        self.fused = (fused_ok and grammar is None
                      and sampling_device.device_samplable(sampler))
        # grammar fast path: one fused device step per token with the
        # validity mask uploaded as packed bits (engine.decode_step_masked)
        # instead of fetching (V,) logits to mask on host — 15.3 -> 60+
        # tok/s at 7B through the device tunnel. Mesh engines and samplers
        # beyond the device cascade fall back to the host path.
        self.grammar_device = (grammar is not None and fused_ok
                               and engine.mesh is None
                               and sampling_device.device_samplable(sampler))
        # masked-chunk gating: consecutive self-looping grammar states
        # (digit runs, string interiors) share one mask, so chunks of fused
        # steps are exact there; state churn uses single steps. Exactly TWO
        # chunk sizes (1 and C) so only two XLA programs ever compile.
        self._gloop_run = 0
        self.rng = None
        self.log = log or (lambda msg: None)
        self.all_tokens: list[int] = []  # full prompt+generation history
        self.pending_feed: list[int] = []  # sampled but not yet forwarded
        self.swapped = False  # a context swap broke the tokens<->KV mapping

    def prefill(self, ids: list[int]):
        """Feed new tokens (plus any unforwarded tail); returns final logits."""
        cfg = self.eng.cfg
        feed = self.pending_feed + list(map(int, ids))
        self.pending_feed = []
        if len(feed) >= cfg.n_ctx:
            # pathological: the new input alone overflows — keep its tail
            feed = feed[-(cfg.n_ctx - 1):]
            self.eng.reset()
        elif self.eng.n_past + len(feed) > cfg.n_ctx:
            self._swap(reserve=len(feed))
        self.all_tokens.extend(map(int, ids))
        return self.eng.eval(feed)

    def _swap(self, reserve: int = 0):
        """Context swap (falcon_main.cpp:694-760): keep the first n_keep
        prompt tokens, re-ingest the most recent half of the remaining
        window (leaving room for `reserve` upcoming tokens). Tokens in
        pending_feed are NOT re-ingested — the caller's next forward
        consumes them."""
        cfg = self.eng.cfg
        n_keep = min(max(self.n_keep, 0), cfg.n_ctx // 2)
        tail_len = max((cfg.n_ctx - n_keep) // 2, 1)
        if reserve:
            tail_len = max(min(tail_len, cfg.n_ctx - n_keep - reserve), 0)
        hist = self.all_tokens[: len(self.all_tokens) - len(self.pending_feed)]
        head = hist[:n_keep]
        tail = hist[len(head):][-tail_len:] if tail_len else []
        self.eng.reset()
        ctx = head + tail
        if ctx:
            self.eng.eval(ctx)
        self.swapped = True
        self.log(f"context swap: kept {len(head)}+{len(tail)} tokens")

    def _host_sample(self, logits) -> int:
        """One host-cascade sample, grammar-masked when constrained
        (llama.cpp ordering: grammar filter BEFORE the cascade, then the
        committed token advances the grammar state)."""
        if self.grammar is not None:
            logits = self.grammar.filter_logits(logits)
        tok = sampling.sample(logits, self.all_tokens, self.sampler,
                              self.state, self.eng.cfg.n_ctx)
        if self.grammar is not None:
            self.grammar.accept(tok)
        return tok

    def generate(self, logits, n_predict: int, on_token) -> str:
        """Sample up to n_predict tokens; on_token(tok) -> False to stop.
        Returns the stop reason ('limit' | 'eos' | 'callback')."""
        eng, sampler = self.eng, self.sampler
        st = {"n_out": 0, "reason": None}

        def consume(t: int) -> bool:
            """Commit one sampled token; False ends the generation."""
            self.all_tokens.append(t)
            st["n_out"] += 1
            if t == self.eos_id:
                st["reason"] = "eos"
            elif not on_token(t):
                st["reason"] = "callback"
            elif st["n_out"] >= n_predict:
                st["reason"] = "limit"
            return st["reason"] is None

        # first token after prefill is host-sampled from the prefill logits
        # (exact cascade; the fused loop samples the successors on device)
        t0 = time.perf_counter()
        tok = self._host_sample(logits)
        eng.timings.t_sample_us += (time.perf_counter() - t0) * 1e6
        eng.timings.n_sample += 1
        try:
            if not consume(tok):
                return st["reason"]
            while True:
                if eng.n_past >= eng.cfg.n_ctx:
                    self.pending_feed = [self.all_tokens[-1]]
                    self._swap()
                    self.pending_feed = []
                if self.fused:
                    # pipelined chunks: consumption (stop checks, streaming)
                    # happens per fetched chunk while the next one computes
                    room = eng.cfg.n_ctx - eng.n_past
                    rem = n_predict - st["n_out"]
                    n_steps = min(eng.cfg.decode_chunk, rem, room)
                    n_chunks = max(1, min(rem // n_steps, room // n_steps))
                    n_before = eng.n_past
                    consumed = [0]

                    def on_chunk(arr) -> bool:
                        eng.timings.n_sample += len(arr)
                        for t in map(int, arr):
                            consumed[0] += 1
                            if not consume(t):
                                return False
                        return True

                    ok = False
                    try:
                        # only the penalty window's worth of history matters
                        win = max(int(sampler.repeat_last_n), 1)
                        _, self.rng = eng.decode_pipelined(
                            self.all_tokens[-1], n_chunks * n_steps, n_steps,
                            sampler, self.rng,
                            last_tokens=self.all_tokens[-win:],
                            on_tokens=on_chunk)
                        ok = True
                    finally:
                        if (not ok or st["reason"] is not None) \
                                and eng.n_past > n_before + consumed[0]:
                            # un-commit KV positions of tokens never consumed
                            # (incl. any chunk dispatched past the stop or an
                            # on_token exception); the final consumed token is
                            # always left unforwarded
                            eng.rollback(n_before + consumed[0])
                    if st["reason"] is not None:
                        return st["reason"]
                elif self.grammar_device:
                    # fused masked steps; while the grammar state SELF-LOOPS
                    # (mask unchanged) run multi-step chunks at fused-decode
                    # speed, consuming tokens only up to the first state
                    # change (the rest are rolled back — exactness is
                    # per-token: every committed token was sampled under
                    # its own state's mask)
                    g = self.grammar
                    s0 = (g.stacks, g.partial)
                    bits = g.valid_bits()
                    # fixed chunk size: rem/room do NOT shrink it
                    # (that would compile a new program per size) —
                    # overshoot tokens are rolled back
                    room = eng.cfg.n_ctx - eng.n_past
                    rem = n_predict - st["n_out"]
                    C = max(2, min(16, eng.cfg.decode_chunk))
                    n = C if (self._gloop_run >= 2 and room >= C
                              and rem >= 2) else 1
                    win = max(int(sampler.repeat_last_n), 1)
                    n_before = eng.n_past
                    toks, self.rng = eng.decode_chunk_masked(
                        self.all_tokens[-1], bits, n, sampler, self.rng,
                        last_tokens=self.all_tokens[-win:])
                    eng.timings.n_sample += len(toks)
                    consumed = 0
                    stop_chunk = False
                    for t in map(int, toks):
                        g.accept(t)  # raises if the mask failed
                        consumed += 1
                        cur = (g.stacks, g.partial)
                        if cur == s0 and t != self.eos_id:
                            self._gloop_run += 1
                        else:
                            self._gloop_run = 0
                            stop_chunk = True
                        if not consume(t):
                            stop_chunk = True
                        if stop_chunk:
                            break
                    if consumed < len(toks):
                        # discard steps sampled under a stale mask
                        eng.rollback(n_before + consumed)
                    if st["reason"] is not None:
                        return st["reason"]
                else:
                    new_logits = eng.eval([self.all_tokens[-1]])
                    t0 = time.perf_counter()
                    tok = self._host_sample(new_logits)
                    eng.timings.t_sample_us += (time.perf_counter() - t0) * 1e6
                    eng.timings.n_sample += 1
                    if not consume(tok):
                        return st["reason"]
        finally:
            self.pending_feed = [self.all_tokens[-1]]
