"""Continuous batching scheduler.

A capability the reference lacks (SURVEY §2.9: no data parallelism / multi-
sequence serving): B sequences decode together in one fused batched program,
each at its own KV position; finished rows free their slot and queued
requests are admitted mid-flight with a row-local prefill.

Correctness model: every batched step runs ALL rows. Idle/parked rows are
given positions in the KV scratch region (>= n_ctx, engine.kv_T slack), so
their writes never touch live entries; a row's stale cache beyond its own
n_past is invisible (attention masks t <= q_pos) and gets overwritten as the
row advances. Rows finishing mid-chunk simply stop consuming tokens — their
remaining chunk writes land beyond the final position and are ignored.

Sampler coverage matches the fused device cascade (greedy/temp/top-k/top-p,
per-row temp/top_p); penalties/mirostat requests should use the single-
stream engine path.
"""

from __future__ import annotations

import itertools
from collections import deque
from dataclasses import dataclass, field

import numpy as np
import jax

from ggllm_tpu.engine.engine import DECODE_CHUNK, FalconEngine


@dataclass
class Request:
    prompt_ids: list
    n_predict: int = 128
    temp: float = 0.0
    top_p: float = 1.0
    stop_ids: frozenset = frozenset()
    stream: object = None  # optional per-token callback(token_id)

    # filled by the batcher
    rid: int = -1
    out: list = field(default_factory=list)
    done: bool = False
    row: int = -1


class ContinuousBatcher:
    def __init__(self, engine: FalconEngine, chunk: int = DECODE_CHUNK,
                 top_k: int = 64, seed: int = 0):
        self.eng = engine
        self.B = engine.batch
        self.chunk = min(chunk, DECODE_CHUNK)
        self.top_k = top_k
        self.queue: deque[Request] = deque()
        self.rows: list[Request | None] = [None] * self.B
        self.n_past = np.full(self.B, self._park, dtype=np.int32)
        self.last_tok = np.zeros(self.B, dtype=np.int32)
        self.temp = np.zeros(self.B, dtype=np.float32)
        self.top_p = np.ones(self.B, dtype=np.float32)
        self.rng = jax.random.PRNGKey(seed)
        self._ids = itertools.count()

    @property
    def _park(self) -> int:
        return self.eng.cfg.n_ctx  # scratch region start (engine.kv_T slack)

    # ------------------------------------------------------------------ api

    def submit(self, req: Request) -> Request:
        req.rid = next(self._ids)
        req.prompt_ids = list(map(int, np.asarray(req.prompt_ids).reshape(-1)))
        assert len(req.prompt_ids) >= 1
        self.queue.append(req)
        return req

    @property
    def active(self) -> list[Request]:
        return [r for r in self.rows if r is not None]

    def step(self):
        """Admit queued requests into free rows, then run one decode chunk."""
        self._admit()
        if not self.active:
            return
        self._decode_chunk()

    def run(self):
        """Drain: step until every submitted request finished."""
        while self.queue or self.active:
            self.step()

    # ------------------------------------------------------------- internals

    def _admit(self):
        for row in range(self.B):
            if self.rows[row] is not None or not self.queue:
                continue
            req = self.queue.popleft()
            n = len(req.prompt_ids)
            if n + req.n_predict > self.eng.cfg.n_ctx:
                # truncate head, keep the most recent context
                keep = self.eng.cfg.n_ctx - req.n_predict
                req.prompt_ids = req.prompt_ids[-max(keep, 1):]
                n = len(req.prompt_ids)
            # row-local prefill: fresh row starts at position 0
            self.n_past[row] = 0
            logits = self.eng.prefill_row(row, req.prompt_ids, self.n_past)
            self.n_past[row] = n
            tok = int(np.argmax(logits)) if req.temp <= 0 else \
                self._sample_host(logits, req)
            req.row = row
            self.rows[row] = req
            self._emit(req, tok)
            if req.done:
                self._free(row)
                continue
            self.last_tok[row] = tok
            self.temp[row] = req.temp
            self.top_p[row] = req.top_p

    def _sample_host(self, logits: np.ndarray, req: Request) -> int:
        # first token after prefill: simple host top-k/temp draw (the device
        # loop handles the rest)
        self.rng, sub = jax.random.split(self.rng)
        from ggllm_tpu.ops import sampling_device
        import jax.numpy as jnp

        return int(sampling_device.sample_logits(
            jnp.asarray(logits), sub, req.temp, self.top_k, req.top_p))

    def _emit(self, req: Request, tok: int):
        req.out.append(tok)
        if req.stream is not None:
            req.stream(tok)
        if tok in req.stop_ids or len(req.out) >= req.n_predict:
            req.done = True

    def _free(self, row: int):
        self.rows[row] = None
        self.n_past[row] = self._park
        self.temp[row] = 0.0
        self.top_p[row] = 1.0
        self.last_tok[row] = 0

    def _decode_chunk(self):
        # rows with a full context end now (no tokens left to produce)
        for row, req in enumerate(self.rows):
            if req is not None and self.n_past[row] >= self.eng.cfg.n_ctx:
                req.done = True
                self._free(row)
        if not self.active:
            return
        toks, self.rng = self.eng.decode_rows(
            self.last_tok, self.n_past, self.chunk, self.temp, self.top_p,
            top_k=self.top_k, rng_key=self.rng, active_rows=len(self.active))
        for row, req in enumerate(self.rows):
            if req is None:
                continue
            # a row near the context limit still consumes the in-context
            # tokens from this chunk (KV writes past n_ctx land in the
            # scratch region and are ignored); positions beyond avail are
            # out-of-context and discarded, matching single-stream generate's
            # chunk clamp (engine.py)
            avail = self.eng.cfg.n_ctx - int(self.n_past[row])
            consumed = 0
            for j in range(min(self.chunk, avail)):
                tok = int(toks[j, row])
                consumed = j + 1
                self._emit(req, tok)
                if req.done:
                    break
            # position advances only past tokens actually consumed: the
            # forward passes behind them (consumed steps) are committed
            self.n_past[row] += consumed
            self.last_tok[row] = req.out[-1]
            if avail <= self.chunk and consumed == avail:
                req.done = True
            if req.done:
                self._free(row)
