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

Sampler coverage per request: the FULL cascade, per row, on device —
greedy/temp/top-k (<= the batcher's static cap)/top-p/tail-free/typical,
repetition/frequency/presence penalties over a fixed recent-token window
(device ring buffers, rebuilt from each row's history at chunk boundaries),
sparse per-row logit bias (<= 64 entries), and mirostat v1/v2 with per-row
adaptive mu carried across chunks. Exactness bounds (ops/sampling_device):
tfs/typical/top-p are exact for per-request top_k <= the batcher cap;
mirostat is exact while its dynamic keep-set stays within the 512-candidate
device slice.
"""

from __future__ import annotations

import itertools
from collections import deque
from dataclasses import dataclass, field

import numpy as np
import jax

from ggllm_tpu.engine.engine import DECODE_CHUNK, FalconEngine

RING_LEN = 64  # penalty window (repeat_last_n default, falcon_common.h)


@dataclass
class Request:
    prompt_ids: list
    n_predict: int = 128
    temp: float = 0.0
    top_p: float = 1.0
    top_k: int = 0  # 0 = the batcher's cap
    repeat_penalty: float = 1.0
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    tfs_z: float = 1.0
    typical_p: float = 1.0
    mirostat: int = 0  # 0 off, 1/2 = v1/v2 (per-row adaptive mu on device)
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    logit_bias: dict = field(default_factory=dict)  # token id -> bias
    stop_ids: frozenset = frozenset()
    # ops.grammar.GrammarSampler (per-request state); while any grammar row
    # is active the batch decodes in 1-step dispatches with per-row validity
    # masks uploaded as packed bits (grammar masks are per-state, so no
    # multi-step chunking across rows)
    grammar_sampler: object = None
    # optional per-token callback(token_id); returning False stops the row
    stream: object = None

    # invoked once when the request leaves its row (finished); lets callers
    # block on completion without polling
    on_done: object = None

    # filled by the batcher
    rid: int = -1
    out: list = field(default_factory=list)
    done: bool = False
    row: int = -1
    mu: float = 0.0  # mirostat state (2*tau at admit, device-updated)
    us: list = field(default_factory=list)  # uniform draws consumed (replay)


class ContinuousBatcher:
    def __init__(self, engine: FalconEngine, chunk: int | None = None,
                 top_k: int = 64, seed: int = 0,
                 prefill_chunk: int = 256):
        self.eng = engine
        self.B = engine.batch
        self.chunk = min(chunk or engine.cfg.decode_chunk,
                         max(DECODE_CHUNK, engine.cfg.decode_chunk))
        self.top_k = top_k
        # admission prefill interleaving: at most prefill_chunk prompt
        # tokens per row are evaluated between decode chunks, so an
        # admission stalls in-flight streams by ONE capped prefill forward
        # instead of the whole prompt (VERDICT r4 #8). Rows mid-prefill
        # occupy their slot but are skipped by decode consumption; the
        # decode loop's junk writes beyond their n_past are overwritten by
        # the next prefill chunk (stale-cache invariant).
        self.prefill_chunk = max(1, int(prefill_chunk))
        self.pending: dict[int, tuple] = {}   # row -> (req, tokens done)
        self.prefilling: set[int] = set()
        self.queue: deque[Request] = deque()
        self.rows: list[Request | None] = [None] * self.B
        self.n_past = np.full(self.B, self._park, dtype=np.int32)
        self.last_tok = np.zeros(self.B, dtype=np.int32)
        self.temp = np.zeros(self.B, dtype=np.float32)
        self.top_p = np.ones(self.B, dtype=np.float32)
        self.top_k_rows = np.full(self.B, top_k, dtype=np.int32)
        self.rp = np.ones(self.B, dtype=np.float32)
        self.fp = np.zeros(self.B, dtype=np.float32)
        self.pp = np.zeros(self.B, dtype=np.float32)
        self.tfs = np.ones(self.B, dtype=np.float32)
        self.typ = np.ones(self.B, dtype=np.float32)
        self.mmode = np.zeros(self.B, dtype=np.int32)
        self.mtau = np.full(self.B, 5.0, dtype=np.float32)
        self.meta = np.full(self.B, 0.1, dtype=np.float32)
        self.mu = np.full(self.B, 10.0, dtype=np.float32)
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
        """Admit queued requests into free rows, advance admissions by one
        capped prefill chunk, then run one decode chunk for live rows."""
        self._admit()
        self._prefill_step()
        if not [r for row, r in enumerate(self.rows)
                if r is not None and row not in self.prefilling]:
            return
        self._decode_chunk()

    def run(self):
        """Drain: step until every submitted request finished."""
        while self.queue or self.active:
            self.step()

    # ------------------------------------------------------------- internals

    def _admit(self):
        # pair queued requests with free rows; their prompts are evaluated
        # incrementally by _prefill_step (capped chunks interleaved with
        # decode) — batched across admissions, since each forward costs a
        # full B×bucket weight stream whether it serves one row or all
        for row in range(self.B):
            if self.rows[row] is not None or not self.queue:
                continue
            req = self.queue.popleft()
            n = len(req.prompt_ids)
            if n + req.n_predict > self.eng.cfg.n_ctx:
                # truncate head, keep the most recent context
                keep = self.eng.cfg.n_ctx - req.n_predict
                req.prompt_ids = req.prompt_ids[-max(keep, 1):]
            # row-local prefill: fresh row starts at position 0
            self.n_past[row] = 0
            req.row = row
            self.rows[row] = req
            self.pending[row] = (req, 0)
            self.prefilling.add(row)

    def _prefill_step(self):
        """Advance every mid-prefill row by at most prefill_chunk tokens in
        one batched forward; rows whose prompt completes sample their first
        token and go live."""
        if not self.pending:
            return
        cap = self.prefill_chunk
        rows, slices, finishing = [], [], set()
        for row, (req, done) in self.pending.items():
            sl = req.prompt_ids[done: done + cap]
            rows.append(row)
            slices.append(sl)
            if done + len(sl) >= len(req.prompt_ids):
                finishing.add(row)
        row_logits = self.eng.prefill_rows(rows, slices, self.n_past,
                                           fetch_rows=finishing)
        for row, sl in zip(rows, slices):
            req, done = self.pending[row]
            self.n_past[row] += len(sl)
            if row not in finishing:
                self.pending[row] = (req, done + len(sl))
                continue
            del self.pending[row]
            self.prefilling.discard(row)
            self._activate(row, req, row_logits[row])

    def _activate(self, row: int, req: Request, logits: np.ndarray):
        tok = self._sample_first(logits, req)
        self._emit(req, tok)
        if req.done:
            self._free(row)
            return
        self.last_tok[row] = tok
        self.temp[row] = req.temp
        self.top_p[row] = req.top_p
        self.top_k_rows[row] = min(req.top_k, self.top_k) if req.top_k > 0 \
            else self.top_k
        self.rp[row] = req.repeat_penalty
        self.fp[row] = req.frequency_penalty
        self.pp[row] = req.presence_penalty
        self.tfs[row] = req.tfs_z
        self.typ[row] = req.typical_p
        self.mmode[row] = req.mirostat
        self.mtau[row] = req.mirostat_tau
        self.meta[row] = req.mirostat_eta
        self.mu[row] = req.mu

    def _sample_first(self, logits: np.ndarray, req: Request) -> int:
        # first token after prefill: the FULL host cascade (the reference
        # path), with the draw recorded on req.us so tests can replay it;
        # mirostat mu flows into the device loop via req.mu
        from ggllm_tpu.ops import sampling

        params = sampling.SamplerParams(
            temp=req.temp,
            top_k=min(req.top_k, self.top_k) if req.top_k > 0 else self.top_k,
            top_p=req.top_p, tfs_z=req.tfs_z, typical_p=req.typical_p,
            repeat_penalty=req.repeat_penalty, repeat_last_n=RING_LEN,
            frequency_penalty=req.frequency_penalty,
            presence_penalty=req.presence_penalty,
            mirostat=req.mirostat, mirostat_tau=req.mirostat_tau,
            mirostat_eta=req.mirostat_eta, logit_bias=dict(req.logit_bias))
        self.rng, sub = jax.random.split(self.rng)
        base = np.random.default_rng(int(np.asarray(sub)[0]))

        class _Rec:
            def random(_self):
                u = base.random()
                req.us.append(float(u))
                return u

        state = sampling.SamplerState(rng=_Rec(),
                                      mu=2.0 * req.mirostat_tau)
        if req.grammar_sampler is not None:
            logits = req.grammar_sampler.filter_logits(logits)
        tok = sampling.sample(logits, req.prompt_ids, params, state,
                              n_ctx=self.eng.cfg.n_ctx)
        if req.grammar_sampler is not None:
            req.grammar_sampler.accept(tok)
        req.mu = state.mu
        return tok

    def _emit(self, req: Request, tok: int):
        req.out.append(tok)
        if req.stream is not None:
            if req.stream(tok) is False:
                req.done = True
        if tok in req.stop_ids or len(req.out) >= req.n_predict:
            req.done = True

    def _free(self, row: int):
        req = self.rows[row]
        if req is not None and req.on_done is not None:
            req.on_done()
        self.rows[row] = None
        self.pending.pop(row, None)
        self.prefilling.discard(row)
        self.n_past[row] = self._park
        self.temp[row] = 0.0
        self.top_p[row] = 1.0
        self.top_k_rows[row] = self.top_k
        self.rp[row] = 1.0
        self.fp[row] = 0.0
        self.pp[row] = 0.0
        self.tfs[row] = 1.0
        self.typ[row] = 1.0
        self.mmode[row] = 0
        self.mtau[row] = 5.0
        self.meta[row] = 0.1
        self.mu[row] = 10.0
        self.last_tok[row] = 0

    def _rings(self) -> tuple[np.ndarray, np.ndarray]:
        """Per-row penalty windows: the last RING_LEN tokens of each live
        row's history (prompt + generated, INCLUDING the pending last token),
        oldest first. Rebuilt each chunk so mid-chunk stops never leave
        phantom tokens in the window."""
        rings = np.full((self.B, RING_LEN), self.eng.hp.n_vocab, np.int32)
        fill = np.zeros(self.B, np.int32)
        for row, req in enumerate(self.rows):
            if req is None:
                continue
            hist = (req.prompt_ids + req.out)[-RING_LEN:]
            rings[row, : len(hist)] = hist
            fill[row] = len(hist)
        return rings, fill

    def _bias_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        """Per-row sparse logit bias as fixed-width (B, NB) arrays (empty
        slots = n_vocab, scatter-dropped). NB snaps to {0, 8, 64} so the jit
        cache sees few distinct widths; entries beyond 64 are dropped."""
        n_max = max((len(r.logit_bias) for r in self.rows if r is not None),
                    default=0)
        NB = 0 if n_max == 0 else (8 if n_max <= 8 else 64)
        V = self.eng.hp.n_vocab
        ids = np.full((self.B, NB), V, np.int32)
        vals = np.zeros((self.B, NB), np.float32)
        for row, req in enumerate(self.rows):
            if req is None:
                continue
            for i, (t, b) in enumerate(sorted(req.logit_bias.items())[:NB]):
                if 0 <= int(t) < V:
                    ids[row, i] = int(t)
                    vals[row, i] = float(b)
        return ids, vals

    def _decode_chunk(self):
        # rows with a full context end now (no tokens left to produce)
        for row, req in enumerate(self.rows):
            if req is not None and row not in self.prefilling \
                    and self.n_past[row] >= self.eng.cfg.n_ctx:
                req.done = True
                self._free(row)
        if not self.active:
            return
        rings, fill = self._rings()
        bias_ids, bias_vals = self._bias_arrays()
        mask = None
        steps = self.chunk
        if any(r is not None and r.grammar_sampler is not None
               for r in self.rows):
            steps = 1  # masks are per-grammar-state: one step per dispatch
            nb = (self.eng.hp.n_vocab + 7) // 8
            mask = np.full((self.B, nb), 0xFF, np.uint8)  # default: all valid
            for row, req in enumerate(self.rows):
                if req is not None and req.grammar_sampler is not None:
                    mask[row] = req.grammar_sampler.valid_bits()
        res = self.eng.decode_rows(
            self.last_tok, self.n_past, steps, self.temp, self.top_p,
            top_k=self.top_k, rng_key=self.rng, active_rows=len(self.active),
            top_k_rows=self.top_k_rows, repeat_penalty=self.rp,
            frequency_penalty=self.fp, presence_penalty=self.pp,
            rings=rings, ring_fill=fill,
            tfs_z=self.tfs, typical_p=self.typ,
            bias_ids=bias_ids, bias_vals=bias_vals,
            miro_mode=self.mmode, miro_tau=self.mtau, miro_eta=self.meta,
            miro_mu=self.mu, mask_bits=mask)
        if len(res) == 4:
            toks, self.rng, new_mu, us = res
            self.mu = np.array(new_mu, np.float32)  # writable copy
        else:
            toks, self.rng = res
            us = self.eng.last_us
        for row, req in enumerate(self.rows):
            if req is None or row in self.prefilling:
                continue  # mid-prefill rows' decode outputs are junk
            if req.mirostat:
                req.mu = float(self.mu[row])
            # a row near the context limit still consumes the in-context
            # tokens from this chunk (KV writes past n_ctx land in the
            # scratch region and are ignored); positions beyond avail are
            # out-of-context and discarded, matching single-stream generate's
            # chunk clamp (engine.py)
            avail = self.eng.cfg.n_ctx - int(self.n_past[row])
            consumed = 0
            for j in range(min(steps, avail)):
                tok = int(toks[j, row])
                consumed = j + 1
                if req.temp > 0:  # the host cascade draws one u per token
                    req.us.append(float(us[j, row]))
                if req.grammar_sampler is not None:
                    req.grammar_sampler.accept(tok)  # mask guarantees valid
                self._emit(req, tok)
                if req.done:
                    break
            # position advances only past tokens actually consumed: the
            # forward passes behind them (consumed steps) are committed
            self.n_past[row] += consumed
            self.last_tok[row] = req.out[-1]
            if avail <= steps and consumed == avail:
                req.done = True
            if req.done:
                self._free(row)
