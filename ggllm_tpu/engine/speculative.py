"""Speculative decoding: a draft model proposes k tokens, the target model
verifies them in ONE batched forward, and rejection sampling keeps the
output distribution EXACTLY the target's sampling distribution
(Leviathan et al. 2023 / Chen et al. 2023 accept/resample identity).

This is a capability the reference (cmp-nct/ggllm.cpp) does not have; on TPU
it is particularly profitable because the verify step rides the prefill
bucket path (engine.eval_tokens over k+1 positions), whose cost is dominated
by the SAME weight stream as a single decode step — so each round costs
~2 decode-steps of target time (draft + verify) and commits 1..k+1 tokens.

Design (host-orchestrated, engine-agnostic):
  * both engines (target + draft) share vocab and tokenizer; the draft is a
    smaller model, a lower-bit quantization, or a depth-truncated view of
    the target (`truncate_params`);
  * draft proposals and the accept/resample math run on host over full-vocab
    distributions from ops/sampling.cascade_probs — the SAME cascade
    (penalties, top-k/p, temperature) is applied to both p and q, so the
    committed stream is distributed exactly as target-only sampling;
  * KV bookkeeping uses engine.rollback(): stale cache entries past n_past
    are masked by construction, so rejected draft tokens cost nothing.

Greedy (temp<=0) degenerates to: accept while draft argmax == target
argmax — output is bit-identical to target-only greedy decode
(test_speculative.py enforces this with draft != target).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ggllm_tpu.ops import sampling


@dataclass
class SpecStats:
    """Per-generation acceptance accounting."""

    n_rounds: int = 0
    n_drafted: int = 0
    n_accepted: int = 0  # drafted tokens that survived verification
    n_emitted: int = 0   # total committed tokens (incl. resample/bonus)

    @property
    def acceptance(self) -> float:
        return self.n_accepted / max(1, self.n_drafted)

    def report(self) -> str:
        return (f"speculative: {self.n_emitted} tokens in {self.n_rounds} "
                f"rounds ({self.n_emitted / max(1, self.n_rounds):.2f}/round), "
                f"draft acceptance {100 * self.acceptance:.1f}%")


def truncate_params(params, n_layers: int):
    """Depth-truncated view of a param tree: the first n_layers transformer
    blocks with the embedding/final-norm/lm_head shared (no copy — the views
    alias the same device buffers). A cheap self-drafting baseline when no
    separate small model is on disk."""
    import jax

    out = dict(params)
    layers = params["layers"]
    if isinstance(layers, (list, tuple)):  # kernel layout: unstacked list
        out["layers"] = layers[:n_layers]
    else:  # scan layout: pytree of layer-stacked arrays
        out["layers"] = jax.tree.map(lambda a: a[:n_layers], layers)
    return out


def spec_accept(p: np.ndarray, q: np.ndarray, x: int,
                rng: np.random.Generator, greedy: bool) -> bool:
    """Accept draft token x ~ q against target dist p: w.p. min(1, p[x]/q[x])
    (greedy: iff argmax p == x)."""
    if greedy:
        return int(np.argmax(p)) == x
    return rng.random() < min(1.0, float(p[x]) / max(float(q[x]), 1e-20))


def spec_resample(p: np.ndarray, q: np.ndarray,
                  rng: np.random.Generator, greedy: bool) -> int:
    """Corrected draw after rejecting x ~ q: sample from norm(max(p - q, 0)).
    Together with spec_accept this makes the committed token exactly
    p-distributed regardless of q (the rejection-sampling identity)."""
    if greedy:
        return int(np.argmax(p))
    resid = np.maximum(p - q, 0.0)
    tot = float(resid.sum())
    dist = resid / tot if tot > 0 else p / max(float(p.sum()), 1e-20)
    return int(rng.choice(dist.size, p=dist / dist.sum()))


def _draw(p: np.ndarray, rng: np.random.Generator, greedy: bool) -> int:
    return (int(np.argmax(p)) if greedy
            else int(rng.choice(p.size, p=p / p.sum())))


class SpeculativeDecoder:
    """Wraps a target and a draft engine; generates from the target's
    sampling distribution at > 1 token per target forward.

    Both engines must be at the same n_past with identical committed
    history. `k` is the draft length per round (typical sweet spot 4-8:
    acceptance decays geometrically, verify cost grows sub-linearly)."""

    def __init__(self, target, draft, k: int = 6):
        assert target.hp.n_vocab == draft.hp.n_vocab, "vocab mismatch"
        assert k >= 1
        self.target = target
        self.draft = draft
        self.k = k

    def generate(self, prompt_ids, n_predict: int,
                 sampler: sampling.SamplerParams | None = None,
                 state: sampling.SamplerState | None = None,
                 stop_ids: set | None = None,
                 on_token=None) -> list[int]:
        """Generate up to n_predict tokens after prompt_ids. Returns the
        committed tokens (committed = evaluated by the target; the trailing
        pending token is included). Mirrors engine.generate semantics for
        greedy/cascade samplers; mirostat is rejected (see cascade_probs)."""
        sampler = sampler or sampling.SamplerParams(temp=0.0)
        state = state or sampling.SamplerState.init(sampler)
        n_ctx = self.target.cfg.n_ctx
        prompt_ids = [int(t) for t in np.asarray(prompt_ids).reshape(-1)]
        assert prompt_ids, "speculative generation needs a prompt"
        stats = self.stats = SpecStats()

        # prefill both models on the prompt minus its last token; that last
        # token is the first pending token t0
        history = list(prompt_ids)
        t0 = history[-1]
        if len(prompt_ids) > 1:
            self.target.eval_tokens(prompt_ids[:-1])
            self.draft.eval_tokens(prompt_ids[:-1])
        out: list[int] = []
        while len(out) < n_predict:
            budget = n_predict - len(out)
            k = min(self.k, budget, n_ctx - self.target.n_past - 2)
            if k < 1:
                break
            emitted, t0 = self._round(t0, history, sampler, state, k, stats)
            for t in emitted:
                out.append(t)
                history.append(t)
                if on_token is not None and on_token(t) is False:
                    return out
                if stop_ids and t in stop_ids:
                    return out
                if len(out) >= n_predict:
                    break
        return out

    def _round(self, t0: int, history: list[int],
               sampler: sampling.SamplerParams,
               state: sampling.SamplerState, k: int,
               stats: SpecStats) -> tuple[list[int], int]:
        """One draft/verify/accept round. Both engines enter at the same
        n_past with t0 pending (unevaluated); they leave re-synchronized
        with the returned pending token unevaluated. Returns (committed
        tokens: x_1..x_{i-1} + corrected/bonus, new pending token)."""
        n0 = self.target.n_past
        assert self.draft.n_past == n0, (self.draft.n_past, n0)
        n_ctx = self.target.cfg.n_ctx

        # --- draft k tokens autoregressively, recording each proposal dist
        greedy = sampler.temp <= 0
        xs: list[int] = []
        qs: list[np.ndarray] = []
        hist_d = list(history)
        x = t0
        for _ in range(k):
            logits = self.draft.eval_tokens([x])
            q = sampling.cascade_probs(logits, hist_d, sampler, n_ctx)
            x = _draw(q, state.rng, greedy)
            xs.append(x)
            qs.append(q)
            hist_d.append(x)
        # draft is now at n0+k having evaluated [t0, x_1..x_{k-1}]

        # --- verify: ONE target forward over [t0, x_1..x_k] -> k+1 rows
        rows = self.target.eval_tokens([t0] + xs, logits_all=True)
        stats.n_rounds += 1
        stats.n_drafted += k

        # --- accept/resample (exact target-distribution identity)
        hist_t = list(history)
        emitted: list[int] = []
        n_acc = 0
        pending = None
        for i in range(k):
            p = sampling.cascade_probs(rows[i], hist_t, sampler, n_ctx)
            if spec_accept(p, qs[i], xs[i], state.rng, greedy):
                emitted.append(xs[i])
                hist_t.append(xs[i])
                n_acc += 1
                continue
            pending = spec_resample(p, qs[i], state.rng, greedy)
            break
        stats.n_accepted += n_acc

        if pending is None:
            # all k accepted: bonus token from the target's k-th row
            p = sampling.cascade_probs(rows[k], hist_t, sampler, n_ctx)
            pending = _draw(p, state.rng, greedy)
            # draft only evaluated through x_{k-1}: catch it up on x_k so
            # both engines re-enter the next round aligned at n0+k+1
            self.draft.eval_tokens([xs[k - 1]])
        else:
            # roll both engines back to the last verified position; stale
            # KV beyond n_past is masked, so this is free
            self.target.rollback(n0 + n_acc + 1)
            self.draft.rollback(n0 + n_acc + 1)
        # the final emitted token is the new pending t0 (committed to the
        # stream but not yet evaluated by either engine)
        emitted.append(pending)
        stats.n_emitted += len(emitted)
        return emitted, pending
