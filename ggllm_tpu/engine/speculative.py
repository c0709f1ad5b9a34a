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
    blocks with the embedding/final-norm/lm_head shared. In the unstacked
    kernel layout the list slice aliases the same device buffers (no extra
    HBM); in the scan layout the `a[:n_layers]` slices materialize device
    copies of the kept layers. A cheap self-drafting baseline when no
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

    def __init__(self, target, draft, k: int = 6,
                 rounds_per_dispatch: int = 4):
        assert target.hp.n_vocab == draft.hp.n_vocab, "vocab mismatch"
        assert k >= 1 and rounds_per_dispatch >= 1
        self.target = target
        self.draft = draft
        self.k = k
        self.rounds = rounds_per_dispatch
        self._round_jit: dict = {}  # static sampler spec -> jitted block

    # ------------------------------------------------- fused device rounds

    def _fused_ok(self, sampler) -> bool:
        """The single-dispatch device round covers greedy AND the stochastic
        truncation cascade (temp/top-k/top-p/tfs/typical) with no
        penalties/bias; mirostat and penalty configs take the host path.
        Host-orchestrated rounds pay 2(k+1) device round-trips — through a
        high-latency device link the fused round is the difference between
        speculative decoding losing and winning (measured: 455 ms vs ~25 ms
        per round at 7B). Stochastic rounds run the device sampler on BOTH
        draft and target rows with on-device accept/resample (exact
        rejection-sampling identity; truncations exact while the keep-set
        stays within the top_k <= 1024 slice, as in batched serving)."""
        if not (sampler.repeat_penalty == 1.0
                and sampler.frequency_penalty == 0.0
                and sampler.presence_penalty == 0.0
                and not sampler.logit_bias
                and sampler.mirostat == 0
                and self.target.mesh is None and self.draft.mesh is None
                and self.target.batch == 1 and self.draft.batch == 1):
            return False
        if sampler.temp <= 0:
            return True
        # stochastic: the device cascade needs a bounded descending slice
        return 0 < sampler.top_k <= 1024

    @staticmethod
    def _sampler_spec(sampler) -> tuple:
        """Static (hashable) spec of the cascade for the jit cache."""
        if sampler.temp <= 0:
            return ("greedy",)
        return ("stoch", float(sampler.temp), float(sampler.top_p),
                int(sampler.top_k), float(sampler.tfs_z),
                float(sampler.typical_p))

    def _fused_round(self, spec: tuple):
        """R jitted speculative rounds per dispatch. Each round: k+1 draft
        steps (chunk-deferred KV, the decode-loop scheme) + ONE target
        verify forward over k+1 positions + accept/commit; a lax.scan
        chains R rounds so the per-dispatch host/tunnel overhead amortizes
        (measured 34 -> ~21 ms/round at R=4, 7B geometry).

        spec = ("greedy",): accept is the longest argmax-match prefix —
        bit-identical to target-only greedy decode. spec = ("stoch", temp,
        top_p, top_k, tfs_z, typical_p): both models' logits go through the
        device cascade (ops/sampling_device.cascade_mask_probs), the draft
        draws by inverse-CDF, and accept/resample run the Leviathan
        identity on device — accept x~q w.p. min(1, p(x)/q(x)), else draw
        from norm(max(p-q, 0)) — so the committed stream is distributed
        exactly as target-only cascade sampling. Consumed uniforms are
        returned per round ((R, 2k+2): k+1 draft, k accept, 1 resample) so
        tests can replay the math on host.

        The draft runs k+1 steps (not k) so its cache always covers the
        committed prefix even when all k drafts are accepted; the extra
        emission is discarded. Rejected positions leave stale cache entries
        beyond n_past, which attention masks by construction."""
        if spec in self._round_jit:
            return self._round_jit[spec]
        import jax
        import jax.numpy as jnp

        from ggllm_tpu.models.falcon import merged_cache_view
        from ggllm_tpu.ops import kvcache, sampling_device

        tgt, dr, k = self.target, self.draft, self.k
        R = self.rounds
        t_fwd, t_st, inv_t = tgt._forward, tgt.st, tgt.inv_freq
        d_fwd, d_st, inv_d = dr._forward, dr.st, dr.inv_freq
        t_dtype, d_dtype = tgt.compute_dtype, dr.compute_dtype
        d_kv_dtype = dr.cfg.kv_dtype
        B = 1
        V = tgt.hp.n_vocab
        greedy = spec[0] == "greedy"
        if not greedy:
            _, temp, top_p, top_k, tfs_z, typ_p = spec
            K = min(max(top_k, 1), V)
            t_a = jnp.full((1,), temp, jnp.float32)
            p_a = jnp.full((1,), top_p, jnp.float32)
            k_a = jnp.full((1,), K, jnp.int32)
            tfs_a = jnp.full((1,), tfs_z, jnp.float32)
            typ_a = jnp.full((1,), typ_p, jnp.float32)

        def cascade_full(lg):
            """(n, V) logits -> (n, V) post-cascade probabilities."""
            n = lg.shape[0]
            vals, idx = jax.lax.top_k(lg, K)
            probs, _ = sampling_device.cascade_mask_probs(
                vals, jnp.broadcast_to(t_a, (n,)), jnp.broadcast_to(p_a, (n,)),
                jnp.broadcast_to(k_a, (n,)), jnp.broadcast_to(tfs_a, (n,)),
                jnp.broadcast_to(typ_a, (n,)))
            rows_i = jnp.arange(n, dtype=jnp.int32)[:, None]
            return jnp.zeros((n, V), jnp.float32).at[rows_i, idx].set(probs)

        def cdf_draw(dist, u):
            """Inverse-CDF over a (V,) dist in token-id order (_draw
            semantics: first index whose cumulative exceeds u*total,
            clamped to the last positive entry)."""
            cum = jnp.cumsum(dist)
            sel = cum > u * cum[-1]
            last = (V - 1) - jnp.argmax((dist > 0)[::-1])
            return jnp.where(jnp.any(sel), jnp.argmax(sel), last).astype(
                jnp.int32)

        def one_round(params_t, params_d, tok0, kv_t, kv_d, n_past, key):
            kvd = kv_d[0] if isinstance(kv_d, tuple) else kv_d
            Ld, _, _, _, KVd, Dd = kvd.shape
            pdtype = d_dtype if d_kv_dtype == "int8" else kvd.dtype
            pending0 = jnp.zeros((Ld, 2, B, k + 1, KVd, Dd), pdtype)
            kvm = merged_cache_view(kv_d, d_st)

            def body(carry, j):
                tok, pending, key = carry
                toks_b = jnp.full((B, 1), tok, jnp.int32)
                logits, kv_new = d_fwd(
                    params_d, toks_b, kv_d, n_past + j, inv_d, d_st,
                    logits_all=False, compute_dtype=d_dtype, last_pos=0,
                    unroll=True, pending=pending, n_pend=j, kv_merged=kvm)
                lg = logits[0, 0].astype(jnp.float32)
                if greedy:
                    nxt = jnp.argmax(lg).astype(jnp.int32)
                    q = jnp.zeros((0,), jnp.float32)  # unused
                    u = jnp.float32(0)
                else:
                    key, sub = jax.random.split(key)
                    u = jax.random.uniform(sub, ())
                    q = cascade_full(lg[None])[0]
                    nxt = cdf_draw(q, u)
                pending = jax.lax.dynamic_update_slice(
                    pending, kv_new.astype(pdtype), (0, 0, 0, j, 0, 0))
                return (nxt, pending, key), (nxt, q, u)

            (_, pending, key), (drafted, qs, u_draft) = jax.lax.scan(
                body, (tok0, pending0, key),
                jnp.arange(k + 1, dtype=jnp.int32))
            kv_d2 = kvcache.write_all_layers(
                kv_d, pending, jnp.broadcast_to(
                    jnp.asarray(n_past, jnp.int32).reshape(-1), (B,)))
            xs = drafted[:k]

            seq = jnp.concatenate([tok0[None], xs]).astype(jnp.int32)
            # pad the verify chunk to a prefill bucket (the flash kernel
            # needs sublane-aligned S; pad positions write KV scratch past
            # n_ctx exactly like engine._eval_chunk's padded prefill)
            from ggllm_tpu.engine.engine import _bucket
            P = _bucket(k + 1, 512)
            seq_p = jnp.pad(seq, (0, P - (k + 1)))
            logits, kv_t2 = t_fwd(
                params_t, seq_p[None, :], kv_t, n_past, inv_t, t_st,
                logits_all=True, compute_dtype=t_dtype, last_pos=k)
            rows = logits[0, : k + 1].astype(jnp.float32)  # (k+1, V)
            idxr = jnp.arange(k + 1)
            xs_ext = jnp.concatenate([xs, xs[:1]])
            if greedy:
                pargmax = jnp.argmax(rows, axis=-1).astype(jnp.int32)
                # greedy accept: longest prefix where draft == target
                # argmax, then the target's own token at the first
                # divergence (or the bonus token after k accepts)
                ok = jnp.cumprod((pargmax[:k] == xs).astype(jnp.int32))
                n_acc = ok.sum()
                final = pargmax[n_acc]
                us = jnp.zeros((2 * k + 2,), jnp.float32)
            else:
                pd = cascade_full(rows)  # (k+1, V) target cascade dists
                key, sub = jax.random.split(key)
                u_acc = jax.random.uniform(sub, (k,))
                key, sub = jax.random.split(key)
                u_fin = jax.random.uniform(sub, ())
                ar = jnp.arange(k)
                q_x = qs[ar, xs]
                p_x = pd[ar, xs]
                # accept w.p. min(1, p/q): u < p/q  <=>  u*q < p (q_x > 0
                # by construction: x was drawn from q's kept set)
                ok = jnp.cumprod((u_acc * q_x < p_x).astype(jnp.int32))
                n_acc = ok.sum()
                # resample from norm(max(p - q, 0)) at the reject position;
                # after k accepts the bonus draw is from p alone (q := 0)
                p_sel = pd[n_acc]
                q_sel = qs[n_acc] * (n_acc < k)
                resid = jnp.maximum(p_sel - q_sel, 0.0)
                tot = resid.sum()
                dist = jnp.where(tot > 0, resid / jnp.maximum(tot, 1e-38),
                                 p_sel)
                final = cdf_draw(dist, u_fin)
                us = jnp.concatenate([u_draft, u_acc, u_fin[None]])
            toks_out = jnp.where(idxr < n_acc, xs_ext, final)
            return (toks_out, n_acc, us, kv_t2, kv_d2, n_past + n_acc + 1,
                    final, key)

        def block(params_t, params_d, tok0, kv_t, kv_d, n_past, key):
            def body(carry, _):
                tok, kv_t, kv_d, n_past, key = carry
                toks, n_acc, us, kv_t, kv_d, n_past, tok, key = one_round(
                    params_t, params_d, tok, kv_t, kv_d, n_past, key)
                return (tok, kv_t, kv_d, n_past, key), (toks, n_acc, us)

            (tok, kv_t, kv_d, n_past, key), (toks_r, n_acc_r, us_r) = \
                jax.lax.scan(body, (tok0, kv_t, kv_d, n_past, key), length=R)
            return toks_r, n_acc_r, us_r, kv_t, kv_d, n_past, tok, key

        self._round_jit[spec] = jax.jit(block, donate_argnums=(3, 4))
        return self._round_jit[spec]

    # --------------------------------------- batched fused rounds (B rows)

    def _fused_round_rows(self):
        """Greedy fused speculative rounds VECTORIZED over B independent
        rows at per-row positions (the continuous-batching geometry): every
        row drafts k+1 tokens, one batched verify forward scores all rows'
        chunks at their own n_past, and the longest argmax-match prefix
        commits per row. R rounds chain in a lax.scan. Rows advance
        raggedly (n_acc differs per row); rejected positions leave stale
        per-row cache entries beyond that row's n_past, which attention
        masks by construction — the same invariant continuous batching
        relies on."""
        key = ("rows",)
        if key in self._round_jit:
            return self._round_jit[key]
        import jax
        import jax.numpy as jnp

        from ggllm_tpu.models.falcon import merged_cache_view
        from ggllm_tpu.ops import kvcache

        tgt, dr, k = self.target, self.draft, self.k
        R = self.rounds
        t_fwd, t_st, inv_t = tgt._forward, tgt.st, tgt.inv_freq
        d_fwd, d_st, inv_d = dr._forward, dr.st, dr.inv_freq
        t_dtype, d_dtype = tgt.compute_dtype, dr.compute_dtype
        d_kv_dtype = dr.cfg.kv_dtype
        B = tgt.batch

        def one_round(params_t, params_d, toks0, kv_t, kv_d, npv):
            kvd = kv_d[0] if isinstance(kv_d, tuple) else kv_d
            Ld, _, _, _, KVd, Dd = kvd.shape
            pdtype = d_dtype if d_kv_dtype == "int8" else kvd.dtype
            pending0 = jnp.zeros((Ld, 2, B, k + 1, KVd, Dd), pdtype)
            kvm = merged_cache_view(kv_d, d_st)

            def body(carry, j):
                toks, pending = carry
                logits, kv_new = d_fwd(
                    params_d, toks[:, None], kv_d, npv + j, inv_d, d_st,
                    logits_all=False, compute_dtype=d_dtype,
                    last_pos=jnp.zeros(B, jnp.int32),
                    unroll=True, pending=pending, n_pend=j, kv_merged=kvm)
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                pending = jax.lax.dynamic_update_slice(
                    pending, kv_new.astype(pdtype), (0, 0, 0, j, 0, 0))
                return (nxt, pending), nxt

            (_, pending), drafted = jax.lax.scan(
                body, (toks0, pending0), jnp.arange(k + 1, dtype=jnp.int32))
            kv_d2 = kvcache.write_all_layers(kv_d, pending, npv)
            xs = drafted[:k].T  # (B, k)

            seq = jnp.concatenate([toks0[:, None], xs], axis=1)  # (B, k+1)
            from ggllm_tpu.engine.engine import _bucket
            P = _bucket(k + 1, 512)
            seq_p = jnp.pad(seq, ((0, 0), (0, P - (k + 1))))
            logits, kv_t2 = t_fwd(
                params_t, seq_p, kv_t, npv, inv_t, t_st,
                logits_all=True, compute_dtype=t_dtype, last_pos=k)
            rows = logits[:, : k + 1].astype(jnp.float32)  # (B, k+1, V)
            pargmax = jnp.argmax(rows, axis=-1).astype(jnp.int32)
            ok = jnp.cumprod((pargmax[:, :k] == xs).astype(jnp.int32), axis=1)
            n_acc = ok.sum(axis=1)  # (B,)
            final = jnp.take_along_axis(
                pargmax, n_acc[:, None], axis=1)[:, 0]
            idx = jnp.arange(k + 1, dtype=jnp.int32)[None, :]
            xs_ext = jnp.concatenate([xs, xs[:, :1]], axis=1)
            toks_out = jnp.where(idx < n_acc[:, None], xs_ext,
                                 final[:, None])
            return toks_out, n_acc, kv_t2, kv_d2, npv + n_acc + 1, final

        def block(params_t, params_d, toks0, kv_t, kv_d, npv):
            def body(carry, _):
                toks, kv_t, kv_d, npv = carry
                out, n_acc, kv_t, kv_d, npv, toks = one_round(
                    params_t, params_d, toks, kv_t, kv_d, npv)
                return (toks, kv_t, kv_d, npv), (out, n_acc)

            (toks, kv_t, kv_d, npv), (out_r, acc_r) = jax.lax.scan(
                body, (toks0, kv_t, kv_d, npv), length=R)
            return out_r, acc_r, kv_t, kv_d, npv, toks

        self._round_jit[key] = jax.jit(block, donate_argnums=(3, 4))
        return self._round_jit[key]

    def generate_rows(self, prompts, n_predict: int,
                      stop_ids: set | None = None) -> list[list[int]]:
        """Batch-generate GREEDILY from B prompts at once through fused
        speculative rounds (offline batch inference: every row drafts and
        verifies in the same device programs; output per row is bit-
        identical to single-stream greedy decode of that prompt,
        test-enforced). Both engines must be built with batch_size == B,
        single-device, and enter fresh (per-row positions start at 0)."""
        import jax
        import jax.numpy as jnp

        tgt, dr, k, R = self.target, self.draft, self.k, self.rounds
        B = tgt.batch
        assert dr.batch == B and len(prompts) == B, "one prompt per row"
        assert tgt.mesh is None and dr.mesh is None
        prompts = [[int(t) for t in np.asarray(p).reshape(-1)]
                   for p in prompts]
        assert all(prompts), "every row needs a prompt"
        n_ctx = tgt.cfg.n_ctx
        stats = self.stats = SpecStats()

        npv = np.zeros(B, np.int32)
        tgt.prefill_rows(list(range(B)), [p[:-1] for p in prompts], npv,
                         fetch_rows=set())
        dr.prefill_rows(list(range(B)), [p[:-1] for p in prompts], npv,
                        fetch_rows=set())

        # the round program gathers from the embedding in both engines' ~11
        # forwards; a column-major (as-built) table makes XLA materialize
        # row-major 571 MB copies PER USE and remat-compress them (measured:
        # OOM at B=8, 160 ms/round at block=1). One shared row-major copy
        # passed in both trees removes them; memoized per decoder because
        # re-running the pinned-layout identity jit per call is both wasted
        # compile time and fragile through this device tunnel.
        def _row_major(x):
            try:
                from jax.experimental.layout import Format, Layout

                lay = x.format.layout
                want = tuple(range(x.ndim))
                if lay is None or lay.major_to_minor == want:
                    return x
                return jax.jit(
                    lambda a: a,
                    out_shardings=Format(Layout(major_to_minor=want),
                                         x.sharding))(x)
            except Exception:
                return x

        if not hasattr(self, "_emb_rm"):
            emb_rm = _row_major(tgt.params["tok_embeddings"])
            if dr.params["tok_embeddings"] is tgt.params["tok_embeddings"]:
                emb_rm_d = emb_rm
            else:
                emb_rm_d = _row_major(dr.params["tok_embeddings"])
            self._emb_rm = (emb_rm, emb_rm_d)
        emb_rm, emb_rm_d = self._emb_rm
        params_t = {**tgt.params, "tok_embeddings": emb_rm}
        params_d = {**dr.params, "tok_embeddings": emb_rm_d}
        npv = np.asarray([len(p) - 1 for p in prompts], np.int32)
        toks = jnp.asarray(np.asarray([p[-1] for p in prompts], np.int32))
        npv_dev = jnp.asarray(npv)

        rnd = self._fused_round_rows()
        out: list[list[int]] = [[] for _ in range(B)]
        done = [False] * B
        import time as _time
        t0 = _time.perf_counter()
        warm = False
        while not all(done) and \
                int(npv.max()) + 2 * R * (k + 1) <= n_ctx:
            toks_r, acc_r, tgt.kv, dr.kv, npv_dev, toks = rnd(
                params_t, params_d, toks, tgt.kv, dr.kv, npv_dev)
            if not warm:
                warm = True
                jax.block_until_ready(acc_r)
                tgt.timings.t_compile_us += \
                    (_time.perf_counter() - t0) * 1e6
                t0 = _time.perf_counter()
            toks_h = np.asarray(jax.device_get(toks_r))   # (R, B, k+1)
            acc_h = np.asarray(jax.device_get(acc_r))     # (R, B)
            npv = np.asarray(jax.device_get(npv_dev))
            for r in range(R):
                stats.n_rounds += 1
                for b in range(B):
                    if done[b]:
                        continue
                    n_acc = int(acc_h[r, b])
                    stats.n_drafted += k
                    stats.n_accepted += n_acc
                    for t in toks_h[r, b, : n_acc + 1]:
                        t = int(t)
                        out[b].append(t)
                        stats.n_emitted += 1
                        if (stop_ids and t in stop_ids) or \
                                len(out[b]) >= n_predict:
                            done[b] = True
                            break
        dt = (_time.perf_counter() - t0) * 1e6
        tgt.timings.t_decode_us += dt
        tgt.timings.n_decode += sum(len(o) for o in out)
        return [o[:n_predict] for o in out]

    def _generate_fused(self, prompt_ids, n_predict, stop_ids, on_token,
                        stats, sampler) -> list[int]:
        import jax
        import jax.numpy as jnp

        tgt, dr, k = self.target, self.draft, self.k
        base = tgt.n_past  # engines may enter pre-advanced (server prefix reuse)
        history = list(prompt_ids)
        if len(prompt_ids) > 1:
            tgt.eval_tokens(prompt_ids[:-1])
            dr.eval_tokens(prompt_ids[:-1])
        rnd = self._fused_round(self._sampler_spec(sampler))
        seed = sampler.seed if sampler.seed >= 0 else \
            int.from_bytes(__import__("os").urandom(4), "little")
        key = jax.random.PRNGKey(seed)
        tok = jax.device_put(jnp.int32(history[-1]))
        n_past = jax.device_put(jnp.int32(tgt.n_past))
        out: list[int] = []
        # per CONSUMED round: (committed tokens, n_acc, uniforms) — lets
        # tests replay the device accept/resample math on host
        self.last_rounds: list[tuple[list[int], int, np.ndarray]] = []
        import time as _time
        t0 = _time.perf_counter()
        warm = False
        # 1-deep round pipelining: the next round's inputs (pending token,
        # n_past, both KV caches) are all device-resident, so it dispatches
        # BEFORE the previous round's (tokens, n_acc) are fetched — the
        # host/tunnel round-trip overlaps device execution (the
        # decode_pipelined scheme). Worst case one speculative round of
        # device work is wasted at a stop boundary; stale KV is masked.
        pending_fetch = None  # (toks, n_acc, us) of the previous block
        stop = False

        def consume(fetched):
            """Commit one fetched BLOCK (R rounds) to the host stream."""
            nonlocal stop
            toks_h, n_acc_h, us_h = fetched
            toks_h = np.asarray(toks_h)          # (R, k+1)
            us_h = np.asarray(us_h)              # (R, 2k+2)
            for r in range(toks_h.shape[0]):
                n_acc = int(n_acc_h[r])
                emitted = [int(t) for t in toks_h[r, : n_acc + 1]]
                self.last_rounds.append((emitted, n_acc, us_h[r]))
                stats.n_rounds += 1
                stats.n_drafted += k
                stats.n_accepted += n_acc
                stats.n_emitted += len(emitted)
                tgt.n_past += n_acc + 1
                dr.n_past += n_acc + 1
                for t in emitted:
                    out.append(t)
                    history.append(t)
                    if on_token is not None and on_token(t) is False:
                        stop = True
                    elif stop_ids and t in stop_ids:
                        stop = True
                    if len(out) >= n_predict:
                        stop = True
                    if stop:
                        break
                if stop:
                    break

        # guard against the in-flight + next block overrunning the context:
        # tgt.n_past is the CONSUMED position; at most one unconsumed block
        # (advance <= R(k+1)) is in flight when the next one dispatches
        R = self.rounds
        while not stop and tgt.n_past + 2 * R * (k + 1) <= tgt.cfg.n_ctx:
            toks, n_acc, us, tgt.kv, dr.kv, n_past, tok, key = rnd(
                tgt.params, dr.params, tok, tgt.kv, dr.kv, n_past, key)
            if not warm:
                warm = True
                jax.block_until_ready(n_acc)
                tgt.timings.t_compile_us += (_time.perf_counter() - t0) * 1e6
                t0 = _time.perf_counter()
            if pending_fetch is not None:
                consume(jax.device_get(pending_fetch))
            pending_fetch = (toks, n_acc, us)
        if pending_fetch is not None and not stop:
            consume(jax.device_get(pending_fetch))
        # re-align engine state with the committed stream (drop any round
        # overshoot past n_predict/stop; stale cache beyond is masked)
        out = out[: n_predict]
        n_final = base + len(prompt_ids) + len(out) - 1
        tgt.rollback(min(tgt.n_past, n_final))
        dr.rollback(min(dr.n_past, n_final))
        dt = (_time.perf_counter() - t0) * 1e6
        tgt.timings.t_decode_us += dt
        tgt.timings.n_decode += len(out)
        return out

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
        if (self._fused_ok(sampler)
                and self.target.n_past + len(prompt_ids) - 1
                + 2 * self.rounds * (self.k + 1) <= n_ctx):
            return self._generate_fused(prompt_ids, n_predict, stop_ids,
                                        on_token, stats, sampler)

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
