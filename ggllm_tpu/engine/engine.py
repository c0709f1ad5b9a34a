"""Inference engine: KV cache, jitted prefill/decode, generation loop.

The falcon_context/falcon_eval analogue (libfalcon.cpp:2011-2588, 3755-3833),
redesigned for XLA's compile-once model instead of ggml's rebuild-per-token
graphs:

* the KV cache is ONE preallocated (n_layer, 2, B, kv_T, n_head_kv, head_dim)
  array (kv_T = n_ctx + scratch), functionally updated and donated through
  jit so XLA aliases it in place;
* prefill lengths are padded to power-of-two buckets; padded query positions
  write the KV scratch region past n_ctx, so masking stays a simple
  `key_pos <= query_pos`;
* decode runs DECODE_CHUNK fused forward+sample steps per dispatch
  (on-device sampling for greedy/temp/top-k/top-p); the host sampling
  cascade (ops/sampling.py) covers penalties/mirostat per token;
* batched (per-row n_past) entry points serve the continuous batcher;
* under a mesh, either the shard_map tensor-parallel fused path
  (parallel/tp.py, KernelQuant weights) or the GSPMD split-weight fallback.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.models import resolve as resolve_model
from ggllm_tpu.ops import kvcache
from ggllm_tpu.ops import sampling
from ggllm_tpu.ops import sampling_device
from ggllm_tpu.ops.rope import rope_angles

PREFILL_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048)

# default tokens per device dispatch for the fused decode loop (overridable
# via EngineConfig.decode_chunk): large enough to amortize host/launch
# overhead, small enough for responsive streaming and stopword checks
DECODE_CHUNK = 16


def _relayout_planes(params):
    """Re-lay the packed quant-plane leaves to default row-major ON DEVICE
    (cfg.plane_layout="prefill").

    The builders emit planes k-minor — the layout the VPU-floor decode
    matvec kernels are fastest with — while the MXU prefill kernels
    receive row-major operands, so XLA inserts a transposing copy of
    every plane once per prefill chunk (~36 ms per 2048 tokens at 7B,
    round-5 trace census). Prefill-dominated workloads (perplexity) opt
    into row-major storage and skip those copies (+15% measured); decode
    workloads must NOT (111 -> 15 tok/s measured with row-major planes).
    One jitted identity with pinned output layouts relayouts everything
    on device — device_put with a Format would round-trip gigabytes
    through the host tunnel."""
    try:
        from jax.experimental.layout import Format, Layout

        flat, treedef = jax.tree.flatten(params)
        idx = [
            i for i, x in enumerate(flat)
            if hasattr(x, "format") and getattr(x, "ndim", 0) > 1
            and str(x.dtype) in ("uint8", "int16", "int8")
            and x.format.layout is not None
            and x.format.layout.major_to_minor != tuple(range(x.ndim))
        ]
        if not idx:
            return params
        fmts = tuple(
            Format(Layout(major_to_minor=tuple(range(flat[i].ndim))),
                   flat[i].sharding) for i in idx)
        fixed = jax.jit(lambda xs: xs, out_shardings=fmts)(
            tuple(flat[i] for i in idx))
        for i, g in zip(idx, fixed):
            flat[i] = g
        return treedef.unflatten(flat)
    except Exception:
        return params  # platforms without layout support


def _bucket(n: int, n_batch: int) -> int:
    if n == 1:
        return 1  # decode step: dedicated (B, 1) program
    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"chunk of {n} tokens exceeds the largest prefill "
                     f"bucket {PREFILL_BUCKETS[-1]}")


@partial(jax.jit, donate_argnums=())
def _gather_logprobs(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """(B, S, V) logits -> (S,) log softmax(logits[0, j])[targets[j]]."""
    row = logits[0].astype(jnp.float32)
    lsm = row - jax.scipy.special.logsumexp(row, axis=-1, keepdims=True)
    return jnp.take_along_axis(lsm, targets[:, None], axis=1)[:, 0]


@dataclass
class Timings:
    """falcon_print_timings fields (libfalcon.cpp:4700-4715)."""

    t_load_us: float = 0.0
    t_compile_us: float = 0.0  # TPU-only: one-time XLA compiles, kept out
    t_sample_us: float = 0.0   # of the per-token buckets so short runs
    t_prefill_us: float = 0.0  # report honest steady-state numbers
    t_decode_us: float = 0.0
    n_sample: int = 0
    n_prefill: int = 0
    n_decode: int = 0

    def report(self) -> str:
        lines = [f"load time       = {self.t_load_us / 1000:.2f} ms"]
        if self.t_compile_us:
            lines.append(
                f"compile time    = {self.t_compile_us / 1000:.2f} ms "
                "(one-time XLA compiles; cached across runs)")
        if self.n_sample:
            lines.append(
                f"sample time     = {self.t_sample_us / 1000:.2f} ms / {self.n_sample} runs"
                f" ({self.t_sample_us / 1000 / max(1, self.n_sample):.2f} ms per token,"
                f" {self.n_sample / max(1e-9, self.t_sample_us / 1e6):.2f} tokens per second)"
            )
        if self.n_prefill:
            lines.append(
                f"batch eval time = {self.t_prefill_us / 1000:.2f} ms / {self.n_prefill} tokens"
                f" ({self.t_prefill_us / 1000 / max(1, self.n_prefill):.2f} ms per token,"
                f" {self.n_prefill / max(1e-9, self.t_prefill_us / 1e6):.2f} tokens per second)"
            )
        if self.n_decode:
            lines.append(
                f"eval time       = {self.t_decode_us / 1000:.2f} ms / {self.n_decode} runs"
                f" ({self.t_decode_us / 1000 / max(1, self.n_decode):.2f} ms per token,"
                f" {self.n_decode / max(1e-9, self.t_decode_us / 1e6):.2f} tokens per second)"
            )
        return "\n".join(lines)


class FalconEngine:
    """Single-model inference engine."""

    def __init__(
        self,
        hparams: FalconHParams,
        params,
        cfg: EngineConfig | None = None,
        batch_size: int = 1,
        mesh=None,
    ):
        self.hp = hparams
        self.cfg = cfg or EngineConfig()
        self.batch = batch_size
        import jax as _jax

        self.mesh = mesh
        is_tp = False
        if mesh is not None:
            from ggllm_tpu.kernels.layout import KernelQuant

            layers = params["layers"]
            # TP weights are device-stacked KernelQuants (leading mesh axis,
            # 4-D planes); single-chip kernel weights have 3-D planes
            is_tp = isinstance(layers, (list, tuple)) and any(
                isinstance(v, KernelQuant)
                and next(iter(v.planes.values())).ndim == 4
                for v in layers[0].values())
        flash = (cfg or EngineConfig()).flash_attention
        if flash is None:
            # the Pallas kernel runs single-chip or per-shard inside the
            # shard_map TP path; only the GSPMD fallback can't use it (XLA
            # cannot partition a pallas_call)
            flash = _jax.default_backend() == "tpu" and (mesh is None or is_tp)
        self.st, self._forward = resolve_model(hparams, flash=flash)
        self.kv_dtype = (self.cfg.kv_dtype if self.cfg.kv_dtype == "int8"
                         else jnp.dtype(self.cfg.kv_dtype))
        self.compute_dtype = jnp.dtype(self.cfg.compute_dtype)
        self.inv_freq = rope_angles(self.cfg.rope, self.cfg.n_ctx,
                                    hparams.head_dim, arch=hparams.arch)
        self._kv_sharding = None
        self.tp_plan = None
        self.sp_axis_size = 0  # >0 = sequence-parallel mode (parallel/sp.py)
        if mesh is not None and self.cfg.kv_shard == "sequence":
            from jax.sharding import NamedSharding
            from ggllm_tpu.parallel import sp as sp_mod

            assert hparams.arch == "falcon", "sequence-parallel: falcon only"
            assert not is_tp, "kv_shard='sequence' takes single-chip weights"
            assert isinstance(params["layers"], (list, tuple)), \
                "sequence-parallel requires the fused kernel weight layout"
            self.sp_axis_size = mesh.shape["model"]
            assert PREFILL_BUCKETS[0] % self.sp_axis_size == 0, \
                "sequence-parallel model axis must divide the smallest bucket"
            params = sp_mod.replicate_params(params, mesh)
            self._kv_sharding = NamedSharding(mesh, sp_mod.kv_spec())
        elif mesh is not None:
            from jax.sharding import NamedSharding

            if is_tp:
                # fused-kernel tensor parallelism: shard_map'd forward over
                # device-blocked weights (parallel/tp.py), one psum/layer
                from ggllm_tpu.parallel import tp as tp_mod

                self.tp_plan = tp_mod.TpPlan(hparams, mesh.shape["model"])
                self._st_local = self.tp_plan.local_static(self.st)
                self._kv_sharding = NamedSharding(
                    mesh, tp_mod.kv_spec(self.tp_plan))
            else:
                from ggllm_tpu.parallel import sharding as shd

                specs = shd.param_specs(params, hparams, mesh)
                params = shd.shard_params(params, specs, mesh)
                self._kv_sharding = NamedSharding(
                    mesh, shd.kv_specs(hparams, mesh, batch_size)
                )
        if self.cfg.plane_layout == "prefill":
            params = _relayout_planes(params)
        self.params = params
        self.n_past = 0
        self.kv = self.new_kv()
        self.timings = Timings()
        self._fwd = {}  # (seq_len, logits_all) -> jitted fn
        self._warm = set()  # fn keys whose first (compiling) call has run

    # ---------------------------------------------------------------- kv

    @property
    def kv_T(self) -> int:
        """KV time dim: n_ctx plus a scratch region. Padded prefill positions
        and parked batch rows write beyond n_ctx instead of corrupting live
        entries (attention masks them; they are overwritten on reuse)."""
        t = self.cfg.n_ctx + max(self.cfg.n_batch, DECODE_CHUNK,
                                 self.cfg.decode_chunk)
        if self.sp_axis_size:  # time axis shards evenly over the mesh
            t = -(-t // self.sp_axis_size) * self.sp_axis_size
        return t

    def new_kv(self):
        from ggllm_tpu.ops import kvcache

        hp = self.hp
        shape = (hp.n_layer, 2, self.batch, self.kv_T, hp.n_head_kv, hp.head_dim)
        if self._kv_sharding is not None:
            # allocate directly in the target sharding — also valid when the
            # mesh spans non-addressable devices (multi-host)
            mk = jax.jit(lambda: kvcache.new(shape, self.kv_dtype),
                         out_shardings=self._kv_sharding)
            return mk()
        return kvcache.new(shape, self.kv_dtype)

    def reset(self):
        self.n_past = 0
        self.kv = self.new_kv()

    @staticmethod
    def _fetch(x) -> np.ndarray:
        """device_get that also works when the array spans non-addressable
        devices (multi-host GSPMD outputs): gather the global value."""
        if getattr(x, "is_fully_addressable", True):
            return np.asarray(jax.device_get(x))
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    # ------------------------------------------------------------- compile

    def _tp_wrap(self, body, extra_in_specs, extra_out_specs):
        """shard_map a jit body over (params, ..., kv, ...) for the TP path."""
        from jax.sharding import PartitionSpec as P
        from ggllm_tpu.parallel import tp as tp_mod

        pspecs = tp_mod.tp_param_specs(self.params)
        kvs = tp_mod.kv_spec(self.tp_plan)
        return jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(pspecs,) + tuple(
                kvs if s == "kv" else P() for s in extra_in_specs),
            out_specs=tuple(
                kvs if s == "kv" else P() for s in extra_out_specs),
            check_vma=False,
        )

    def _tp_local_params(self, params):
        from ggllm_tpu.kernels.layout import KernelQuant
        from ggllm_tpu.parallel import tp as tp_mod

        def conv(w):
            if isinstance(w, KernelQuant) and next(iter(w.planes.values())).ndim == 4:
                return tp_mod.local_view(w)
            return w

        return jax.tree.map(
            conv, params, is_leaf=lambda x: isinstance(x, KernelQuant))

    def _sp_wrap(self, body, tok_spec, logits_spec):
        """shard_map a (params, tokens, kv, n_past, last_pos) body for the
        sequence-parallel mode (replicated weights, time-sharded KV)."""
        from jax.sharding import PartitionSpec as P
        from ggllm_tpu.parallel import sp as sp_mod

        pspecs = sp_mod.sp_param_specs(self.params)
        kvs = sp_mod.kv_spec()
        return jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(pspecs, tok_spec, kvs, P(), P()),
            out_specs=(logits_spec, kvs),
            check_vma=False,
        )

    def _forward_fn(self, seq_len: int, logits_all: bool):
        key = (seq_len, logits_all)
        if key not in self._fwd:
            inv_freq, dtype = self.inv_freq, self.compute_dtype
            forward = self._forward
            if self.sp_axis_size:
                from jax.sharding import PartitionSpec as P
                from ggllm_tpu.parallel import sp as sp_mod

                st = self.st
                if seq_len > 1:
                    assert seq_len % self.sp_axis_size == 0, \
                        "prefill bucket must divide over the model axis"

                    def body(params, tokens, kv, n_past, last_pos):
                        return sp_mod.sp_prefill(
                            params, tokens, kv, n_past, inv_freq, st,
                            logits_all=logits_all, compute_dtype=dtype,
                            last_pos=last_pos)

                    fwd = jax.jit(self._sp_wrap(
                        body, P(None, "model"),
                        P(None, "model", None) if logits_all else P()),
                        donate_argnums=(2,))
                else:
                    def body(params, tokens, kv, n_past, last_pos):
                        return sp_mod.sp_decode(
                            params, tokens, kv, n_past, inv_freq, st,
                            compute_dtype=dtype)

                    fwd = jax.jit(self._sp_wrap(body, P(), P()),
                                  donate_argnums=(2,))
                self._fwd[key] = fwd
                return fwd
            if self.tp_plan is not None:
                st = self._st_local

                def body(params, tokens, kv, n_past, last_pos):
                    params = self._tp_local_params(params)
                    return forward(
                        params, tokens, kv, n_past, inv_freq, st,
                        logits_all=logits_all, compute_dtype=dtype,
                        last_pos=last_pos, psum_axis="model",
                    )

                fwd = jax.jit(
                    self._tp_wrap(body, ("x", "kv", "x", "x"), ("x", "kv")),
                    donate_argnums=(2,))
            else:
                st = self.st

                @partial(jax.jit, donate_argnums=(2,))
                def fwd(params, tokens, kv, n_past, last_pos):
                    return forward(
                        params, tokens, kv, n_past, inv_freq, st,
                        logits_all=logits_all, compute_dtype=dtype, last_pos=last_pos,
                    )

            self._fwd[key] = fwd
        return self._fwd[key]

    def export_hlo(self, seq_len: int | None = None) -> str:
        """StableHLO text of the lowered forward graph — the TPU analogue of
        the reference's cgraph --export (falcon_common.cpp 'export' /
        ggml_graph_export): the whole compiled computation, inspectable."""
        pad = _bucket(seq_len or self.cfg.n_batch, self.cfg.n_batch)
        fwd = self._forward_fn(pad, False)
        lowered = fwd.lower(
            self.params, jnp.zeros((self.batch, pad), jnp.int32),
            self.kv, jnp.int32(0), jnp.int32(pad - 1))
        return lowered.as_text()

    # ---------------------------------------------------------------- eval

    def eval_tokens(self, tokens, logits_all: bool = False) -> np.ndarray:
        """Evaluate tokens (list/array of ids, one sequence) starting at n_past.

        Splits into n_batch chunks like the reference main loop
        (falcon_main.cpp:820-845). Returns logits: (n, n_vocab) when
        logits_all else (n_vocab,) for the final position.
        """
        tokens = np.asarray(tokens, dtype=np.int32).reshape(-1)
        out = []
        i = 0
        step = min(self.cfg.n_batch, PREFILL_BUCKETS[-1])
        while i < tokens.size:
            chunk = tokens[i : i + step]
            last = i + chunk.size >= tokens.size
            # non-final chunks of a logits_all=False prefill: nothing to
            # fetch — dispatch and move on (chunks pipeline on device)
            out.append(self._eval_chunk(chunk, logits_all,
                                        fetch=logits_all or last))
            i += chunk.size
        if logits_all:
            return np.concatenate(out, axis=0)
        return out[-1]

    def _eval_chunk(self, chunk: np.ndarray, logits_all: bool,
                    fetch: bool = True) -> np.ndarray:
        n = chunk.size
        assert self.n_past + n <= self.cfg.n_ctx, "context overflow"
        pad = _bucket(n, self.cfg.n_batch)
        buf = np.zeros((self.batch, pad), dtype=np.int32)
        buf[0, :n] = chunk
        key = ("fwd", pad, logits_all)
        first = key not in self._warm
        t0 = time.perf_counter()
        fwd = self._forward_fn(pad, logits_all)
        logits, kv = fwd(
            self.params, jnp.asarray(buf), self.kv,
            jnp.int32(self.n_past), jnp.int32(n - 1),
        )
        t_disp = time.perf_counter()
        if fetch:
            logits = self._fetch(logits).astype(np.float32)
        dt = (time.perf_counter() - t0) * 1e6
        if first:
            # the first dispatch blocks on XLA compilation: book it to the
            # compile bucket so per-token rates reflect steady state
            self._warm.add(key)
            comp = (t_disp - t0) * 1e6
            self.timings.t_compile_us += comp
            dt -= comp
        if n > 1:
            self.timings.t_prefill_us += dt
            self.timings.n_prefill += n
        else:
            self.timings.t_decode_us += dt
            self.timings.n_decode += 1
        self.kv = kv
        self.n_past += n
        if not fetch:
            return None
        if logits_all:
            return logits[0, :n]
        return logits[0, 0]  # single dynamic-sliced position

    def eval(self, tokens, logits_all: bool = False) -> np.ndarray:
        """Reference falcon_eval equivalent."""
        return self.eval_tokens(tokens, logits_all=logits_all)

    def eval_logprobs(self, tokens) -> np.ndarray:
        """Per-position next-token log-probabilities for one sequence
        starting at n_past: out[j] = log softmax(logits_j)[tokens[j+1]],
        shape (n-1,). The log-softmax gather runs ON DEVICE so only (n,)
        floats transfer instead of the full (n, n_vocab) logits — the
        perplexity tool's hot path (falcon_perplexity evals with logits_all
        and ships every row to the host)."""
        tokens = np.asarray(tokens, dtype=np.int32).reshape(-1)
        out = []
        i = 0
        step = min(self.cfg.n_batch, PREFILL_BUCKETS[-1])
        while i < tokens.size:
            chunk = tokens[i : i + step]
            targets = tokens[i + 1 : i + 1 + chunk.size]
            out.append(self._eval_chunk_logprobs(chunk, targets))
            i += chunk.size
        return np.concatenate(out) if out else np.zeros(0, np.float32)

    def _eval_chunk_logprobs(self, chunk: np.ndarray, targets: np.ndarray):
        n = chunk.size
        assert self.n_past + n <= self.cfg.n_ctx, "context overflow"
        pad = _bucket(n, self.cfg.n_batch)
        buf = np.zeros((self.batch, pad), dtype=np.int32)
        buf[0, :n] = chunk
        tgt = np.zeros(pad, dtype=np.int32)
        tgt[: targets.size] = targets
        t0 = time.perf_counter()
        fwd = self._forward_fn(pad, True)
        logits, kv = fwd(
            self.params, jnp.asarray(buf), self.kv,
            jnp.int32(self.n_past), jnp.int32(n - 1),
        )
        lp = self._fetch(_gather_logprobs(logits, jnp.asarray(tgt)))
        self.timings.t_prefill_us += (time.perf_counter() - t0) * 1e6
        self.timings.n_prefill += n
        self.kv = kv
        self.n_past += n
        return lp[: targets.size].astype(np.float32)

    # ------------------------------------------------------- fused decoding

    def _decode_loop_fn(self, n_steps: int, temp: float, top_k: int,
                        top_p: float, pen_spec: tuple):
        """Jitted scan: n_steps of forward + on-device sampling (penalties +
        bias + top-k/top-p/temp cascade), one dispatch."""
        key = ("loop", n_steps, temp, top_k, top_p, pen_spec)
        if key not in self._fwd:
            inv_freq, dtype = self.inv_freq, self.compute_dtype
            forward = self._forward
            tp = self.tp_plan is not None
            sp = self.sp_axis_size > 0
            st = self._st_local if tp else self.st
            psum_axis = "model" if tp else None
            L = max(int(pen_spec[1]), 1)  # penalty ring length

            B = self.batch
            if sp:
                from ggllm_tpu.parallel import sp as sp_mod

            kv_dtype = self.cfg.kv_dtype

            def loop_body(params, tok, kv, n_past, rng, ring, pos):
                if tp:
                    params = self._tp_local_params(params)

                if sp:
                    # sequence-parallel: per-step merged-partial attention
                    # over the time shards (parallel/sp.py) — unchanged
                    def body(carry, _):
                        tok, kv, n_past, rng, ring, pos = carry
                        toks_b = jnp.full((B, 1), tok, jnp.int32)
                        logits, kv = sp_mod.sp_decode(
                            params, toks_b, kv, n_past, inv_freq, st,
                            compute_dtype=dtype)
                        rng, sub = jax.random.split(rng)
                        penalized = sampling_device.apply_penalties(
                            logits[0, 0], ring, pen_spec)
                        nxt = sampling_device.sample_logits(
                            penalized, sub, temp, top_k, top_p)
                        ring = ring.at[pos % L].set(nxt)
                        return (nxt, kv, n_past + 1, rng, ring, pos + 1), nxt

                    carry, toks = jax.lax.scan(
                        body, (tok, kv, n_past, rng, ring, pos),
                        length=n_steps)
                    _, kv, _, rng, ring, pos = carry
                    return toks, kv, rng, ring, pos

                # chunk-deferred KV (same scheme as the batched rows loop):
                # the cache is READ-ONLY for the whole chunk — steps
                # accumulate K/V in `pending`, attention reads cache +
                # pending, one scatter at chunk end. This also lets the
                # flash-decode kernel's merged cache view be computed ONCE
                # per chunk (the 6D->5D relayout materializes the full
                # cache: 4 ms/occurrence at LLaMA geometry).
                from ggllm_tpu.models.falcon import merged_cache_view

                kvd = kv[0] if isinstance(kv, tuple) else kv
                L_, _, _, _, KV_, D_ = kvd.shape
                pdtype = dtype if kv_dtype == "int8" else kvd.dtype
                pending0 = jnp.zeros((L_, 2, B, n_steps, KV_, D_), pdtype)
                kvm = merged_cache_view(kv, st)

                def body(carry, j):
                    tok, pending, rng, ring, pos = carry
                    # single-stream generation: broadcast the token to every
                    # cache row (only row 0's logits are sampled)
                    toks_b = jnp.full((B, 1), tok, jnp.int32)
                    logits, kv_new = forward(
                        params, toks_b, kv, n_past + j, inv_freq,
                        st, logits_all=False, compute_dtype=dtype, last_pos=0,
                        unroll=True, psum_axis=psum_axis,
                        pending=pending, n_pend=j, kv_merged=kvm,
                    )
                    rng, sub = jax.random.split(rng)
                    penalized = sampling_device.apply_penalties(
                        logits[0, 0], ring, pen_spec)
                    nxt = sampling_device.sample_logits(
                        penalized, sub, temp, top_k, top_p)
                    ring = ring.at[pos % L].set(nxt)
                    pending = jax.lax.dynamic_update_slice(
                        pending, kv_new.astype(pdtype), (0, 0, 0, j, 0, 0))
                    return (nxt, pending, rng, ring, pos + 1), nxt

                carry, toks = jax.lax.scan(
                    body, (tok, pending0, rng, ring, pos),
                    jnp.arange(n_steps, dtype=jnp.int32))
                _, pending, rng, ring, pos = carry
                kv = kvcache.write_all_layers(
                    kv, pending, jnp.broadcast_to(
                        jnp.asarray(n_past, jnp.int32).reshape(-1), (B,)))
                return toks, kv, rng, ring, pos

            if tp:
                loop = jax.jit(
                    self._tp_wrap(loop_body, ("x", "kv", "x", "x", "x", "x"),
                                  ("x", "kv", "x", "x", "x")),
                    donate_argnums=(2,))
            elif sp:
                from jax.sharding import PartitionSpec as P

                pspecs = sp_mod.sp_param_specs(self.params)
                kvs = sp_mod.kv_spec()
                loop = jax.jit(jax.shard_map(
                    loop_body, mesh=self.mesh,
                    in_specs=(pspecs, P(), kvs, P(), P(), P(), P()),
                    out_specs=(P(), kvs, P(), P(), P()),
                    check_vma=False,
                ), donate_argnums=(2,))
            else:
                loop = jax.jit(loop_body, donate_argnums=(2,))

            self._fwd[key] = loop
        return self._fwd[key]

    def decode_chunk(self, first_token: int, n_steps: int, sampler=None,
                     rng_key=None, last_tokens=None):
        """Run n_steps fused forward+sample steps starting from first_token
        (already sampled, not yet forwarded). Returns the n_steps sampled
        successor ids; advances n_past by n_steps.

        last_tokens: recent token history ENDING WITH first_token; seeds the
        on-device penalty window (repeat/frequency/presence). Defaults to
        just [first_token]."""
        sampler = sampler or sampling.SamplerParams(temp=0.0)
        assert self.n_past + n_steps <= self.cfg.n_ctx, "context overflow"
        pen_spec = sampling_device.penalty_spec(sampler, self.hp.n_vocab)
        loop = self._decode_loop_fn(
            n_steps, float(sampler.temp), int(sampler.top_k),
            float(sampler.top_p), pen_spec)
        if rng_key is None:
            seed = sampler.seed if sampler.seed >= 0 else 0
            rng_key = jax.random.PRNGKey(seed)
        L = max(int(sampler.repeat_last_n), 1)
        window = list(last_tokens) if last_tokens else [int(first_token)]
        window = window[-min(L, self.cfg.n_ctx):]
        ring = np.full(L, self.hp.n_vocab, dtype=np.int32)  # empty slots
        ring[: len(window)] = window
        loop_key = ("loop", n_steps, float(sampler.temp), int(sampler.top_k),
                    float(sampler.top_p), pen_spec)
        first = loop_key not in self._warm
        t0 = time.perf_counter()
        # device_put commits the scalar: the pipelined path feeds back
        # toks[-1] (committed), and a committed/uncommitted mismatch would
        # retrace and recompile the loop mid-measurement
        toks, kv, rng_key, _, _ = loop(
            self.params, jax.device_put(jnp.int32(first_token)), self.kv,
            jnp.int32(self.n_past), rng_key, jnp.asarray(ring),
            jnp.int32(len(window) % L),
        )
        t_disp = time.perf_counter()
        toks = self._fetch(toks)
        dt = (time.perf_counter() - t0) * 1e6
        if first:
            self._warm.add(loop_key)
            comp = (t_disp - t0) * 1e6
            self.timings.t_compile_us += comp
            dt -= comp
        self.timings.t_decode_us += dt
        self.timings.n_decode += n_steps
        self.kv = kv
        self.n_past += n_steps
        return toks, rng_key

    def decode_pipelined(self, first_token: int, n_total: int, n_steps: int,
                         sampler=None, rng_key=None, last_tokens=None,
                         on_tokens=None):
        """n_total tokens in n_steps-sized fused chunks, PIPELINED: the next
        chunk is dispatched (its first token, penalty ring and rng stay on
        device) before the previous chunk's tokens are fetched to the host,
        so device↔host latency overlaps compute. Semantically identical to
        chained decode_chunk calls (test-enforced).

        on_tokens(np.ndarray) is called per fetched chunk; return False to
        stop early (chunks already dispatched still advance n_past — use
        rollback() to discard, as the stop-holdback path does). Returns the
        full sampled token array."""
        sampler = sampler or sampling.SamplerParams(temp=0.0)
        assert n_total >= n_steps and n_total % n_steps == 0, \
            "n_total must be a positive chunk multiple"
        assert self.n_past + n_total <= self.cfg.n_ctx, "context overflow"
        pen_spec = sampling_device.penalty_spec(sampler, self.hp.n_vocab)
        loop = self._decode_loop_fn(
            n_steps, float(sampler.temp), int(sampler.top_k),
            float(sampler.top_p), pen_spec)
        if rng_key is None:
            seed = sampler.seed if sampler.seed >= 0 else 0
            rng_key = jax.random.PRNGKey(seed)
        L = max(int(sampler.repeat_last_n), 1)
        window = list(last_tokens) if last_tokens else [int(first_token)]
        window = window[-min(L, self.cfg.n_ctx):]
        ring_np = np.full(L, self.hp.n_vocab, dtype=np.int32)
        ring_np[: len(window)] = window
        tok = jax.device_put(jnp.int32(first_token))  # committed, like toks[-1]
        ring = jnp.asarray(ring_np)
        pos = jnp.int32(len(window) % L)
        loop_key = ("loop", n_steps, float(sampler.temp), int(sampler.top_k),
                    float(sampler.top_p), pen_spec)
        t0 = time.perf_counter()
        t_compile = 0.0
        out: list[np.ndarray] = []
        pending = None  # (tokens, rng after that chunk)
        rng_done = rng_key  # rng as of the last CONSUMED chunk
        stopped = False
        for done in range(0, n_total, n_steps):
            first = loop_key not in self._warm
            if first:
                tc = time.perf_counter()
            toks, kv, rng_key, ring, pos = loop(
                self.params, tok, self.kv, jnp.int32(self.n_past),
                rng_key, ring, pos)
            if first:
                # the first dispatch blocks on XLA compilation
                t_compile = time.perf_counter() - tc
                self._warm.add(loop_key)
            self.kv = kv
            self.n_past += n_steps
            tok = toks[-1]  # stays on device: next dispatch needs no fetch
            if pending is not None:
                fetched = self._fetch(pending[0])
                out.append(fetched)
                rng_done = pending[1]
                if on_tokens is not None and on_tokens(fetched) is False:
                    stopped = True
                    break
            pending = (toks, rng_key)
        if not stopped:
            fetched = self._fetch(pending[0])
            out.append(fetched)
            rng_done = pending[1]
            if on_tokens is not None:
                on_tokens(fetched)
        n_done = sum(len(o) for o in out)
        self.timings.t_compile_us += t_compile * 1e6
        self.timings.t_decode_us += \
            (time.perf_counter() - t0 - t_compile) * 1e6
        self.timings.n_decode += n_done
        return np.concatenate(out), rng_done

    def _masked_step_fn(self, n_steps: int, temp: float, top_k: int,
                        top_p: float, pen_spec: tuple, ring_len: int):
        """Jitted n_steps-decode with a bit-packed validity mask fused in:
        per step forward + (-inf mask) + penalties + cascade sample, one
        dispatch. The grammar fast path: instead of fetching (V,) logits to
        mask on host (65.6 ms/token through this tunnel), the host uploads
        ceil(V/8) mask BYTES and fetches n_steps token ids. The mask is
        CONSTANT across the chunk — exact while the grammar state
        self-loops (the caller consumes tokens only until the first state
        change and rolls the rest back). Plain single-device engines only
        (mesh grammar falls back to the host path)."""
        key = ("maskstep", n_steps, temp, top_k, top_p, pen_spec, ring_len)
        if key not in self._fwd:
            assert self.tp_plan is None and not self.sp_axis_size, \
                "masked step supports single-device engines"
            inv_freq, dtype, st = self.inv_freq, self.compute_dtype, self.st
            forward = self._forward
            kv_dtype = self.cfg.kv_dtype
            B, V = self.batch, self.hp.n_vocab
            L = ring_len
            from ggllm_tpu.models.falcon import merged_cache_view

            def step(params, tok, kv, n_past, rng, ring, pos, bits):
                kvd = kv[0] if isinstance(kv, tuple) else kv
                L_, _, _, _, KV_, D_ = kvd.shape
                pdtype = dtype if kv_dtype == "int8" else kvd.dtype
                pending0 = jnp.zeros((L_, 2, B, n_steps, KV_, D_), pdtype)
                kvm = merged_cache_view(kv, st)
                # unpack little-endian bits -> (V,) validity, once per chunk
                nb = bits.shape[0]
                expanded = jnp.repeat(bits, 8)
                shifts = jnp.tile(jnp.arange(8, dtype=jnp.uint8), nb)
                valid = (((expanded >> shifts) & 1) > 0)[:V]

                def body(carry, j):
                    tok, pending, rng, ring, pos = carry
                    toks_b = jnp.full((B, 1), tok, jnp.int32)
                    logits, kv_new = forward(
                        params, toks_b, kv, n_past + j, inv_freq, st,
                        logits_all=False, compute_dtype=dtype, last_pos=0,
                        unroll=True, pending=pending, n_pend=j, kv_merged=kvm)
                    lg = logits[0, 0].astype(jnp.float32)
                    # mask BEFORE bias/penalties (llama.cpp grammar order;
                    # -inf survives the penalty arithmetic)
                    lg = jnp.where(valid, lg, -jnp.inf)
                    rng, sub = jax.random.split(rng)
                    penalized = sampling_device.apply_penalties(
                        lg, ring, pen_spec)
                    nxt = sampling_device.sample_logits(
                        penalized, sub, temp, top_k, top_p)
                    ring = ring.at[pos % L].set(nxt)
                    pending = jax.lax.dynamic_update_slice(
                        pending, kv_new.astype(pdtype), (0, 0, 0, j, 0, 0))
                    return (nxt, pending, rng, ring, pos + 1), nxt

                (_, pending, rng, _, _), toks = jax.lax.scan(
                    body, (tok, pending0, rng, ring, pos),
                    jnp.arange(n_steps, dtype=jnp.int32))
                kv = kvcache.write_all_layers(
                    kv, pending, jnp.broadcast_to(
                        jnp.asarray(n_past, jnp.int32).reshape(-1), (B,)))
                return toks, kv, rng

            self._fwd[key] = jax.jit(step, donate_argnums=(2,))
        return self._fwd[key]

    def decode_chunk_masked(self, tok: int, mask_bits: np.ndarray,
                            n_steps: int = 1, sampler=None, rng_key=None,
                            last_tokens=None) -> tuple[np.ndarray, object]:
        """n_steps fused forward+masked-sample steps under ONE constant
        validity mask. mask_bits: np.packbits(valid_bool, bitorder='little').
        Returns ((n_steps,) token ids, rng); advances n_past by n_steps —
        the caller rolls back past any tokens it does not commit
        (grammar-state change mid-chunk)."""
        sampler = sampler or sampling.SamplerParams(temp=0.0)
        assert self.n_past + n_steps <= self.cfg.n_ctx, "context overflow"
        pen_spec = sampling_device.penalty_spec(sampler, self.hp.n_vocab)
        L = max(int(sampler.repeat_last_n), 1)
        step = self._masked_step_fn(
            n_steps, float(sampler.temp), int(sampler.top_k),
            float(sampler.top_p), pen_spec, L)
        if rng_key is None:
            seed = sampler.seed if sampler.seed >= 0 else 0
            rng_key = jax.random.PRNGKey(seed)
        window = list(last_tokens) if last_tokens else [int(tok)]
        window = window[-min(L, self.cfg.n_ctx):]
        ring = np.full(L, self.hp.n_vocab, dtype=np.int32)
        ring[: len(window)] = window
        key = ("maskstep", n_steps, float(sampler.temp), int(sampler.top_k),
               float(sampler.top_p), pen_spec, L)
        first = key not in self._warm
        t0 = time.perf_counter()
        toks, kv, rng_key = step(
            self.params, jnp.int32(tok), self.kv, jnp.int32(self.n_past),
            rng_key, jnp.asarray(ring), jnp.int32(len(window) % L),
            jnp.asarray(mask_bits))
        t_disp = time.perf_counter()
        toks = self._fetch(toks)
        dt = (time.perf_counter() - t0) * 1e6
        if first:
            self._warm.add(key)
            comp = (t_disp - t0) * 1e6
            self.timings.t_compile_us += comp
            dt -= comp
        self.timings.t_decode_us += dt
        self.timings.n_decode += n_steps
        self.kv = kv
        self.n_past += n_steps
        return toks, rng_key

    def embed(self, tokens) -> np.ndarray:
        """Final-layer (normed) hidden state for the last token — the
        reference embedding example's output (examples/embedding)."""
        tokens = np.asarray(tokens, dtype=np.int32).reshape(-1)
        # evaluate all but the final chunk through the normal prefill path,
        # then one hidden-output forward for the tail
        step = min(self.cfg.n_batch, PREFILL_BUCKETS[-1])
        if tokens.size > step:
            head = tokens.size - step
            self.eval_tokens(tokens[:head])
            tokens = tokens[head:]
        pad = _bucket(tokens.size, self.cfg.n_batch)
        if self.sp_axis_size:
            # the tail runs through the sequence-sharded prefill body, whose
            # chunk must divide over the model axis (decode-sized buckets
            # cannot): round up to a shardable prefill bucket
            pad = max(pad, PREFILL_BUCKETS[0])
        key = ("embed", pad)
        if self.sp_axis_size and key not in self._fwd:
            # sequence-parallel: sp_prefill with the hidden-state output
            # (pad below is a prefill bucket, which the mesh axis divides)
            from jax.sharding import PartitionSpec as P
            from ggllm_tpu.parallel import sp as sp_mod

            inv_freq, dtype, st = self.inv_freq, self.compute_dtype, self.st

            def sp_body(params, toks, kv, n_past, last_pos):
                return sp_mod.sp_prefill(
                    params, toks, kv, n_past, inv_freq, st,
                    compute_dtype=dtype, last_pos=last_pos,
                    output_hidden=True)

            self._fwd[key] = jax.jit(
                self._sp_wrap(sp_body, P(None, "model"), P()),
                donate_argnums=(2,))
        if key not in self._fwd:
            inv_freq, dtype = self.inv_freq, self.compute_dtype
            forward = self._forward
            tp = self.tp_plan is not None
            st = self._st_local if tp else self.st
            psum_axis = "model" if tp else None

            def body(params, toks, kv, n_past, last_pos):
                if tp:
                    params = self._tp_local_params(params)
                return forward(
                    params, toks, kv, n_past, inv_freq, st,
                    logits_all=False, compute_dtype=dtype, last_pos=last_pos,
                    output_hidden=True, psum_axis=psum_axis,
                )

            if tp:
                fwd = jax.jit(
                    self._tp_wrap(body, ("x", "kv", "x", "x"), ("x", "kv")),
                    donate_argnums=(2,))
            else:
                fwd = jax.jit(body, donate_argnums=(2,))

            self._fwd[key] = fwd
        assert self.n_past + tokens.size <= self.cfg.n_ctx, "context overflow"
        buf = np.zeros((self.batch, key[1]), dtype=np.int32)
        buf[0, : tokens.size] = tokens
        hidden, kv = self._fwd[key](
            self.params, jnp.asarray(buf), self.kv,
            jnp.int32(self.n_past), jnp.int32(tokens.size - 1))
        self.kv = kv
        self.n_past += tokens.size
        return self._fetch(hidden).astype(np.float32)[0, 0]

    def rollback(self, n_past: int):
        """Roll the logical KV position back (stale cache beyond is masked)."""
        assert 0 <= n_past <= self.n_past
        self.n_past = n_past

    # --------------------------------------------- batched (per-row) decoding
    # These entry points take an explicit per-row n_past vector and leave the
    # scalar self.n_past untouched; the ContinuousBatcher owns row state.

    def _forward_rows_fn(self, seq_len: int):
        key = ("rows", seq_len)
        if self.sp_axis_size and key not in self._fwd:
            # sequence-parallel row prefill: the row's chunk shards over the
            # time axis (ring-attention prefill), per-row n_past/last_pos
            from jax.sharding import PartitionSpec as P
            from ggllm_tpu.parallel import sp as sp_mod

            inv_freq, dtype, st = self.inv_freq, self.compute_dtype, self.st
            assert seq_len % self.sp_axis_size == 0, \
                "row-prefill bucket must divide over the model axis"

            def sp_body(params, tokens, kv, n_past_vec, last_pos_vec):
                return sp_mod.sp_prefill(
                    params, tokens, kv, n_past_vec, inv_freq, st,
                    compute_dtype=dtype, last_pos=last_pos_vec)

            self._fwd[key] = jax.jit(
                self._sp_wrap(sp_body, P(None, "model"), P()),
                donate_argnums=(2,))
        if key not in self._fwd:
            inv_freq, dtype = self.inv_freq, self.compute_dtype
            forward = self._forward
            tp = self.tp_plan is not None
            st = self._st_local if tp else self.st
            psum_axis = "model" if tp else None

            def body(params, tokens, kv, n_past_vec, last_pos_vec):
                if tp:
                    params = self._tp_local_params(params)
                return forward(
                    params, tokens, kv, n_past_vec, inv_freq, st,
                    logits_all=False, compute_dtype=dtype, last_pos=last_pos_vec,
                    psum_axis=psum_axis,
                )

            if tp:
                fwd = jax.jit(
                    self._tp_wrap(body, ("x", "kv", "x", "x"), ("x", "kv")),
                    donate_argnums=(2,))
            else:
                fwd = jax.jit(body, donate_argnums=(2,))

            self._fwd[key] = fwd
        return self._fwd[key]

    def prefill_row(self, row: int, tokens, n_past_vec: np.ndarray) -> np.ndarray:
        """Evaluate `tokens` on one batch row; other rows' n_past entries must
        be their parking positions (>= n_ctx) or live positions. Returns the
        row's final-position logits (n_vocab,)."""
        tokens = np.asarray(tokens, dtype=np.int32).reshape(-1)
        logits = None
        done = 0
        npv = np.asarray(n_past_vec, dtype=np.int32).copy()
        step = min(self.cfg.n_batch, PREFILL_BUCKETS[-1])
        while done < tokens.size:
            chunk = tokens[done : done + step]
            pad = _bucket(chunk.size, self.cfg.n_batch)
            if self.sp_axis_size:
                # 1-token prompts bucket to 1, which cannot shard over the
                # time axis: round up to a shardable prefill bucket
                pad = max(pad, PREFILL_BUCKETS[0])
            buf = np.zeros((self.batch, pad), dtype=np.int32)
            buf[row, : chunk.size] = chunk
            last = np.zeros(self.batch, dtype=np.int32)
            last[row] = chunk.size - 1
            fwd = self._forward_rows_fn(pad)
            t0 = time.perf_counter()
            out, kv = fwd(self.params, jnp.asarray(buf), self.kv,
                          jnp.asarray(npv), jnp.asarray(last))
            self.kv = kv
            logits = self._fetch(out).astype(np.float32)[row, 0]
            self.timings.t_prefill_us += (time.perf_counter() - t0) * 1e6
            self.timings.n_prefill += chunk.size
            npv[row] += chunk.size
            done += chunk.size
        return logits

    def prefill_rows(self, rows, prompts, n_past_vec: np.ndarray,
                     fetch_rows=None) -> dict:
        """Evaluate several rows' prompts in ONE batched forward (the
        continuous-batching admission path). Each batched forward costs a
        full B×bucket weight stream whether it prefills one row or all of
        them, so per-request admission is B× more expensive than it needs
        to be — measured 0.45 s/request at B=32 Falcon-7B, 71 s of a 77 s
        serving run, before this batched path.

        rows: batch-row index per prompt; prompts: token id arrays;
        n_past_vec: per-row positions — admitted rows at their start (0),
        other rows at live/parked positions (their in-flight writes land
        beyond their n_past and are masked: the stale-cache invariant).
        fetch_rows: only these rows' final logits are shipped to the host
        (the chunked-admission path passes mid-prompt slices for rows whose
        prompt continues next step — their logits are not needed).
        Returns {row: final-position logits (n_vocab,) float32}.
        """
        prompts = [np.asarray(p, dtype=np.int32).reshape(-1) for p in prompts]
        npv = np.asarray(n_past_vec, dtype=np.int32).copy()
        step = min(self.cfg.n_batch, PREFILL_BUCKETS[-1])
        out: dict[int, np.ndarray] = {}
        done = 0
        maxlen = max(p.size for p in prompts)
        while done < maxlen:
            width = min(step, maxlen - done)
            pad = _bucket(width, self.cfg.n_batch)
            if self.sp_axis_size:
                pad = max(pad, PREFILL_BUCKETS[0])
            buf = np.zeros((self.batch, pad), dtype=np.int32)
            last = np.zeros(self.batch, dtype=np.int32)
            fetch, sizes = [], []
            for row, p in zip(rows, prompts):
                chunk = p[done : done + pad]
                if chunk.size == 0:
                    continue  # this row's prompt ended in an earlier chunk
                buf[row, : chunk.size] = chunk
                last[row] = chunk.size - 1
                if done + chunk.size >= p.size and \
                        (fetch_rows is None or row in fetch_rows):
                    fetch.append(row)
                sizes.append((row, chunk.size))
            fwd = self._forward_rows_fn(pad)
            t0 = time.perf_counter()
            logits, kv = fwd(self.params, jnp.asarray(buf), self.kv,
                             jnp.asarray(npv), jnp.asarray(last))
            self.kv = kv
            if fetch:  # device-side gather: ship only finishing rows' logits
                got = self._fetch(logits[np.asarray(fetch), 0]) \
                    .astype(np.float32)
                for i, row in enumerate(fetch):
                    out[row] = got[i]
            self.timings.t_prefill_us += (time.perf_counter() - t0) * 1e6
            for row, n in sizes:
                npv[row] += n
                self.timings.n_prefill += n
            done += pad
        return out

    def _decode_rows_fn(self, n_steps: int, top_k: int, ring_len: int,
                        n_bias: int = 0, use_miro: bool = False,
                        use_mask: bool = False):
        key = ("rowloop", n_steps, top_k, ring_len, n_bias, use_miro,
               use_mask)
        if self.sp_axis_size and key not in self._fwd:
            assert not use_mask, "per-row masks: single-device engines only"
            self._fwd[key] = self._decode_rows_fn_sp(
                n_steps, top_k, ring_len, n_bias, use_miro)
        if key not in self._fwd:
            inv_freq, dtype = self.inv_freq, self.compute_dtype
            forward = self._forward
            tp = self.tp_plan is not None
            assert not (use_mask and tp), \
                "per-row masks: single-device engines only"
            assert not use_mask or n_steps == 1, \
                "per-row masks are per-state: one step per dispatch"
            st = self._st_local if tp else self.st
            psum_axis = "model" if tp else None
            L = ring_len
            n_vocab = self.hp.n_vocab

            kv_dtype = self.cfg.kv_dtype

            def loop_body(params, toks, kv, n_past_vec, temp, top_p,
                          top_k_rows, rp, fp, pp, rings, ring_pos,
                          tfs, typ, bias_ids, bias_vals,
                          mmode, mtau, meta, mu, rng, mask_bits=None):
                if tp:
                    params = self._tp_local_params(params)
                B = toks.shape[0]
                rows = jnp.arange(B, dtype=jnp.int32)
                # chunk-deferred KV: the scatter's layout round-trip copies
                # the whole cache twice, so pay it once per chunk, not once
                # per step — steps accumulate K/V in `pending` and attention
                # reads cache + pending (models/*.py pending/n_pend path).
                # Stored at the dense cache dtype so in-chunk reads are
                # bit-identical to post-scatter reads (int8 caches quantize
                # at the chunk-end scatter; in-chunk reads see dense values,
                # as the per-step defer path's current token already did).
                from ggllm_tpu.models.falcon import merged_cache_view

                kvd = kv[0] if isinstance(kv, tuple) else kv
                L_, _, _, _, KV_, D_ = kvd.shape
                pdtype = dtype if kv_dtype == "int8" else kvd.dtype
                pending0 = jnp.zeros((L_, 2, B, n_steps, KV_, D_), pdtype)
                kvm = merged_cache_view(kv, st)  # hoisted: once per chunk

                def body(carry, j):
                    toks, pending, rings, ring_pos, mu, rng = carry
                    logits, kv_new = forward(
                        params, toks[:, None], kv, n_past_vec + j, inv_freq,
                        st, logits_all=False, compute_dtype=dtype,
                        last_pos=jnp.zeros(B, jnp.int32),
                        unroll=True, psum_axis=psum_axis,
                        pending=pending, n_pend=j, kv_merged=kvm,
                    )
                    rng, sub = jax.random.split(rng)
                    keys = jax.random.split(sub, B)
                    u = jax.vmap(lambda kk: jax.random.uniform(kk, ()))(keys)
                    lg = logits[:, 0]
                    if use_mask:
                        # per-row grammar validity (packed little-endian
                        # bits): mask BEFORE bias/penalties (llama.cpp
                        # grammar order; -inf survives penalty arithmetic)
                        nb = mask_bits.shape[1]
                        expanded = jnp.repeat(mask_bits, 8, axis=1)
                        shifts = jnp.tile(jnp.arange(8, dtype=jnp.uint8), nb)
                        valid = (((expanded >> shifts[None, :]) & 1) > 0)
                        lg = jnp.where(valid[:, : lg.shape[1]], lg, -jnp.inf)
                    if n_bias:
                        lg = sampling_device.apply_bias_rows(
                            lg, bias_ids, bias_vals)
                    penalized = sampling_device.apply_penalties_rows(
                        lg, rings, rp, fp, pp)
                    nxt, mu = sampling_device.sample_rows_u(
                        penalized, u, temp, top_p, top_k, top_k_rows,
                        tfs, typ,
                        miro_mode=mmode if use_miro else None,
                        miro_tau=mtau, miro_eta=meta, miro_mu=mu,
                        n_vocab=n_vocab)
                    rings = rings.at[rows, ring_pos % L].set(nxt)
                    pending = jax.lax.dynamic_update_slice(
                        pending, kv_new.astype(pdtype), (0, 0, 0, j, 0, 0))
                    return (nxt, pending, rings, ring_pos + 1, mu, rng), \
                        (nxt, u)

                carry, (toks_out, us) = jax.lax.scan(
                    body, (toks, pending0, rings, ring_pos, mu, rng),
                    jnp.arange(n_steps, dtype=jnp.int32))
                _, pending, _, _, mu, rng = carry
                kv = kvcache.write_all_layers(kv, pending, n_past_vec)
                return toks_out, us, kv, mu, rng

            if tp:
                loop = jax.jit(
                    self._tp_wrap(loop_body,
                                  ("x", "kv") + ("x",) * 18,
                                  ("x", "x", "kv", "x", "x")),
                    donate_argnums=(2,))
            else:
                loop = jax.jit(loop_body, donate_argnums=(2,))

            self._fwd[key] = loop
        return self._fwd[key]

    def _decode_rows_fn_sp(self, n_steps: int, top_k: int, ring_len: int,
                           n_bias: int = 0, use_miro: bool = False):
        """Batched decode loop in sequence-parallel mode: per-row positions
        over the time-sharded cache (merged-partial attention with the
        chunk's pending K/V appended on device 0 only), ONE local scatter
        per chunk."""
        from jax.sharding import PartitionSpec as P
        from ggllm_tpu.parallel import sp as sp_mod

        inv_freq, dtype, st = self.inv_freq, self.compute_dtype, self.st
        L = ring_len
        kv_dtype = self.cfg.kv_dtype
        n_vocab = self.hp.n_vocab

        def loop_body(params, toks, kv, n_past_vec, temp, top_p,
                      top_k_rows, rp, fp, pp, rings, ring_pos,
                      tfs, typ, bias_ids, bias_vals,
                      mmode, mtau, meta, mu, rng):
            B = toks.shape[0]
            rows = jnp.arange(B, dtype=jnp.int32)
            kvd = kv[0] if isinstance(kv, tuple) else kv
            L_, _, _, Tl, KV_, D_ = kvd.shape  # local time shard
            pdtype = dtype if kv_dtype == "int8" else kvd.dtype
            pending0 = jnp.zeros((L_, 2, B, n_steps, KV_, D_), pdtype)

            def body(carry, j):
                toks, pending, rings, ring_pos, mu, rng = carry
                logits, kv_new = sp_mod.sp_decode_rows(
                    params, toks[:, None], kv, n_past_vec + j, inv_freq,
                    st, pending, j, compute_dtype=dtype)
                rng, sub = jax.random.split(rng)
                keys = jax.random.split(sub, B)
                u = jax.vmap(lambda kk: jax.random.uniform(kk, ()))(keys)
                lg = logits[:, 0]
                if n_bias:
                    lg = sampling_device.apply_bias_rows(
                        lg, bias_ids, bias_vals)
                penalized = sampling_device.apply_penalties_rows(
                    lg, rings, rp, fp, pp)
                nxt, mu = sampling_device.sample_rows_u(
                    penalized, u, temp, top_p, top_k, top_k_rows,
                    tfs, typ,
                    miro_mode=mmode if use_miro else None,
                    miro_tau=mtau, miro_eta=meta, miro_mu=mu,
                    n_vocab=n_vocab)
                rings = rings.at[rows, ring_pos % L].set(nxt)
                pending = jax.lax.dynamic_update_slice(
                    pending, kv_new.astype(pdtype), (0, 0, 0, j, 0, 0))
                return (nxt, pending, rings, ring_pos + 1, mu, rng), (nxt, u)

            carry, (toks_out, us) = jax.lax.scan(
                body, (toks, pending0, rings, ring_pos, mu, rng),
                jnp.arange(n_steps, dtype=jnp.int32))
            _, pending, _, _, mu, rng = carry
            idx = jax.lax.axis_index("model")
            kv = kvcache.write_all_layers(kv, pending, n_past_vec,
                                          local=(idx * Tl, Tl))
            return toks_out, us, kv, mu, rng

        pspecs = sp_mod.sp_param_specs(self.params)
        kvs = sp_mod.kv_spec()
        return jax.jit(jax.shard_map(
            loop_body, mesh=self.mesh,
            in_specs=(pspecs, P(), kvs) + (P(),) * 18,
            out_specs=(P(), P(), kvs, P(), P()),
            check_vma=False,
        ), donate_argnums=(2,))

    def decode_rows(self, toks, n_past_vec, n_steps: int, temp, top_p,
                    top_k: int = 64, rng_key=None, active_rows: int | None = None,
                    top_k_rows=None, repeat_penalty=None, frequency_penalty=None,
                    presence_penalty=None, rings=None, ring_fill=None,
                    tfs_z=None, typical_p=None, bias_ids=None, bias_vals=None,
                    miro_mode=None, miro_tau=None, miro_eta=None, miro_mu=None,
                    mask_bits=None):
        """n_steps fused batched decode steps. toks: (B,) last sampled per
        row. Returns ((n_steps, B) successor ids, rng) — or, when mirostat
        rows are present (miro_mode given), (ids, rng, new_mu, us) with the
        per-row mirostat state and the (n_steps, B) uniform draws consumed
        (us lets tests replay the exact host-cascade sequence).
        active_rows scopes the timing counters to genuinely live rows.

        Per-row sampling knobs (all optional, (B,) arrays): top_k_rows
        tightens the static top_k cap; repeat/frequency/presence penalties
        act over `rings` (B, L) — each row's recent-token window ENDING WITH
        toks[b] (out-of-vocab ids mark empty slots); ring_fill (B,) counts
        valid entries per row; tfs_z/typical_p per-row truncations (1.0 =
        off); bias_ids/bias_vals (B, NB) sparse per-row logit bias
        (id >= n_vocab = empty slot); miro_* per-row mirostat v1/v2 state
        (mode 0 = the standard cascade for that row)."""
        B = self.batch
        if rng_key is None:
            rng_key = jax.random.PRNGKey(0)
        if rings is None:
            rings = np.full((B, 1), self.hp.n_vocab, np.int32)
            ring_fill = np.zeros(B, np.int32)
        rings = np.asarray(rings, np.int32)
        use_miro = miro_mode is not None and bool(np.any(np.asarray(miro_mode)))
        if bias_ids is None:
            bias_ids = np.full((B, 0), self.hp.n_vocab, np.int32)
            bias_vals = np.zeros((B, 0), np.float32)
        bias_ids = np.asarray(bias_ids, np.int32)
        n_bias = bias_ids.shape[1]
        use_mask = mask_bits is not None
        loop = self._decode_rows_fn(n_steps, top_k, rings.shape[1],
                                    n_bias, use_miro, use_mask)

        def arr(x, default, dt=np.float32):
            if x is None:
                x = np.full(B, default, dt)
            return jnp.asarray(np.asarray(x, dt))

        t0 = time.perf_counter()
        largs = (
            self.params, jnp.asarray(np.asarray(toks, np.int32)), self.kv,
            jnp.asarray(np.asarray(n_past_vec, np.int32)),
            arr(temp, 0.0), arr(top_p, 1.0),
            arr(top_k_rows, top_k, np.int32),
            arr(repeat_penalty, 1.0), arr(frequency_penalty, 0.0),
            arr(presence_penalty, 0.0),
            jnp.asarray(rings),
            arr(ring_fill if ring_fill is not None else rings.shape[1],
                rings.shape[1], np.int32),
            arr(tfs_z, 1.0), arr(typical_p, 1.0),
            jnp.asarray(bias_ids),
            jnp.asarray(np.asarray(bias_vals, np.float32)
                        if bias_vals is not None
                        else np.zeros((B, n_bias), np.float32)),
            arr(miro_mode, 0, np.int32), arr(miro_tau, 5.0),
            arr(miro_eta, 0.1), arr(miro_mu, 10.0),
            rng_key)
        if use_mask:
            largs += (jnp.asarray(np.asarray(mask_bits, np.uint8)),)
        out, us, kv, mu_out, rng_key = loop(*largs)
        out = self._fetch(out)
        self.kv = kv
        self.timings.t_decode_us += (time.perf_counter() - t0) * 1e6
        self.timings.n_decode += n_steps * (active_rows if active_rows is not None
                                            else self.batch)
        # (n_steps, B) uniform draws consumed this chunk — lets callers
        # (and the batched==sequential tests) replay the exact cascade
        self.last_us = np.asarray(us)
        if use_miro:
            return out, rng_key, np.asarray(mu_out), self.last_us
        return out, rng_key

    # ------------------------------------------------------------ generate

    def generate(
        self,
        prompt_ids,
        n_predict: int = 128,
        sampler: sampling.SamplerParams | None = None,
        stop_ids: set | None = None,
        stream=None,
    ) -> list[int]:
        """Greedy/sampled generation. Returns generated ids (without prompt).

        Sampler configs covered by the on-device cascade (greedy/temp/top-k/
        top-p, no penalties or mirostat) run DECODE_CHUNK tokens per dispatch
        in a fused jitted loop; anything else falls back to the per-token
        host cascade for exact reference sampling semantics.
        """
        sampler = sampler or sampling.SamplerParams()
        if sampling_device.device_samplable(sampler):
            return self._generate_fused(prompt_ids, n_predict, sampler,
                                        stop_ids or set(), stream)
        state = sampling.SamplerState.init(sampler)
        stop_ids = stop_ids or set()
        prompt_ids = list(map(int, np.asarray(prompt_ids).reshape(-1)))
        last_tokens = list(prompt_ids)

        logits = self.eval(prompt_ids)
        out = []
        for _ in range(n_predict):
            t0 = time.perf_counter()
            tok = sampling.sample(logits, last_tokens, sampler, state, self.cfg.n_ctx)
            self.timings.t_sample_us += (time.perf_counter() - t0) * 1e6
            self.timings.n_sample += 1
            out.append(tok)
            last_tokens.append(tok)
            if stream is not None:
                stream(tok)
            if tok in stop_ids:
                break
            if self.n_past >= self.cfg.n_ctx:
                break
            logits = self._eval_chunk(np.array([tok], dtype=np.int32), logits_all=False)
        return out

    def _generate_fused(self, prompt_ids, n_predict, sampler, stop_ids, stream):
        prompt_ids = list(map(int, np.asarray(prompt_ids).reshape(-1)))
        logits = self.eval(prompt_ids)

        t0 = time.perf_counter()
        tok = sampling.sample(logits, list(prompt_ids), sampler,
                              sampling.SamplerState.init(sampler), self.cfg.n_ctx)
        self.timings.t_sample_us += (time.perf_counter() - t0) * 1e6
        self.timings.n_sample += 1
        out = [tok]
        if stream is not None:
            stream(tok)
        if tok in stop_ids:
            return out

        rng = None
        while len(out) < n_predict:
            chunk = min(self.cfg.decode_chunk, n_predict - len(out),
                        self.cfg.n_ctx - self.n_past)
            if chunk <= 0:
                break
            start = self.n_past
            toks, rng = self.decode_chunk(out[-1], chunk, sampler, rng,
                                          last_tokens=prompt_ids + out)
            self.timings.n_sample += chunk
            stopped = False
            for j, t in enumerate(map(int, toks)):
                out.append(t)
                if stream is not None:
                    stream(t)
                if t in stop_ids:
                    # positions beyond the stop are stale; roll back
                    self.rollback(start + j + 1)
                    stopped = True
                    break
            if stopped:
                break
        return out
