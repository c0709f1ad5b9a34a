"""Continuous batching: batched decode must equal sequential single-stream
generation exactly (greedy, f32), across admissions, mid-chunk finishes,
and slot reuse."""

import numpy as np
import pytest

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.batching import ContinuousBatcher, Request
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.io.ggcc import read_model
from ggllm_tpu.io.loader import load_params
from ggllm_tpu.ops import sampling
from ggllm_tpu.utils.synthetic import write_tiny_model

PROMPTS = [
    [5, 17, 130, 42],
    [300, 301, 302, 303, 304, 305, 306, 307, 308, 309],
    [7, 8],
    [100, 200, 300, 400, 150],
    [42],
]


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cb") / "tiny.ggcc")
    hp = FalconHParams.tiny()
    write_tiny_model(path, hp, ftype_2d=GGMLType.Q8_0, seed=17)
    return read_model(path)


def _cfg():
    return EngineConfig(n_ctx=96, n_batch=16, kv_dtype="float32",
                        compute_dtype="float32")


def _sequential_reference(model, prompts, n_predict):
    greedy = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)
    outs = []
    for p in prompts:
        eng = FalconEngine(model.hparams, load_params(model, _cfg()), _cfg())
        outs.append(eng.generate(p, n_predict=n_predict, sampler=greedy))
    return outs


def test_batched_matches_sequential(model):
    n_predict = 20
    ref = _sequential_reference(model, PROMPTS, n_predict)

    cfg = _cfg()
    eng = FalconEngine(model.hparams, load_params(model, cfg), cfg, batch_size=3)
    cb = ContinuousBatcher(eng, chunk=8)
    reqs = [cb.submit(Request(p, n_predict=n_predict)) for p in PROMPTS]
    cb.run()

    for req, expected in zip(reqs, ref):
        assert req.out == expected, f"request {req.rid} diverged"


def test_batched_stop_ids_and_streaming(model):
    n_predict = 24
    ref = _sequential_reference(model, PROMPTS[:1], n_predict)[0]
    stop = ref[6]

    cfg = _cfg()
    eng = FalconEngine(model.hparams, load_params(model, cfg), cfg, batch_size=2)
    cb = ContinuousBatcher(eng, chunk=8)
    seen = []
    r = cb.submit(Request(PROMPTS[0], n_predict=n_predict,
                          stop_ids=frozenset({stop}), stream=seen.append))
    cb.run()
    assert r.done
    assert r.out == ref[: ref.index(stop) + 1]
    assert seen == r.out


def test_slot_reuse_more_requests_than_rows(model):
    n_predict = 12
    prompts = PROMPTS * 2  # 10 requests through 2 rows
    ref = _sequential_reference(model, prompts, n_predict)
    cfg = _cfg()
    eng = FalconEngine(model.hparams, load_params(model, cfg), cfg, batch_size=2)
    cb = ContinuousBatcher(eng, chunk=8)
    reqs = [cb.submit(Request(p, n_predict=n_predict)) for p in prompts]
    cb.run()
    for req, expected in zip(reqs, ref):
        assert req.out == expected


def test_batched_decode_unrolled_kernel_layout(model):
    """Per-row KV writes through the UNROLLED layer path (kernel layout) —
    the combination the TPU batcher uses (regression: write_layer's vmapped
    branch once expanded dims before the vmap and hit the k/v axis)."""
    cfg = EngineConfig(n_ctx=96, n_batch=16, kv_dtype="float32",
                       compute_dtype="float32", kernel_layout=True)
    eng = FalconEngine(model.hparams, load_params(model, cfg), cfg, batch_size=3)
    cb = ContinuousBatcher(eng, chunk=8)
    reqs = [cb.submit(Request(p, n_predict=10)) for p in PROMPTS[:4]]
    cb.run()
    ref = _sequential_reference(model, PROMPTS[:4], 10)
    for req, expected in zip(reqs, ref):
        assert req.out == expected


class _Replay:
    """np rng stand-in replaying the uniform draws the batched run consumed."""

    def __init__(self, us):
        self.us = list(us)

    def random(self):
        return self.us.pop(0)


def _sequential_replay(model, req: Request, n_predict: int):
    """Single-stream host-cascade generation consuming req.us — the exact
    reference semantics the batched device cascade must reproduce."""
    cfg = _cfg()
    eng = FalconEngine(model.hparams, load_params(model, cfg), cfg)
    params = sampling.SamplerParams(
        temp=req.temp, top_k=req.top_k if req.top_k > 0 else 64,
        top_p=req.top_p, tfs_z=req.tfs_z, typical_p=req.typical_p,
        repeat_penalty=req.repeat_penalty, repeat_last_n=64,
        frequency_penalty=req.frequency_penalty,
        presence_penalty=req.presence_penalty,
        mirostat=req.mirostat, mirostat_tau=req.mirostat_tau,
        mirostat_eta=req.mirostat_eta, logit_bias=dict(req.logit_bias))
    state = sampling.SamplerState(rng=_Replay(req.us),
                                  mu=2.0 * req.mirostat_tau)
    history = list(req.prompt_ids)
    logits = eng.eval(req.prompt_ids)
    out = []
    while len(out) < n_predict:
        tok = sampling.sample(logits, history, params, state, n_ctx=cfg.n_ctx)
        out.append(tok)
        history.append(tok)
        if len(out) >= n_predict:
            break
        logits = eng.eval([tok])
    return out


def test_batched_full_samplers_match_sequential(model):
    """Per-row mirostat v1/v2, logit-bias, tail-free and typical rows in ONE
    batch must equal the host-cascade sequential reference token-for-token
    (the device loop's uniform draws are recorded and replayed through the
    host cascade, so the comparison covers truncation sets, temperature
    placement, inverse-CDF indexing and the adaptive mirostat state)."""
    n_predict = 14
    reqs_spec = [
        Request(PROMPTS[0], n_predict=n_predict, temp=0.0,
                logit_bias={7: 8.0, 19: 6.5}),           # greedy + bias
        Request(PROMPTS[1], n_predict=n_predict, temp=0.9,
                mirostat=2, mirostat_tau=4.0, mirostat_eta=0.15),
        Request(PROMPTS[2], n_predict=n_predict, temp=0.8,
                mirostat=1, mirostat_tau=3.0),
        Request(PROMPTS[3], n_predict=n_predict, temp=0.85, top_k=40,
                tfs_z=0.8, typical_p=0.85, top_p=0.95),
        Request(PROMPTS[4], n_predict=n_predict, temp=0.7, top_k=30,
                top_p=0.9, repeat_penalty=1.15),
    ]

    cfg = _cfg()
    eng = FalconEngine(model.hparams, load_params(model, cfg), cfg,
                       batch_size=3)
    cb = ContinuousBatcher(eng, chunk=5, seed=11)
    reqs = [cb.submit(r) for r in reqs_spec]
    cb.run()

    for req in reqs:
        expected = _sequential_replay(model, req, len(req.out))
        assert req.out == expected, (req.rid, req.out, expected)


def test_batched_llama_matches_sequential(tmp_path_factory):
    """Continuous batching is arch-neutral: LLaMA rows decode together and
    match sequential generation exactly (the reference's server family)."""
    from ggllm_tpu.core.config import LlamaHParams
    from ggllm_tpu.utils.synthetic import write_tiny_llama

    path = str(tmp_path_factory.mktemp("cbl") / "tiny.ggjt")
    write_tiny_llama(path, LlamaHParams.tiny(), ftype_2d=GGMLType.Q8_0,
                     seed=23)
    model = read_model(path)
    prompts = PROMPTS[:3]
    n_predict = 12

    greedy = sampling.SamplerParams(temp=0.0, repeat_penalty=1.0)
    ref = []
    for p in prompts:
        eng = FalconEngine(model.hparams, load_params(model, _cfg()), _cfg())
        ref.append(eng.generate(p, n_predict=n_predict, sampler=greedy))

    eng = FalconEngine(model.hparams, load_params(model, _cfg()), _cfg(),
                       batch_size=2)
    cb = ContinuousBatcher(eng, chunk=4)
    outs = {}
    for i, p in enumerate(prompts):
        cb.submit(Request(prompt_ids=list(p), n_predict=n_predict,
                          temp=0.0, repeat_penalty=1.0,
                          on_done=(lambda i=i: None)))
    reqs = list(cb.queue)
    while cb.queue or cb.active:
        cb.step()
    for i, r in enumerate(reqs):
        outs[i] = r.out
    assert [outs[i] for i in range(len(prompts))] == ref


def test_batched_grammar_rows_match_sequential(model):
    """Grammar-constrained rows mixed with plain rows: per-row validity
    masks in 1-step dispatches; grammar rows must equal the sequential
    Generator grammar path token-for-token (greedy), plain rows must be
    unaffected by the masked mode."""
    from ggllm_tpu.engine.generator import Generator
    from ggllm_tpu.ops.grammar import GrammarSampler, parse_gbnf
    from ggllm_tpu.utils.synthetic import make_tiny_vocab

    vocab = make_tiny_vocab(model.hparams.n_vocab)
    gbnf = "root ::= [0-9]+"

    def gs():
        return GrammarSampler(parse_gbnf(gbnf), vocab.id_to_token, 11)

    n_predict = 8
    cfg = _cfg()
    eng = FalconEngine(model.hparams, load_params(model, cfg), cfg,
                       batch_size=3)
    cb = ContinuousBatcher(eng, chunk=4)
    reqs = [
        cb.submit(Request(PROMPTS[0], n_predict=n_predict,
                          grammar_sampler=gs())),
        cb.submit(Request(PROMPTS[1], n_predict=n_predict)),  # plain row
        cb.submit(Request(PROMPTS[2], n_predict=n_predict,
                          grammar_sampler=gs())),
    ]
    cb.run()

    # sequential reference: Generator host-grammar path per request
    for i, req in enumerate(reqs):
        cfg1 = _cfg()
        e1 = FalconEngine(model.hparams, load_params(model, cfg1), cfg1)
        g = gs() if i != 1 else None
        gen = Generator(e1, sampling.SamplerParams(temp=0.0,
                                                   repeat_penalty=1.0),
                        11, grammar=g)
        gen.grammar_device = False  # host reference path
        toks = []
        logits = gen.prefill(PROMPTS[i])
        gen.generate(logits, n_predict, lambda t: toks.append(t) or True)
        assert req.out == toks, (i, req.out, toks)
        if i != 1:
            assert all(vocab.id_to_token[t].isdigit()
                       for t in req.out if t != 11)


def test_batcher_top_k_zero_clamps_to_cap(model):
    """Direct batcher use with top_k=0 (reference semantics: full vocab)
    CLAMPS to the 64-candidate device cap — documented degradation, and
    identical to an explicit top_k=64 request (not silently different)."""
    cfg = _cfg()
    outs = []
    for tk in (0, 64):
        eng = FalconEngine(model.hparams, load_params(model, cfg), cfg,
                           batch_size=2)
        cb = ContinuousBatcher(eng, chunk=4, seed=9)
        req = cb.submit(Request(PROMPTS[0], n_predict=8, temp=0.9,
                                top_k=tk))
        cb.run()
        outs.append(req.out)
    assert outs[0] == outs[1]


def test_chunked_admission_interleaves_decode(model):
    """A long-prompt admission must NOT stall in-flight rows for its whole
    prompt: with prefill_chunk=4, a 16-token prompt takes 4 prefill steps,
    and the already-live row keeps producing tokens between them."""
    cfg = _cfg()
    eng = FalconEngine(model.hparams, load_params(model, cfg), cfg,
                       batch_size=2)
    cb = ContinuousBatcher(eng, chunk=2, prefill_chunk=4)
    r1 = cb.submit(Request(PROMPTS[0], n_predict=30))
    cb.step()  # r1 admitted + prefilled (short prompt) + first decode
    assert not cb.prefilling and len(r1.out) >= 1

    long_prompt = (PROMPTS[1] * 8)[:16]
    r2 = cb.submit(Request(long_prompt, n_predict=4))
    progress = []  # r1 tokens produced during each step r2 was mid-prefill
    while r2.row < 0 or cb.prefilling:
        before = len(r1.out)
        cb.step()
        if cb.prefilling:
            progress.append(len(r1.out) - before)
    # r1 advanced during r2's chunked prefill (interleaving, not a stall)
    assert sum(progress) > 0, progress
    cb.run()
    assert len(r2.out) == 4 and r1.done

    # interleaved admission must not change results: same request on a
    # fresh batcher with whole-prompt prefill chunks
    eng2 = FalconEngine(model.hparams, load_params(model, cfg), cfg,
                        batch_size=2)
    cb2 = ContinuousBatcher(eng2, chunk=2, prefill_chunk=512)
    r3 = cb2.submit(Request(long_prompt, n_predict=4))
    cb2.run()
    assert r3.out == r2.out
