"""HTTP server tests against a tiny synthetic model (CPU).

Covers the reference server surface (examples/server/server.cpp:784-895):
/tokenize, /detokenize, /completion (blocking + SSE streaming), stop strings,
and KV prefix reuse across requests.
"""

import json
import threading
import urllib.request

import pytest

from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.engine.engine import FalconEngine
from ggllm_tpu.io.ggcc import read_model
from ggllm_tpu.io.loader import load_params
from ggllm_tpu.server.app import ServerState, serve, _common_part
from ggllm_tpu.utils.stream import partial_stop as _partial_stop
from ggllm_tpu.utils.synthetic import write_tiny_model


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("srv") / "tiny.ggcc")
    hp = FalconHParams.tiny()
    write_tiny_model(path, hp, ftype_2d=GGMLType.Q8_0, seed=5)
    mf = read_model(path)
    cfg = EngineConfig(n_ctx=128, n_batch=32, kv_dtype="float32",
                       compute_dtype="float32")
    params = load_params(mf, cfg)
    engine = FalconEngine(mf.hparams, params, cfg)
    httpd = serve(engine, mf.vocab, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, path, body):
    req = urllib.request.Request(
        url + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_root(server):
    with urllib.request.urlopen(server + "/", timeout=30) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok"
    assert info["model"]["n_layer"] == 2


def test_tokenize_roundtrip(server):
    out = _post(server, "/tokenize", {"content": "hello world"})
    assert isinstance(out["tokens"], list) and out["tokens"]
    back = _post(server, "/detokenize", {"tokens": out["tokens"]})
    assert back["content"] == "hello world"


def test_completion_blocking(server):
    out = _post(server, "/completion",
                {"prompt": "ab", "n_predict": 4, "temperature": 0.0})
    assert out["stop"] is True
    assert out["tokens_predicted"] >= 1
    assert "content" in out and "timings" in out


def test_completion_grammar(server):
    out = _post(server, "/completion",
                {"prompt": "the", "n_predict": 8, "temperature": 0,
                 "grammar": 'root ::= [0-9]+'})
    assert out["content"] and out["content"].isdigit()


def test_completion_grammar_error(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/completion",
              {"prompt": "the", "n_predict": 4, "grammar": "root ::= [z-a]"})
    assert e.value.code == 400


def test_completion_prefix_reuse(server):
    a = _post(server, "/completion",
              {"prompt": "abcd", "n_predict": 2, "temperature": 0.0})
    b = _post(server, "/completion",
              {"prompt": "abcd", "n_predict": 2, "temperature": 0.0})
    assert b["tokens_evaluated"] <= a["tokens_evaluated"]
    assert b["content"] == a["content"]  # deterministic greedy + same state


def test_completion_streaming(server):
    req = urllib.request.Request(
        server + "/completion",
        data=json.dumps({"prompt": "ab", "n_predict": 4,
                         "temperature": 0.0, "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    chunks = []
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for line in r:
            line = line.strip()
            if line.startswith(b"data: "):
                chunks.append(json.loads(line[6:]))
    assert chunks and chunks[-1]["stop"] is True
    assert all(not c["stop"] for c in chunks[:-1])


def test_common_part_and_partial_stop():
    assert _common_part([1, 2, 3], [1, 2, 4]) == 2
    assert _partial_stop(b"hello <|e", [b"<|endoftext|>"]) == 3
    assert _partial_stop(b"hello", [b"<|endoftext|>"]) == 0


def test_truncation_never_exceeds_ctx(server):
    # regression: prompts >= n_ctx with large n_predict once kept the whole
    # prompt (slice[-0:]) and pushed n_past past n_ctx
    long_prompt = "ab " * 300  # tokenizes past n_ctx=128
    out = _post(server, "/completion",
                {"prompt": long_prompt, "n_predict": 64, "temperature": 0.0})
    assert out["stop"] is True
    assert out["tokens_evaluated"] + 64 <= 128 + 1


# ------------------------------------------------------- batched serving


@pytest.fixture(scope="module")
def batched_server(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bsrv") / "tiny.ggcc")
    hp = FalconHParams.tiny()
    write_tiny_model(path, hp, ftype_2d=GGMLType.Q8_0, seed=8)
    mf = read_model(path)
    cfg = EngineConfig(n_ctx=128, n_batch=32, kv_dtype="float32",
                       compute_dtype="float32")
    params = load_params(mf, cfg)
    engine = FalconEngine(mf.hparams, params, cfg, batch_size=3)
    from ggllm_tpu.server.app import serve as serve_fn

    httpd = serve_fn(engine, mf.vocab, port=0, parallel=3, chunk=4)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.state.shutdown()
    httpd.shutdown()


def test_batched_completion(batched_server):
    out = _post(batched_server, "/completion",
                {"prompt": "ab", "n_predict": 6, "temperature": 0.0,
                 "repeat_penalty": 1.0})
    assert out["stop"] is True
    assert out["tokens_predicted"] >= 1
    assert out["stopped_reason"] in ("limit", "eos", "stop")


def test_batched_concurrent_requests(batched_server):
    """Concurrent requests batch together and all complete with the same
    output a sequential run produces (greedy determinism)."""
    import concurrent.futures

    def one(prompt):
        return _post(batched_server, "/completion",
                     {"prompt": prompt, "n_predict": 8, "temperature": 0.0,
                      "repeat_penalty": 1.0})

    prompts = ["hello a", "the theatre", "in another"]
    with concurrent.futures.ThreadPoolExecutor(3) as ex:
        concurrent_out = list(ex.map(one, prompts))
    sequential_out = [one(p) for p in prompts]
    for c, s in zip(concurrent_out, sequential_out):
        assert c["content"] == s["content"]
        assert c["stop"] is True


def test_batched_default_sampler_with_penalties(batched_server):
    """The DEFAULT sampler (temp 0.8, repeat_penalty 1.1) runs batched."""
    out = _post(batched_server, "/completion",
                {"prompt": "ab cd", "n_predict": 8, "seed": 3})
    assert out["stop"] is True
    assert out["tokens_predicted"] >= 1


def test_batched_rejects_unsupported_sampler(batched_server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(batched_server, "/completion",
              {"prompt": "x", "n_predict": 2, "penalize_nl": False})
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(batched_server, "/completion",
              {"prompt": "x", "n_predict": 2, "temperature": 0.8,
               "top_k": 500})
    assert ei.value.code == 400


def test_batched_full_cascade_accepted(batched_server):
    """mirostat / tfs / typical / logit_bias / ignore_eos now run batched
    (round-3 device cascade); the server must route them, not 400."""
    for extra in ({"mirostat": 2, "seed": 5},
                  {"tfs_z": 0.9, "typical_p": 0.9, "seed": 5},
                  {"logit_bias": [[5, False], [7, 2.0]], "ignore_eos": True,
                   "temperature": 0.0}):
        out = _post(batched_server, "/completion",
                    {"prompt": "ab", "n_predict": 4, **extra})
        assert out["stop"] is True
        assert out["tokens_predicted"] >= 1
        assert out["stopped_eos"] is False


def test_batched_streaming(batched_server):
    req = urllib.request.Request(
        batched_server + "/completion",
        data=json.dumps({"prompt": "ab", "n_predict": 6,
                         "temperature": 0.0, "repeat_penalty": 1.0,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    chunks = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for line in r:
            line = line.strip()
            if line.startswith(b"data: "):
                chunks.append(json.loads(line[6:]))
    assert chunks and chunks[-1]["stop"] is True


def test_openai_completions(server):
    """OpenAI-compatible /v1/completions: schema + usage accounting."""
    out = _post(server, "/v1/completions",
                {"prompt": "ab", "max_tokens": 4, "temperature": 0.0})
    assert out["object"] == "text_completion"
    c = out["choices"][0]
    assert c["index"] == 0 and c["finish_reason"] == "length"
    assert isinstance(c["text"], str)
    u = out["usage"]
    assert u["completion_tokens"] >= 1
    assert u["total_tokens"] == u["prompt_tokens"] + u["completion_tokens"]
    # matches the native endpoint's greedy output
    native = _post(server, "/completion",
                   {"prompt": "ab", "n_predict": 4, "temperature": 0.0})
    assert c["text"] == native["content"]


def test_openai_chat_completions(server):
    out = _post(server, "/v1/chat/completions",
                {"messages": [{"role": "system", "content": "be brief"},
                              {"role": "user", "content": "hi"}],
                 "max_tokens": 4, "temperature": 0.0})
    assert out["object"] == "chat.completion"
    msg = out["choices"][0]["message"]
    assert msg["role"] == "assistant" and isinstance(msg["content"], str)


def test_openai_streaming(server):
    req = urllib.request.Request(
        server + "/v1/completions",
        data=json.dumps({"prompt": "ab", "max_tokens": 4,
                         "temperature": 0.0, "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    chunks, done = [], False
    with urllib.request.urlopen(req, timeout=120) as r:
        for line in r:
            line = line.strip()
            if line == b"data: [DONE]":
                done = True
            elif line.startswith(b"data: "):
                chunks.append(json.loads(line[6:]))
    assert done
    assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")
    text = "".join(c["choices"][0].get("text", "") for c in chunks)
    native = _post(server, "/completion",
                   {"prompt": "ab", "n_predict": 4, "temperature": 0.0})
    assert text == native["content"]


def test_openai_models_and_metrics(server):
    with urllib.request.urlopen(server + "/v1/models", timeout=30) as r:
        models = json.loads(r.read())
    assert models["object"] == "list" and models["data"]
    with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
        body = r.read().decode()
    assert "ggllm_requests_total" in body
    assert "# TYPE ggllm_generated_tokens_total counter" in body


def test_completion_reference_fields(server):
    """The reference's response schema (server.cpp:650-662): model alias,
    prompt echo, truncated, stopped_* booleans, stopping_word,
    generation_settings."""
    out = _post(server, "/completion",
                {"prompt": "the", "n_predict": 3, "temperature": 0})
    assert out["stopped_limit"] is True
    assert out["stopped_eos"] is False and out["stopped_word"] is False
    assert out["stopping_word"] == ""
    assert out["truncated"] is False
    assert out["prompt"] == "the"
    assert "model" in out
    gs = out["generation_settings"]
    assert gs["temp"] == 0 and gs["n_predict"] == 3
    assert gs["ignore_eos"] is False


def test_completion_ignore_eos(server):
    out = _post(server, "/completion",
                {"prompt": "the", "n_predict": 3, "temperature": 0,
                 "ignore_eos": True})
    assert out["generation_settings"]["ignore_eos"] is True
    assert out["stopped_eos"] is False


def test_completion_stopping_word(server):
    # find what greedy produces, then use its first chars as a stop string
    free = _post(server, "/completion",
                 {"prompt": "the", "n_predict": 6, "temperature": 0})
    text = free["content"]
    if not text:
        pytest.skip("tiny model produced no stop-able text")
    stop = text[: max(1, len(text) // 2)]
    out = _post(server, "/completion",
                {"prompt": "the", "n_predict": 6, "temperature": 0,
                 "stop": [stop]})
    assert out["stopped_word"] is True
    assert out["stopping_word"] == stop
    assert out["stopped_limit"] is False


def test_ignore_eos_reports_eos_specifically(server):
    # a non-EOS ban must NOT report ignore_eos (server.cpp checks eos only)
    out = _post(server, "/completion",
                {"prompt": "the", "n_predict": 2, "temperature": 0,
                 "logit_bias": [[5, False]]})
    assert out["generation_settings"]["ignore_eos"] is False


def test_batched_response_has_generation_settings(batched_server):
    out = _post(batched_server, "/completion",
                {"prompt": "the", "n_predict": 3, "temperature": 0})
    gs = out["generation_settings"]
    assert gs["n_predict"] == 3 and gs["temp"] == 0
    assert out["stopped_limit"] is True


# ----------------------------------------------- speculative serving

@pytest.fixture(scope="module")
def spec_server(tmp_path_factory):
    """Server with --self-draft 1 speculative decoding, plus a plain server
    over the SAME weights for identity checks."""
    import dataclasses

    from ggllm_tpu.engine.speculative import SpeculativeDecoder, truncate_params

    path = str(tmp_path_factory.mktemp("spsrv") / "tiny.ggcc")
    hp = FalconHParams.tiny()
    write_tiny_model(path, hp, ftype_2d=GGMLType.Q8_0, seed=6)
    mf = read_model(path)
    cfg = EngineConfig(n_ctx=128, n_batch=32, kv_dtype="float32",
                       compute_dtype="float32")

    params = load_params(mf, cfg)
    engine = FalconEngine(mf.hparams, params, cfg)
    dhp = dataclasses.replace(mf.hparams, n_layer=1)
    draft = FalconEngine(dhp, truncate_params(params, 1), cfg)
    httpd = serve(engine, mf.vocab, port=0, draft_engine=draft, draft_k=3)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()

    plain = serve(FalconEngine(mf.hparams, load_params(mf, cfg), cfg),
                  mf.vocab, port=0)
    t2 = threading.Thread(target=plain.serve_forever, daemon=True)
    t2.start()
    yield (f"http://127.0.0.1:{httpd.server_address[1]}",
           f"http://127.0.0.1:{plain.server_address[1]}")
    httpd.shutdown()
    plain.shutdown()


def test_spec_server_greedy_identical(spec_server):
    """Greedy completions through the speculative server must be
    id-identical to the plain server over the same weights."""
    spec_url, plain_url = spec_server
    body = {"prompt": "abcd", "n_predict": 12, "temperature": 0.0,
            "repeat_penalty": 1.0}
    a = _post(spec_url, "/completion", body)
    b = _post(plain_url, "/completion", body)
    assert a["content"] == b["content"]
    assert a["tokens_predicted"] == b["tokens_predicted"]
    sp = a.get("speculative")
    assert sp and sp["rounds"] > 0  # it really took the fused spec path
    assert "speculative" not in b


def test_spec_server_prefix_reuse_and_metrics(spec_server):
    """Consecutive spec requests reuse the common prefix on BOTH caches and
    /metrics exports the speculative counters."""
    spec_url, plain_url = spec_server
    a = _post(spec_url, "/completion",
              {"prompt": "abcdef", "n_predict": 4, "temperature": 0.0,
               "repeat_penalty": 1.0})
    b = _post(spec_url, "/completion",
              {"prompt": "abcdef" + a["content"], "n_predict": 4,
               "temperature": 0.0, "repeat_penalty": 1.0})
    assert b["tokens_predicted"] >= 1
    with urllib.request.urlopen(spec_url + "/metrics", timeout=30) as r:
        text = r.read().decode()
    assert "ggllm_spec_rounds_total" in text
    rounds = [line for line in text.splitlines()
              if line.startswith("ggllm_spec_rounds_total")]
    assert float(rounds[0].split()[-1]) > 0


def test_spec_server_sampled_and_fallback(spec_server):
    """temp>0 penalty-free requests ride the stochastic fused rounds;
    penalty configs fall back to the Generator path (no speculative block)."""
    spec_url, _ = spec_server
    a = _post(spec_url, "/completion",
              {"prompt": "ab", "n_predict": 6, "temperature": 0.9,
               "top_k": 40, "top_p": 0.95, "repeat_penalty": 1.0, "seed": 3})
    assert a["tokens_predicted"] >= 1
    assert a.get("speculative", {}).get("rounds", 0) > 0
    b = _post(spec_url, "/completion",
              {"prompt": "ab", "n_predict": 4, "temperature": 0.9,
               "repeat_penalty": 1.3, "seed": 3})
    assert "speculative" not in b and b["tokens_predicted"] >= 1


def test_spec_server_streaming_and_stops(spec_server):
    """SSE streaming over fused rounds, and stop-string holdback."""
    spec_url, plain_url = spec_server
    body = {"prompt": "abc", "n_predict": 10, "temperature": 0.0,
            "repeat_penalty": 1.0, "stream": True}

    def stream_chunks(url):
        req = urllib.request.Request(
            url + "/completion", data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        chunks = []
        with urllib.request.urlopen(req, timeout=120) as r:
            for line in r:
                line = line.strip()
                if line.startswith(b"data: "):
                    chunks.append(json.loads(line[6:]))
        return [c["content"] for c in chunks
                if not c.get("stop") and c.get("content")]

    # both paths emit one SSE chunk per token piece, so the chunk streams
    # (including per-chunk utf-8 replacement handling) must be identical
    assert stream_chunks(spec_url) == stream_chunks(plain_url)


def test_batched_grammar_requests(batched_server):
    """Grammar-constrained requests in batched serving: per-row masks;
    concurrent grammar + plain requests both complete and the grammar
    output obeys the constraint."""
    from concurrent.futures import ThreadPoolExecutor

    def gram(i):
        return _post(batched_server, "/completion",
                     {"prompt": f"x{i}", "n_predict": 6, "temperature": 0,
                      "grammar": "root ::= [0-9]+"})

    def plain(i):
        return _post(batched_server, "/completion",
                     {"prompt": f"y{i}", "n_predict": 6, "temperature": 0})

    with ThreadPoolExecutor(4) as ex:
        g1 = ex.submit(gram, 1)
        p1 = ex.submit(plain, 1)
        g2 = ex.submit(gram, 2)
        outs = [g1.result(timeout=300), p1.result(timeout=300),
                g2.result(timeout=300)]
    assert outs[0]["content"] and outs[0]["content"].isdigit()
    assert outs[2]["content"] and outs[2]["content"].isdigit()
    assert outs[1]["tokens_predicted"] >= 1


def test_batched_cap_violations_rejected_documentedly(batched_server):
    """Every documented batched-mode cap, probed AT and BEYOND the bound:
    requests beyond a cap are REJECTED with a clear message (never silently
    approximated); requests at the bound run."""
    import urllib.error

    # top_k: beyond cap and full-vocab (0) both rejected at temp>0
    for tk in (65, 500, 0):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(batched_server, "/completion",
                  {"prompt": "x", "n_predict": 2, "temperature": 0.8,
                   "top_k": tk})
        assert ei.value.code == 400
        assert "top_k" in json.loads(ei.value.read())["error"]
    # at the bound: accepted
    ok = _post(batched_server, "/completion",
               {"prompt": "x", "n_predict": 2, "temperature": 0.8,
                "top_k": 64})
    assert ok["tokens_predicted"] >= 1

    # logit_bias: 64 explicit entries + ignore_eos -> 65 merged -> rejected
    # (ids chosen to not collide with eos=11, or the merge would stay at 64)
    bias = [[100 + i, 1.0] for i in range(64)]
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(batched_server, "/completion",
              {"prompt": "x", "n_predict": 2, "logit_bias": bias,
               "ignore_eos": True})
    assert ei.value.code == 400
    assert "logit_bias" in json.loads(ei.value.read())["error"]
    # the same 64 entries WITHOUT ignore_eos fit the device arrays
    ok = _post(batched_server, "/completion",
               {"prompt": "x", "n_predict": 2, "logit_bias": bias})
    assert ok["tokens_predicted"] >= 1
