"""GBNF grammar-constrained sampling (ops/grammar.py).

Covers the parser (literals/classes/groups/repetition/escapes/comments),
parse-stack semantics (accept/reject strings, completion), byte-level BPE
edge cases (multi-byte codepoints split across tokens, invalid UTF-8
prefixes), mask correctness against a brute-force oracle, and end-to-end
constrained generation: masked greedy decode through the Generator emits
text the grammar accepts even when the unconstrained model would not.
"""

import numpy as np
import pytest

from ggllm_tpu.ops.grammar import (Grammar, GrammarError, GrammarSampler,
                                   parse_gbnf)


def accepts(g: Grammar, text: str) -> bool:
    stacks = g.start()
    for ch in text:
        stacks = g.advance(stacks, ord(ch))
        if not stacks:
            return False
    return Grammar.can_complete(stacks)


def prefix_ok(g: Grammar, text: str) -> bool:
    stacks = g.start()
    for ch in text:
        stacks = g.advance(stacks, ord(ch))
        if not stacks:
            return False
    return True


# ------------------------------------------------------------------ parser


def test_literal_sequence():
    g = parse_gbnf('root ::= "ab" "c"')
    assert accepts(g, "abc")
    assert not accepts(g, "ab")
    assert not accepts(g, "abcd")
    assert not accepts(g, "abd")


def test_alternation_and_group():
    g = parse_gbnf('root ::= ("x" | "yz") "!"')
    assert accepts(g, "x!") and accepts(g, "yz!")
    assert not accepts(g, "y!") and not accepts(g, "xyz!")


def test_char_class_ranges_and_negation():
    g = parse_gbnf("root ::= [a-cx] [^0-9]")
    for first in "abcx":
        assert accepts(g, first + "q")
    assert not accepts(g, "dq")
    assert not accepts(g, "a5")


def test_repetition_star_plus_question():
    g = parse_gbnf('root ::= "a"* "b"+ "c"?')
    for s in ("b", "ab", "aaabb", "bc", "aabbbc"):
        assert accepts(g, s), s
    for s in ("", "a", "ac", "cb", "bcc"):
        assert not accepts(g, s), s


def test_rule_refs_and_recursion():
    g = parse_gbnf("""
        root ::= expr
        expr ::= term ("+" term)*
        term ::= [0-9]+ | "(" expr ")"
    """)
    for s in ("1", "12+3", "(1+2)+(3)", "((7))"):
        assert accepts(g, s), s
    for s in ("", "+1", "(1", "1+", "1++2"):
        assert not accepts(g, s), s


def test_escapes_and_comments():
    g = parse_gbnf('# header comment\n'
                   'root ::= "\\"" [\\t\\-a] "\\n"  # trailing\n')
    assert accepts(g, '"\t\n') and accepts(g, '"-\n') and accepts(g, '"a\n')
    assert not accepts(g, '"b\n')


def test_hex_unicode_escapes():
    g = parse_gbnf('root ::= [\\x41-\\x43] "\\u00e9"')
    assert accepts(g, "Aé") and accepts(g, "Cé")
    assert not accepts(g, "Dé")


def test_dot_any():
    g = parse_gbnf('root ::= "<" . ">"')
    assert accepts(g, "<a>") and accepts(g, "<é>")
    assert not accepts(g, "<>")


def test_empty_alternate_means_optional():
    g = parse_gbnf('root ::= "a" | ')
    assert accepts(g, "") and accepts(g, "a")


def test_parse_errors():
    with pytest.raises(GrammarError):
        parse_gbnf('root ::= "unterminated')
    with pytest.raises(GrammarError):
        parse_gbnf("root ::= [z-a]")
    with pytest.raises(GrammarError):
        parse_gbnf("root ::= undefined-rule")
    with pytest.raises(GrammarError):
        parse_gbnf('other ::= "x"')  # no root
    with pytest.raises(GrammarError):
        parse_gbnf('root ::= "a"\nroot ::= "b"')  # duplicate
    with pytest.raises(GrammarError):
        parse_gbnf('root ::= root "a" | "b"')  # left recursion


def test_continuation_lines():
    g = parse_gbnf('root ::= "a"\n  | "b"\n  | "c"')
    assert accepts(g, "a") and accepts(g, "b") and accepts(g, "c")


# ------------------------------------------------ sampler / token masking


def make_sampler(grammar_text, pieces, eos_id=None):
    pieces = [p.encode() if isinstance(p, str) else p for p in pieces]
    if eos_id is None:
        eos_id = len(pieces)
        pieces = pieces + [b"<eos>"]
    return GrammarSampler(parse_gbnf(grammar_text), pieces, eos_id), eos_id


def test_mask_matches_bruteforce():
    gs, eos = make_sampler(
        'root ::= [ab]+ "." ', ["a", "b", "ab", "ba", ".", "a.", "x", "", "aa."])
    g = gs.grammar

    def brute(state_text):
        ok = []
        for tid, piece in enumerate(gs.pieces):
            if tid == eos or not piece:
                continue
            if prefix_ok(g, state_text + piece.decode()):
                ok.append(tid)
        if accepts(g, state_text):
            ok.append(eos)
        return sorted(ok)

    assert list(gs.valid_token_ids()) == brute("")
    gs.accept(0)  # "a"
    assert list(gs.valid_token_ids()) == brute("a")
    gs.accept(5)  # "a."
    assert list(gs.valid_token_ids()) == [eos]


def test_eos_only_when_complete():
    gs, eos = make_sampler('root ::= "ab"', ["a", "b"])
    assert eos not in gs.valid_token_ids()
    gs.accept(0)
    assert list(gs.valid_token_ids()) == [1]
    gs.accept(1)
    assert list(gs.valid_token_ids()) == [eos]


def test_accept_invalid_raises():
    gs, _ = make_sampler('root ::= "a"', ["a", "z"])
    with pytest.raises(GrammarError):
        gs.accept(1)


def test_multibyte_codepoint_split_across_tokens():
    # é = b"\xc3\xa9"; tokens carry the bytes separately
    gs, eos = make_sampler('root ::= "é!"', [b"\xc3", b"\xa9", b"!", b"\xc3\xa9"])
    ids = list(gs.valid_token_ids())
    assert 0 in ids and 3 in ids and 1 not in ids and 2 not in ids
    gs.accept(0)          # dangling UTF-8 leader held as partial
    assert gs.partial == b"\xc3"
    assert list(gs.valid_token_ids()) == [1]
    gs.accept(1)          # completes é
    assert gs.partial == b""
    assert list(gs.valid_token_ids()) == [2]
    gs.accept(2)
    assert list(gs.valid_token_ids()) == [eos]


def test_invalid_utf8_rejected():
    gs, _ = make_sampler("root ::= .+", [b"\xff", b"\x80", b"ok", b"\xc3"])
    ids = list(gs.valid_token_ids())
    assert 0 not in ids  # 0xff is never valid UTF-8
    assert 1 not in ids  # bare continuation byte
    assert 2 in ids and 3 in ids  # 0xc3 is a feasible leader


def test_overlong_leaders_infeasible_for_ascii():
    # 0xC1 would decode to cp <= 0x7F only via an overlong (invalid)
    # encoding; an ASCII-only grammar must not admit such leaders, or
    # generation dead-ends with an undecodable partial
    gs, _ = make_sampler('root ::= "yes" | "no"',
                         [b"y", b"n", b"\xc1", b"\xe0", b"\xf0"])
    assert list(gs.valid_token_ids()) == [0, 1]


def test_filter_logits():
    gs, eos = make_sampler('root ::= "b"', ["a", "b"])
    logits = np.array([5.0, 1.0, 0.0], np.float32)
    out = gs.filter_logits(logits)
    assert out[0] == -np.inf and out[1] == 1.0 and out[2] == -np.inf
    assert logits[0] == 5.0  # input untouched


def test_mask_cache_reuse():
    gs, _ = make_sampler('root ::= [ab]*', ["a", "b"])
    first = gs.valid_token_ids()
    assert gs.valid_token_ids() is first  # cache hit returns the same array


def test_long_repetition_stack_depth():
    # right-recursive desugaring grows the parse stack linearly; pop
    # cascades at the end must not trip the left-recursion guard
    gs, eos = make_sampler('root ::= [a]* "!"', ["a" * 16, "!"])
    for _ in range(64):  # 1024 'a's
        gs.accept(0)
    gs.accept(1)
    assert list(gs.valid_token_ids()) == [eos]


JSON_GBNF = r"""
root   ::= object
value  ::= object | array | string | number | "true" | "false" | "null"
object ::= "{" ws ( member ( "," ws member )* )? "}" ws
member ::= string ":" ws value
array  ::= "[" ws ( value ( "," ws value )* )? "]" ws
string ::= "\"" char* "\"" ws
char   ::= [^"\\\x00-\x1f] | "\\" (["\\/bfnrt] | "u" [0-9a-fA-F] [0-9a-fA-F] [0-9a-fA-F] [0-9a-fA-F])
number ::= "-"? [0-9]+ ("." [0-9]+)? ws
ws     ::= [ \t\n]*
"""


def test_json_grammar():
    g = parse_gbnf(JSON_GBNF)
    for s in ('{}', '{"a":1}', '{"a": [1, 2.5, {"b":"c\\n"}], "d": null}'):
        assert accepts(g, s), s
    for s in ('', '{', '{"a"}', '{"a":}', "{'a':1}", '{"a":1,}', '[]'):
        assert not accepts(g, s), s


def test_json_import_unchanged_from_llamacpp_files():
    # a grammar file in the wild dialect (comments, multi-line rules)
    g = parse_gbnf('# chess move\nroot ::= move (" " move)*\n'
                   'move ::= [a-h] [1-8] [a-h] [1-8] ("q"|"r"|"b"|"n")?')
    assert accepts(g, "e2e4 e7e8q")
    assert not accepts(g, "i2e4")


# --------------------------------------------------------- end-to-end CLI


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    from ggllm_tpu.core.config import FalconHParams
    from ggllm_tpu.core.dtypes import GGMLType
    from ggllm_tpu.utils.synthetic import write_tiny_model

    path = str(tmp_path_factory.mktemp("grammar") / "tiny.ggcc")
    write_tiny_model(path, FalconHParams.tiny(), ftype_2d=GGMLType.Q8_0,
                     seed=11)
    return path


def _gen_with_grammar(tiny_model, capsysbinary, *extra):
    from ggllm_tpu.tools import main as cli

    rc = cli.main(["-m", tiny_model, "-c", "96", "-b", "32",
                   "--kv-dtype", "float32", "--compute-dtype", "float32",
                   "--temp", "0", "-p", "the", "-n", "8", *extra])
    assert rc in (0, None)
    return capsysbinary.readouterr().out


def test_cli_grammar_constrains_output(tiny_model, capsysbinary):
    plain = _gen_with_grammar(tiny_model, capsysbinary)
    constrained = _gen_with_grammar(tiny_model, capsysbinary,
                                    "--grammar", 'root ::= [0-9]+')
    gen = constrained[len(b"the"):].rstrip(b"\n")  # CLI prints a final \n
    assert gen and gen.isdigit()
    assert plain[len(b"the"):] != gen  # tiny model would not emit digits


def test_cli_grammar_file(tiny_model, capsysbinary, tmp_path):
    f = tmp_path / "g.gbnf"
    f.write_text('root ::= "yes" | "no"')
    out = _gen_with_grammar(tiny_model, capsysbinary,
                            "--grammar-file", str(f))
    assert out[len(b"the"):].rstrip(b"\n") in (b"yes", b"no")


def _grammar_generate(tiny_model, gbnf, device: bool, temp: float = 0.0,
                      n: int = 12):
    from ggllm_tpu.core.config import EngineConfig
    from ggllm_tpu.engine.engine import FalconEngine
    from ggllm_tpu.engine.generator import Generator
    from ggllm_tpu.io.ggcc import read_model
    from ggllm_tpu.io.loader import load_params
    from ggllm_tpu.ops import sampling

    mf = read_model(tiny_model)
    cfg = EngineConfig(n_ctx=96, n_batch=32, kv_dtype="float32",
                       compute_dtype="float32", kernel_layout=True)
    eng = FalconEngine(mf.hparams, load_params(mf, cfg), cfg)
    sampler = sampling.SamplerParams(temp=temp, top_k=40, top_p=0.95,
                                     repeat_penalty=1.1, seed=5)
    g = GrammarSampler(parse_gbnf(gbnf), mf.vocab.id_to_token, 11)
    gen = Generator(eng, sampler, 11, grammar=g)
    gen.grammar_device = device
    toks = []
    logits = gen.prefill([5, 17, 130])
    gen.generate(logits, n, lambda t: toks.append(t) or True)
    return toks, mf.vocab


def test_grammar_device_step_matches_host(tiny_model):
    """The fused masked device step (bit-packed mask upload + on-device
    cascade) must emit the same greedy stream as the host filter path —
    including repeat penalties over the masked logits."""
    ref, _ = _grammar_generate(tiny_model, "root ::= [0-9]+", device=False)
    got, vocab = _grammar_generate(tiny_model, "root ::= [0-9]+", device=True)
    assert got == ref
    assert all(vocab.id_to_token[t].isdigit() for t in got if t != 11)


def test_grammar_device_step_stochastic_valid(tiny_model):
    """Sampled grammar decoding through the device step stays in-grammar
    (token validity is the hard guarantee; the draw itself uses the device
    rng rather than the host's)."""
    toks, vocab = _grammar_generate(tiny_model, "root ::= [0-9]+",
                                    device=True, temp=0.9, n=10)
    assert toks
    assert all(vocab.id_to_token[t].isdigit() for t in toks if t != 11)


def test_grammar_device_step_llama(tmp_path):
    """The fused masked device step is arch-neutral: LLaMA engine, digit
    grammar, device == host greedy stream."""
    from ggllm_tpu.core.config import EngineConfig
    from ggllm_tpu.engine.engine import FalconEngine
    from ggllm_tpu.engine.generator import Generator
    from ggllm_tpu.io.ggcc import read_model
    from ggllm_tpu.io.loader import load_params
    from ggllm_tpu.ops import sampling
    from ggllm_tpu.utils.synthetic import write_tiny_llama

    path = str(tmp_path / "l.ggjt")
    write_tiny_llama(path, seed=13)
    mf = read_model(path)
    cfg = EngineConfig(n_ctx=96, n_batch=32, kv_dtype="float32",
                       compute_dtype="float32", kernel_layout=True)
    outs = []
    for device in (False, True):
        eng = FalconEngine(mf.hparams, load_params(mf, cfg), cfg)
        g = GrammarSampler(parse_gbnf("root ::= [0-9]+"),
                           mf.vocab.id_to_token, 2)
        gen = Generator(eng, sampling.SamplerParams(temp=0.0,
                                                    repeat_penalty=1.0),
                        2, grammar=g)
        gen.grammar_device = device
        toks = []
        logits = gen.prefill([5, 17, 130])
        gen.generate(logits, 10, lambda t: toks.append(t) or True)
        outs.append(toks)
    assert outs[0] == outs[1] and outs[0]


def test_grammar_device_step_int8_kv(tiny_model):
    """The masked device chunk composes with the int8 (codes, scales) KV
    tuple cache: same greedy stream as the host path on the same cache
    dtype."""
    from ggllm_tpu.core.config import EngineConfig
    from ggllm_tpu.engine.engine import FalconEngine
    from ggllm_tpu.engine.generator import Generator
    from ggllm_tpu.io.ggcc import read_model
    from ggllm_tpu.io.loader import load_params
    from ggllm_tpu.ops import sampling

    mf = read_model(tiny_model)
    cfg = EngineConfig(n_ctx=96, n_batch=32, kv_dtype="int8",
                       compute_dtype="float32", kernel_layout=True)
    outs = []
    for device in (False, True):
        eng = FalconEngine(mf.hparams, load_params(mf, cfg), cfg)
        assert isinstance(eng.kv, tuple)
        g = GrammarSampler(parse_gbnf("root ::= [0-9]+"),
                           mf.vocab.id_to_token, 11)
        gen = Generator(eng, sampling.SamplerParams(temp=0.0,
                                                    repeat_penalty=1.0),
                        11, grammar=g)
        gen.grammar_device = device
        toks = []
        logits = gen.prefill([5, 17, 130])
        gen.generate(logits, 10, lambda t: toks.append(t) or True)
        outs.append(toks)
    assert outs[0] == outs[1] and outs[0]
