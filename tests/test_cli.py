"""CLI (tools/main.py) end-to-end behavior on a tiny synthetic model.

Covers the falcon_main surface added for reference flag parity: console
input protocols (falcon_common console_readline semantics), interactive-first,
in-prefix/suffix, prompt-cache-all/-ro session semantics
(falcon_main.cpp:867-871, 1228-1231), --verbose-prompt, --mtest, --export,
--random-prompt, and accepted-but-inert reference compat flags.
"""

import builtins

import numpy as np
import pytest

from ggllm_tpu.core.config import FalconHParams
from ggllm_tpu.core.dtypes import GGMLType
from ggllm_tpu.tools import main as cli


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    from ggllm_tpu.utils.synthetic import write_tiny_model

    path = str(tmp_path_factory.mktemp("cli") / "tiny.ggcc")
    write_tiny_model(path, FalconHParams.tiny(), ftype_2d=GGMLType.Q8_0,
                     seed=11)
    return path


BASE = ["-c", "96", "-b", "32", "--kv-dtype", "float32",
        "--compute-dtype", "float32", "--temp", "0", "--decode-chunk", "4"]


def run_cli(tiny_model, *extra):
    return cli.main(["-m", tiny_model, *BASE, *map(str, extra)])


def feed_input(monkeypatch, lines):
    it = iter(lines)

    def fake_input(prompt_str=""):
        try:
            return next(it)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr(builtins, "input", fake_input)


# ------------------------------------------------- console input protocol

def test_read_line_submits(monkeypatch):
    feed_input(monkeypatch, ["hello"])
    assert cli.read_user_input(False) == "hello\n"


def test_read_backslash_continues(monkeypatch):
    feed_input(monkeypatch, ["one\\", "two"])
    assert cli.read_user_input(False) == "one\ntwo\n"


def test_read_slash_no_newline(monkeypatch):
    feed_input(monkeypatch, ["tail/"])
    assert cli.read_user_input(False) == "tail"


def test_read_multiline_until_backslash(monkeypatch):
    feed_input(monkeypatch, ["a", "b", "c\\"])
    assert cli.read_user_input(True) == "a\nb\nc\n"


def test_read_eof_none(monkeypatch):
    feed_input(monkeypatch, [])
    assert cli.read_user_input(False) is None


def test_read_eof_flushes_partial(monkeypatch):
    feed_input(monkeypatch, ["partial"])
    assert cli.read_user_input(True) == "partial\n"


# ------------------------------------------------------------- basic runs

def test_generate_and_echo(tiny_model, capsysbinary):
    run_cli(tiny_model, "-p", "the", "-n", "4")
    out = capsysbinary.readouterr()
    assert out.out.startswith(b"the")
    assert b"eval time" in out.err


def test_random_prompt(tiny_model, capsysbinary):
    run_cli(tiny_model, "--random-prompt", "-s", "3", "-n", "2")
    out = capsysbinary.readouterr().out
    assert any(out.startswith(p.encode()) for p in cli.RANDOM_PROMPTS)


def test_verbose_prompt_dump(tiny_model, capsysbinary):
    run_cli(tiny_model, "-p", "the", "-n", "2", "--verbose-prompt")
    err = capsysbinary.readouterr().err
    assert b"prompt:" in err and b"->" in err


def test_draft_model_speculative(tiny_model, capsysbinary):
    """--draft-model (self-draft with the same tiny file) must emit the
    SAME text as plain greedy generation plus an acceptance report."""
    run_cli(tiny_model, "-p", "the", "-n", "6")
    plain = capsysbinary.readouterr().out
    run_cli(tiny_model, "-p", "the", "-n", "6",
            "--draft-model", tiny_model, "--draft-k", "3")
    out = capsysbinary.readouterr()
    assert out.out == plain
    assert b"speculative:" in out.err and b"acceptance" in out.err


def test_self_draft_speculative(tiny_model, capsysbinary):
    """--self-draft N (depth-truncated alias of the loaded weights) must
    emit the SAME text as plain greedy generation — no draft file needed."""
    run_cli(tiny_model, "-p", "the", "-n", "6")
    plain = capsysbinary.readouterr().out
    run_cli(tiny_model, "-p", "the", "-n", "6",
            "--self-draft", "1", "--draft-k", "3")
    out = capsysbinary.readouterr()
    assert out.out == plain
    assert b"self-draft: first 1/" in out.err
    assert b"speculative:" in out.err and b"acceptance" in out.err


def test_self_draft_rejects_bad_depth(tiny_model, capsysbinary):
    rc = run_cli(tiny_model, "-p", "the", "-n", "2", "--self-draft", "99")
    assert rc == 1


def test_draft_model_rejects_interactive(tiny_model, capsysbinary):
    rc = run_cli(tiny_model, "-p", "the", "-n", "2",
                 "--draft-model", tiny_model, "--interactive")
    assert rc == 1


def test_compat_flags_accepted(tiny_model, capsysbinary):
    run_cli(tiny_model, "-p", "the", "-n", "2", "-t", "8", "-ngl", "100",
            "--mlock", "--no-mmap", "--main-gpu", "0")
    assert capsysbinary.readouterr().out.startswith(b"the")


def test_mirostat_aliases():
    args = cli.build_argparser().parse_args(
        ["-m", "x", "--mirostat-ent", "4.0", "--mirostat-lr", "0.2"])
    assert args.mirostat_tau == 4.0 and args.mirostat_eta == 0.2


def test_memory_f32_alias():
    args = cli.build_argparser().parse_args(["-m", "x", "--memory-f32"])
    assert args.memory_f32


def test_mtest(tiny_model, capsysbinary):
    assert run_cli(tiny_model, "--mtest") == 0
    assert b"eval time" in capsysbinary.readouterr().err


def test_export_stablehlo(tiny_model, tmp_path, capsysbinary):
    hlo = tmp_path / "fwd.mlir"
    assert run_cli(tiny_model, "--export", str(hlo)) == 0
    text = hlo.read_text()
    assert "module" in text and ("stablehlo" in text or "mhlo" in text)


# ----------------------------------------------------------- interactive

def test_interactive_first_waits_for_input(tiny_model, capsysbinary,
                                           monkeypatch):
    feed_input(monkeypatch, ["ok"])
    run_cli(tiny_model, "-p", "the", "-n", "2", "--interactive-first",
            "--in-prefix", "Q: ", "--in-suffix", " A:")
    out = capsysbinary.readouterr().out
    # the in-suffix is echoed after the user's line, before generation
    assert b" A:" in out


def test_interactive_empty_line_continues(tiny_model, capsysbinary,
                                          monkeypatch):
    feed_input(monkeypatch, [""])
    run_cli(tiny_model, "-p", "the", "-n", "2", "-i")
    # no crash; generation ran at least once
    assert capsysbinary.readouterr().out.startswith(b"the")


# ------------------------------------------------------ session semantics

def test_prompt_cache_saves_prompt_only(tiny_model, tmp_path, capsysbinary):
    sess = tmp_path / "s.npz"
    run_cli(tiny_model, "-p", "the cat sat on", "-n", "6",
            "--prompt-cache", str(sess))
    z = np.load(sess, allow_pickle=False)
    n_prompt = len(z["tokens"])
    # without --prompt-cache-all only the evaluated prompt is kept
    # (generation would have added 6 more)
    assert int(z["n_past"]) == n_prompt

    sess_all = tmp_path / "s_all.npz"
    run_cli(tiny_model, "-p", "the cat sat on", "-n", "6",
            "--prompt-cache", str(sess_all), "--prompt-cache-all")
    z_all = np.load(sess_all, allow_pickle=False)
    assert len(z_all["tokens"]) > n_prompt


def test_prompt_cache_ro_never_writes(tiny_model, tmp_path, capsysbinary):
    sess = tmp_path / "ro.npz"
    run_cli(tiny_model, "-p", "the cat", "-n", "2",
            "--prompt-cache", str(sess), "--prompt-cache-ro")
    assert not sess.exists()


def test_interactive_first_empty_input_generates(tiny_model, capsysbinary,
                                                 monkeypatch):
    """Empty first input under --interactive-first generates from the prompt
    (reference behavior) instead of silently re-prompting."""
    feed_input(monkeypatch, [""])
    run_cli(tiny_model, "-p", "the", "-n", "3", "--interactive-first")
    out = capsysbinary.readouterr().out
    # prompt echo plus at least one generated byte
    assert out.startswith(b"the") and len(out) > len(b"the\n")


def test_compat_low_vram(tiny_model, capsysbinary):
    run_cli(tiny_model, "-p", "the", "-n", "2", "--low-vram")
    assert capsysbinary.readouterr().out.startswith(b"the")


def test_embedding_mode(tiny_model, capsysbinary):
    assert run_cli(tiny_model, "-p", "the", "--embedding") == 0
    out = capsysbinary.readouterr().out.split()
    assert len(out) == 128  # tiny n_embd
    float(out[0])  # parses as numbers


def test_perplexity_mode(tiny_model, tmp_path, capsysbinary):
    f = tmp_path / "text.txt"
    f.write_text("the cat sat on the mat " * 40)
    assert run_cli(tiny_model, "-f", str(f), "--perplexity") == 0
    out = capsysbinary.readouterr().out
    assert b"perplexity:" in out
