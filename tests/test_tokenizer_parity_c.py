"""Codepoint-class parity vs the reference C++ classifier, and the generator
for tokenizer/_class_overrides.py.

Compiles the reference's cmpnct_unicode.cpp (read-only, /root/reference) as a
throwaway shared library with a tiny extern-C shim and checks that
tokenizer.unicode.char_class matches CNCTUnicode::get_code_type
(cmpnct_unicode.cpp:98) projected onto the 4-way partition the pretokenizer
depends on (DIGIT->0, LETTER->1, WHITESPACE->2, everything else -> 3:
ACCENT_MARK / PUNCTUATION / SYMBOL / CONTROL / UNIDENTIFIED are all "special"
to bpe.py's state machine).

Regenerating the override table after a unicodedata upgrade:

    python tests/test_tokenizer_parity_c.py --regen

writes a fresh ggllm_tpu/tokenizer/_class_overrides.py. The table holds the
codepoints where Python's unicodedata disagrees with the reference's frozen
range tables, so our classifier reproduces the reference bit-for-bit.

Skipped when the reference tree or a C++ compiler is unavailable — the golden
tokenizer tests in test_tokenizer.py still guard behavior in that case.
"""

import os
import shutil
import subprocess
import sys

REF = "/root/reference"
MAX_CP = 0x110000

SHIM = r"""
#include "cmpnct_unicode.cpp"
extern "C" int ref_class(int c) {
    switch (CNCTUnicode::get_code_type(c)) {
        case DIGIT: return 0;
        case LETTER: return 1;
        case WHITESPACE: return 2;
        default: return 3;
    }
}
"""


def build_oracle(build_dir: str):
    """Compile the reference classifier into a ctypes oracle: int -> class."""
    import ctypes

    src = os.path.join(build_dir, "shim.cpp")
    lib = os.path.join(build_dir, "librefuni.so")
    with open(src, "w") as f:
        f.write(SHIM)
    cmd = ["c++", "-O2", "-fPIC", "-shared", "-std=c++11", "-I", REF,
           src, "-o", lib]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"reference build failed: {proc.stderr[-2000:]}")
    dll = ctypes.CDLL(lib)
    dll.ref_class.restype = ctypes.c_int
    dll.ref_class.argtypes = [ctypes.c_int]
    return dll.ref_class


def base_class(c: int) -> int:
    """Our classifier WITHOUT the override table (what it derives from
    unicodedata alone) — the diff against the oracle IS the table."""
    import unicodedata

    from ggllm_tpu.tokenizer import unicode as ucls

    ch = chr(c)
    cat = unicodedata.category(ch)
    if cat.startswith("L"):
        return ucls.LETTER
    if cat == "Nd":
        return ucls.DIGIT
    if cat in ("Zs", "Zl", "Zp") or ch in ucls._EXTRA_WS:
        return ucls.WHITESPACE
    return ucls.OTHER


def compute_override_ranges(oracle):
    """All (start, end, ref_class) ranges where unicodedata disagrees with
    the reference classifier."""
    diffs = []
    for c in range(MAX_CP):
        if 0xD800 <= c <= 0xDFFF:  # surrogates never appear in decoded text
            continue
        r = oracle(c)
        if r != base_class(c):
            diffs.append((c, r))
    ranges = []
    for c, r in diffs:
        if ranges and ranges[-1][1] == c - 1 and ranges[-1][2] == r:
            ranges[-1] = (ranges[-1][0], c, r)
        else:
            ranges.append((c, c, r))
    return ranges


def test_char_class_matches_reference(tmp_path):
    import pytest

    if not (os.path.isdir(REF) and shutil.which("c++")):
        pytest.skip("reference tree or C++ compiler unavailable")
    from ggllm_tpu.tokenizer import unicode as ucls

    oracle = build_oracle(str(tmp_path))
    bad = []
    for c in range(MAX_CP):
        if 0xD800 <= c <= 0xDFFF:
            continue
        if oracle(c) != ucls.char_class(chr(c)):
            bad.append(c)
            if len(bad) >= 20:
                break
    assert not bad, (
        f"{len(bad)}+ codepoints diverge from the reference classifier, "
        f"first: {[hex(c) for c in bad[:10]]} — regenerate the override "
        f"table: python tests/test_tokenizer_parity_c.py --regen"
    )


def regen():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        oracle = build_oracle(td)
        ranges = compute_override_ranges(oracle)
    out = os.path.join(here, "ggllm_tpu", "tokenizer", "_class_overrides.py")
    with open(out, "w") as f:
        f.write('"""Generated codepoint-class overrides.\n\n'
                "Produced by behavioral comparison against the reference classifier\n"
                "(cmpnct_unicode.cpp get_code_type compiled as an oracle): codepoints where\n"
                "modern unicodedata disagrees with the reference tables on the 4-way\n"
                "{DIGIT(0), LETTER(1), WHITESPACE(2), OTHER(3)} partition the pretokenizer\n"
                'depends on. Regenerate with tests/test_tokenizer_parity_c.py helpers.\n"""\n\n'
                "# (start_codepoint, end_codepoint, reference_class)\n"
                "OVERRIDE_RANGES = (\n")
        for s, e, t in ranges:
            f.write(f"    (0x{s:04X}, 0x{e:04X}, {t}),\n")
        f.write(")\n")
    print(f"wrote {len(ranges)} ranges to {out}")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        regen()
    else:
        print(__doc__)
