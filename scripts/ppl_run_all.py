"""Perplexity sweep across quant levels (scripts/ppl-run-all.sh analogue).

Quantizes a source model to each target type (in a temp dir) and runs the
perplexity tool on the given text, reporting ppl per bit-width against the
source-precision run.

  python scripts/ppl_run_all.py --model m.ggcc --text wiki.test.raw \
      [--types q4_0,q5_1,q8_0] [--ctx 512]
"""

import argparse
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--text", required=True)
    ap.add_argument("--types", default="q4_0,q4_1,q5_0,q5_1,q8_0")
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--max-chunks", type=int, default=0)
    args = ap.parse_args()

    def run_ppl(model_path: str) -> str:
        cmd = [sys.executable, "-m", "ggllm_tpu.tools.perplexity",
               "-m", model_path, "-f", args.text, "-c", str(args.ctx)]
        if args.max_chunks:
            cmd += ["--max-chunks", str(args.max_chunks)]
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        return out.stdout.strip().splitlines()[-1]

    print(f"base ({args.model}): {run_ppl(args.model)}")
    with tempfile.TemporaryDirectory() as td:
        for name in args.types.split(","):
            name = name.strip()
            qpath = os.path.join(td, f"model-{name}.ggcc")
            subprocess.run(
                [sys.executable, "-m", "ggllm_tpu.tools.quantize",
                 args.model, qpath, name],
                check=True, capture_output=True)
            print(f"{name}: {run_ppl(qpath)}")
            os.unlink(qpath)


if __name__ == "__main__":
    main()
