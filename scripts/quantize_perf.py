"""Codec micro-benchmark (test-quantize-perf.cpp analogue).

Reports elements/second for quantize / dequantize per format, for both the
numpy reference codecs and the native C++ library.

  python scripts/quantize_perf.py [--type q4_0,q8_0,...] [--n 8388608]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ggllm_tpu import native  # noqa: E402
from ggllm_tpu.core.dtypes import GGMLType, TYPE_TRAITS  # noqa: E402
from ggllm_tpu.quant import registry  # noqa: E402

ALL = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
       GGMLType.Q8_0, GGMLType.Q8_1, GGMLType.Q2_K, GGMLType.Q3_K,
       GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_K]


def rate(fn, *args, iters=3):
    fn(*args)
    t0 = time.perf_counter()
    for _ in range(iters):
        fn(*args)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--type", default=None, help="comma-separated type filter")
    ap.add_argument("--n", type=int, default=4 * 1024 * 1024)
    args = ap.parse_args()

    types = ALL
    if args.type:
        want = {t.strip().lower() for t in args.type.split(",")}
        types = [t for t in ALL if TYPE_TRAITS[t].name.lower() in want]

    x = (np.random.default_rng(0).standard_normal(args.n) * 0.5).astype(np.float32)
    have_native = native.get_lib() is not None
    print(f"n = {args.n} elements; native lib: {'yes' if have_native else 'NO'}")
    print(f"{'type':8s} {'qz-np Melem/s':>14s} {'qz-native':>12s} "
          f"{'dq-np Melem/s':>14s} {'dq-native':>12s}")
    for t in types:
        blob = registry.quantize(t, x, native=False)
        qz_np = args.n / rate(registry.quantize, t, x, False) / 1e6
        dq_np = args.n / rate(registry.dequantize, t, blob, args.n, False) / 1e6
        qz_nat = dq_nat = float("nan")
        if have_native:
            if native.quantize(int(t), x) is not None:
                qz_nat = args.n / rate(native.quantize, int(t), x) / 1e6
            if native.dequantize(int(t), blob, args.n) is not None:
                dq_nat = args.n / rate(native.dequantize, int(t), blob, args.n) / 1e6
        print(f"{TYPE_TRAITS[t].name:8s} {qz_np:14.1f} {qz_nat:12.1f} "
              f"{dq_np:14.1f} {dq_nat:12.1f}")


if __name__ == "__main__":
    main()
