#!/usr/bin/env python3
"""Summarize the aug-vs-clean DET comparison: FRR at fixed FA/h on the
clean and noisy test splits, from the stats files run.sh wrote (via
the library's operating-point helper, eval.det.frr_at_fa_per_hour)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from wekws_tpu.eval import frr_at_fa_per_hour  # noqa: E402


def load_stats(path):
    with open(path) as f:
        return [tuple(float(x) for x in line.split()) for line in f]


def main():
    dirs = sys.argv[1:]
    fa = 2.0
    print(f"{'model':14s} {'clean FRR':>10s} {'noisy FRR':>10s}"
          f"   (@ FA<={fa}/h)")
    for d in dirs:
        clean = frr_at_fa_per_hour(load_stats(f"{d}/stats_test.txt"), fa)
        noisy = frr_at_fa_per_hour(
            load_stats(f"{d}/stats_test_noisy.txt"), fa
        )
        name = d.rstrip("/").split("/")[-1]
        print(f"{name:14s} {clean:10.4f} {noisy:10.4f}")


if __name__ == "__main__":
    main()
