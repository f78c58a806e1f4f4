#!/usr/bin/env python3
"""Summarize the aug-vs-clean DET comparison: FRR at fixed FA/h on the
clean and noisy test splits, from the stats files run.sh wrote."""

import sys


def frr_at(stats_file, fa_per_hour):
    best = 1.0
    with open(stats_file) as f:
        for line in f:
            thr, fa, frr = (float(x) for x in line.split())
            if fa <= fa_per_hour:
                best = min(best, frr)
    return best


def main():
    dirs = sys.argv[1:]
    fa = 2.0
    print(f"{'model':14s} {'clean FRR':>10s} {'noisy FRR':>10s}"
          f"   (@ FA<={fa}/h)")
    for d in dirs:
        clean = frr_at(f"{d}/stats_test.txt", fa)
        noisy = frr_at(f"{d}/stats_test_noisy.txt", fa)
        name = d.rstrip("/").split("/")[-1]
        print(f"{name:14s} {clean:10.4f} {noisy:10.4f}")


if __name__ == "__main__":
    main()
