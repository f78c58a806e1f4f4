#!/usr/bin/env python3
"""Seeded line shuffle (tools/shuffle_list.py equivalent)."""

import argparse
import random
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=777)
    parser.add_argument("input", nargs="?", default="-")
    args = parser.parse_args()
    f = sys.stdin if args.input == "-" else open(args.input, encoding="utf8")
    lines = f.readlines()
    random.Random(args.seed).shuffle(lines)
    sys.stdout.writelines(lines)


if __name__ == "__main__":
    main()
