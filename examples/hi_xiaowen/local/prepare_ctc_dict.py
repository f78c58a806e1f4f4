#!/usr/bin/env python3
"""Build the CTC token dict for the hi_xiaowen keywords.

Produces dict/dict.txt (``token id`` with <blank>=0, <filler> as unk)
and dict/words.txt (lexicon: word -> chars) from the keyword strings;
transcript coverage beyond the keywords maps to <filler>.
"""

import argparse
import os

KEYWORDS = ["嗨小问", "你好问问"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("resource_dir", nargs="?", default=None)
    parser.add_argument("out_dir")
    args = parser.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    chars = []
    for kw in KEYWORDS:
        for ch in kw:
            if ch not in chars:
                chars.append(ch)
    with open(os.path.join(args.out_dir, "dict.txt"), "w",
              encoding="utf-8") as f:
        f.write("<blank> 0\n")
        for i, ch in enumerate(chars, start=1):
            f.write(f"{ch} {i}\n")
        f.write(f"<filler> {len(chars) + 1}\n")
    with open(os.path.join(args.out_dir, "words.txt"), "w",
              encoding="utf-8") as f:
        for kw in KEYWORDS:
            f.write(kw + " " + " ".join(kw) + "\n")


if __name__ == "__main__":
    main()
