#!/usr/bin/env python3
"""Prepare mobvoi_hotword data into wav.scp/text tables.

Merges the positive (p_*) and negative (n_*) json splits of the Mobvoi
hotword dataset (same source layout the reference recipe consumes:
utt entries with utt_id + keyword_id; keyword_id -1 = filler).
"""

import argparse
import json
import os


def main():
    parser = argparse.ArgumentParser(description="prepare mobvoi data")
    parser.add_argument("wav_dir", help="dir containing all wav files")
    parser.add_argument("resource_dir", help="dir with {p,n}_{split}.json")
    parser.add_argument("dict_file", help="dict.txt: token id per line")
    parser.add_argument("split", choices=["train", "dev", "test"])
    parser.add_argument("out_dir")
    args = parser.parse_args()

    id2token = {}
    with open(args.dict_file, encoding="utf-8") as f:
        for line in f:
            token, idx = line.strip().split()
            id2token[int(idx)] = token

    os.makedirs(args.out_dir, exist_ok=True)
    abs_dir = os.path.abspath(args.wav_dir)
    with open(os.path.join(args.out_dir, "wav.scp"), "w",
              encoding="utf-8") as f_wav, \
         open(os.path.join(args.out_dir, "text"), "w",
              encoding="utf-8") as f_text:
        for prefix in ["p", "n"]:
            path = os.path.join(
                args.resource_dir, f"{prefix}_{args.split}.json"
            )
            with open(path, encoding="utf-8") as f:
                for entry in json.load(f):
                    utt = entry["utt_id"]
                    token = id2token[int(entry["keyword_id"])]
                    f_wav.write(
                        f"{utt} {os.path.join(abs_dir, utt + '.wav')}\n"
                    )
                    f_text.write(f"{utt} {token}\n")


if __name__ == "__main__":
    main()
