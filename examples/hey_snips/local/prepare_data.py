#!/usr/bin/env python3
"""Prepare the hey_snips research dataset into wav.scp/text tables.

Reads the dataset's {train,dev,test}.json ([{id, audio_file_path,
is_hotword}, ...]); label 0 = the wake word, -1 = filler (the
reference recipe's single-keyword convention).
"""

import argparse
import json
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("download_dir", help="extracted hey_snips dir")
    parser.add_argument("out_dir")
    args = parser.parse_args()

    for split in ["train", "dev", "test"]:
        path = os.path.join(args.download_dir, f"{split}.json")
        out = os.path.join(args.out_dir, split)
        os.makedirs(out, exist_ok=True)
        with open(path, encoding="utf-8") as f:
            entries = json.load(f)
        with open(os.path.join(out, "wav.scp"), "w") as f_wav, \
             open(os.path.join(out, "text"), "w") as f_text:
            for e in entries:
                key = e["id"]
                wav = os.path.join(args.download_dir, e["audio_file_path"])
                label = 0 if int(e["is_hotword"]) == 1 else -1
                f_wav.write(f"{key} {os.path.abspath(wav)}\n")
                f_text.write(f"{key} {label}\n")
        print(f"{split}: {len(entries)} utts")


if __name__ == "__main__":
    main()
