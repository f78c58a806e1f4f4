#!/usr/bin/env python3
"""Prepare Google Speech Commands v1 into the 12-class task tables.

10 command words + '_unknown_' (other words) + '_silence_' (background
noise clips), using the dataset's official validation/testing lists —
the split used for the reference's published 97.89% accuracy.
"""

import argparse
import os

COMMANDS = ["yes", "no", "up", "down", "left", "right", "on", "off",
            "stop", "go"]
LABELS = COMMANDS + ["_unknown_", "_silence_"]


def label_of(word: str) -> int:
    if word in COMMANDS:
        return COMMANDS.index(word)
    if word == "_background_noise_":
        return len(COMMANDS) + 1
    return len(COMMANDS)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("download_dir", help="extracted speech_commands dir")
    parser.add_argument("out_dir")
    args = parser.parse_args()

    def read_list(name):
        path = os.path.join(args.download_dir, name)
        with open(path, encoding="utf-8") as f:
            return {line.strip() for line in f if line.strip()}

    valid = read_list("validation_list.txt")
    test = read_list("testing_list.txt")

    tables = {s: [] for s in ("train", "valid", "test")}
    for word in sorted(os.listdir(args.download_dir)):
        word_dir = os.path.join(args.download_dir, word)
        if not os.path.isdir(word_dir):
            continue
        for wav in sorted(os.listdir(word_dir)):
            if not wav.endswith(".wav"):
                continue
            rel = f"{word}/{wav}"
            split = (
                "valid" if rel in valid
                else "test" if rel in test
                else "train"
            )
            key = rel.replace("/", "_").replace(".wav", "")
            tables[split].append(
                (key, os.path.abspath(os.path.join(word_dir, wav)),
                 label_of(word))
            )

    for split, rows in tables.items():
        out = os.path.join(args.out_dir, split)
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "wav.scp"), "w") as f_wav, \
             open(os.path.join(out, "text"), "w") as f_text:
            for key, path, label in rows:
                f_wav.write(f"{key} {path}\n")
                f_text.write(f"{key} {label}\n")
        print(f"{split}: {len(rows)} utts")


if __name__ == "__main__":
    main()
