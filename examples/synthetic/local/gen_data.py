#!/usr/bin/env python3
"""Generate the synthetic two-tone wake-word corpus.

A self-contained recipe corpus (no downloads): the "wake word" is a
two-tone chirp with random pitch/level/timing jitter; fillers are
noise, single tones, and reversed-order chirps (hard negatives).
Writes {train,dev,test}.list + global_cmvn under the output dir.
"""

import argparse
import json
import os

import numpy as np

SR = 16000


def keyword_wave(rng, n):
    f1 = 600 * (1 + 0.1 * rng.standard_normal())
    f2 = 900 * (1 + 0.1 * rng.standard_normal())
    d1 = int(SR * 0.25 * (1 + 0.2 * rng.random()))
    d2 = int(SR * 0.25 * (1 + 0.2 * rng.random()))
    off = int(rng.integers(0, max(n - d1 - d2 - 1600, 1)))
    w = 0.02 * rng.standard_normal(n)
    a = 0.2 + 0.2 * rng.random()
    w[off:off + d1] += a * np.sin(2 * np.pi * f1 * np.arange(d1) / SR)
    w[off + d1:off + d1 + d2] += a * np.sin(
        2 * np.pi * f2 * np.arange(d2) / SR
    )
    return w.astype(np.float32)


def filler_wave(rng, n):
    kind = rng.integers(0, 3)
    w = 0.05 * rng.standard_normal(n)
    if kind == 1:
        f = 400 + 1200 * rng.random()
        d = int(SR * 0.4)
        off = int(rng.integers(0, n - d - 1))
        w[off:off + d] += 0.3 * np.sin(2 * np.pi * f * np.arange(d) / SR)
    elif kind == 2:  # reversed chirp: hard negative
        d = int(SR * 0.25)
        off = int(rng.integers(0, n - 2 * d - 1))
        w[off:off + d] += 0.3 * np.sin(2 * np.pi * 900 * np.arange(d) / SR)
        w[off + d:off + 2 * d] += 0.3 * np.sin(
            2 * np.pi * 600 * np.arange(d) / SR
        )
    return w.astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("out_dir")
    parser.add_argument("--train", type=int, default=480)
    parser.add_argument("--dev", type=int, default=96)
    parser.add_argument("--test", type=int, default=192)
    parser.add_argument("--seed", type=int, default=7)
    args = parser.parse_args()

    from wekws_tpu.data.audio import write_wav

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    for split, n in [("train", args.train), ("dev", args.dev),
                     ("test", args.test)]:
        wav_dir = os.path.join(args.out_dir, split)
        os.makedirs(wav_dir, exist_ok=True)
        lines = []
        for i in range(n):
            kw = i % 2 == 0
            dur = int(SR * (1.2 + 0.8 * rng.random()))
            w = keyword_wave(rng, dur) if kw else filler_wave(rng, dur)
            p = os.path.join(wav_dir, f"{split}_{i}.wav")
            write_wav(p, w, SR)
            lines.append(json.dumps({
                "key": f"{split}_{i}",
                "txt": "0" if kw else "-1",
                "wav": os.path.abspath(p),
                "duration": dur / SR,
            }))
        with open(os.path.join(args.out_dir, f"{split}.list"), "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"{split}: {n} utts")


if __name__ == "__main__":
    main()
