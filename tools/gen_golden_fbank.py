#!/usr/bin/env python3
"""Regenerate tests/golden/fbank_reference.npz from the reference C++ frontend.

Compiles the reference implementation's own feature extractor
(``<ref>/runtime/core/frontend/{fft.cc,fbank.h}``) out-of-tree, twice:

* as-is (Hamming window — the reference runtime's configuration), and
* with ONLY the window formula substituted to povey
  (``0.54-0.46cos -> (0.5-0.5cos)^0.85``), i.e. the window the reference
  *training* pipeline uses via torchaudio Kaldi compliance
  (/root/reference/wekws/dataset/processor.py:173-203).

Runs both on deterministic waveforms and packs waves + features into the
golden archive. The patched copy lives only in the scratch dir; no reference
code enters this repository — only the *data* it produces, used as an
external anchor for our numerics oracle (wekws_tpu/frontend/kaldi.py).

Usage: python tools/gen_golden_fbank.py [--ref /root/reference] [--out tests/golden]
"""

import argparse
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

DRIVER = r"""
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>
#include "frontend/fbank.h"
#include "frontend/fbank_povey.h"

static std::vector<float> read_f32(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { fprintf(stderr, "no %s\n", path); exit(1); }
  fseek(f, 0, SEEK_END); long n = ftell(f) / 4; fseek(f, 0, SEEK_SET);
  std::vector<float> v(n);
  if (fread(v.data(), 4, n, f) != (size_t)n) exit(1);
  fclose(f);
  return v;
}

int main(int argc, char** argv) {
  if (argc != 8) { fprintf(stderr, "usage\n"); return 1; }
  std::vector<float> wave = read_f32(argv[1]);
  std::string win = argv[3];
  int num_bins = atoi(argv[4]), sr = atoi(argv[5]);
  int flen = atoi(argv[6]), fsh = atoi(argv[7]);
  std::vector<std::vector<float>> feat;
  int nf = 0;
  if (win == "hamming") {
    wenet::Fbank fb(num_bins, sr, flen, fsh);
    fb.set_dither(0.0f);
    nf = fb.Compute(wave, &feat);
  } else {
    wenet::FbankPovey fb(num_bins, sr, flen, fsh);
    fb.set_dither(0.0f);
    nf = fb.Compute(wave, &feat);
  }
  FILE* f = fopen(argv[2], "wb");
  for (int i = 0; i < nf; ++i) fwrite(feat[i].data(), 4, num_bins, f);
  fclose(f);
  fprintf(stderr, "%d frames\n", nf);
  return 0;
}
"""

CONFIGS = [  # (tag, num_bins, sample_rate, frame_len, frame_shift)
    ("b40_16k", 40, 16000, 400, 160),
    ("b80_16k", 80, 16000, 400, 160),
    ("b23_8k", 23, 8000, 200, 80),
]


def make_waves():
    rng = np.random.default_rng(20260817)
    sr = 16000

    def scale(x):
        return (np.asarray(x) * 32767.0).astype(np.float32)

    return {
        "chirp": scale(0.5 * np.sin(
            2 * np.pi * np.cumsum(np.linspace(100, 7000, 16000)) / sr)),
        "tones": scale(0.3 * np.sin(2 * np.pi * 440 * np.arange(8000) / sr)
                       + 0.2 * np.sin(2 * np.pi * 1333 * np.arange(8000) / sr + 0.7)),
        "noise": scale(0.1 * rng.standard_normal(12000).astype(np.float32)),
        "silence": np.zeros(4800, np.float32),
        "impulse": np.concatenate([np.zeros(1000, np.float32),
                                   np.array([32000.0], np.float32),
                                   np.zeros(3000, np.float32)]),
        "loud": scale(np.sign(np.sin(2 * np.pi * 300 * np.arange(6400) / sr))),
        "short": scale(0.4 * np.sin(2 * np.pi * 700 * np.arange(450) / sr)),
        "am": scale((0.3 + 0.2 * np.sin(2 * np.pi * 3 * np.arange(16000) / sr))
                    * rng.standard_normal(16000)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden"))
    args = ap.parse_args()

    src = os.path.join(args.ref, "runtime", "core", "frontend")
    with tempfile.TemporaryDirectory() as tmp:
        fe = os.path.join(tmp, "frontend")
        os.makedirs(fe)
        for f in ("fft.cc", "fft.h", "fbank.h"):
            shutil.copy(os.path.join(src, f), fe)
        shutil.copy(os.path.join(args.ref, "runtime", "core", "utils", "log.h"),
                    os.path.join(tmp, "utils.h"))
        os.makedirs(os.path.join(tmp, "utils"))
        shutil.copy(os.path.join(args.ref, "runtime", "core", "utils", "log.h"),
                    os.path.join(tmp, "utils", "log.h"))
        # povey variant: substitute only the window formula + rename symbols
        hdr = open(os.path.join(fe, "fbank.h")).read()
        hdr = hdr.replace("FRONTEND_FBANK_H_", "FRONTEND_FBANK_POVEY_H_")
        hdr = hdr.replace("class Fbank", "class FbankPovey")
        hdr = hdr.replace("  Fbank(int num_bins", "  FbankPovey(int num_bins")
        patched = hdr.replace(
            "hamming_window_[i] = 0.54 - 0.46 * cos(a * i_fl);",
            "hamming_window_[i] = pow(0.5 - 0.5 * cos(a * i_fl), 0.85);")
        if patched == hdr:
            sys.exit("window-formula patch did not apply — reference changed?")
        open(os.path.join(fe, "fbank_povey.h"), "w").write(patched)
        open(os.path.join(tmp, "gen.cc"), "w").write(DRIVER)
        subprocess.run(
            ["g++", "-O2", "-std=c++14", "-I", tmp, "gen.cc", "frontend/fft.cc",
             "-o", "gen", "-lm"],
            cwd=tmp, check=True)

        out = {}
        waves = make_waves()
        for wname, w in waves.items():
            wf = os.path.join(tmp, wname + ".f32")
            w.tofile(wf)
            out[f"wave/{wname}"] = w
            for tag, nb, csr, fl, fs in CONFIGS:
                if csr != 16000 and wname != "noise":
                    continue
                for win in ("hamming", "povey"):
                    of = os.path.join(tmp, f"{wname}.{tag}.{win}.f32")
                    r = subprocess.run(
                        [os.path.join(tmp, "gen"), wf, of, win,
                         str(nb), str(csr), str(fl), str(fs)],
                        capture_output=True, text=True, check=True)
                    nf = int(r.stderr.split()[0])
                    feat = (np.fromfile(of, np.float32).reshape(nf, nb)
                            if nf else np.zeros((0, nb), np.float32))
                    out[f"feat/{wname}/{tag}/{win}"] = feat

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "fbank_reference.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} with {len(out)} entries")


if __name__ == "__main__":
    main()
