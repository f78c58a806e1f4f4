#!/bin/bash
# Two-sided silence trim of keyword wavs (tools/trim_sil.sh
# equivalent).  Uses sox when available, otherwise a python fallback
# with an energy-threshold trimmer.
# Usage: trim_sil.sh <in_wav_scp> <out_dir> <out_wav_scp>
set -e
in_scp=$1
out_dir=$2
out_scp=$3
mkdir -p "$out_dir"
: > "$out_scp"
while read -r key path; do
  out="$out_dir/$key.wav"
  if command -v sox >/dev/null 2>&1; then
    sox "$path" "$out" silence 1 0.1 1% reverse silence 1 0.1 1% reverse
  else
    python -c "
import sys
import numpy as np
from wekws_tpu.data.audio import read_wav, write_wav
w, sr = read_wav('$path')
e = np.abs(w)
thr = 0.01 * (e.max() + 1e-9)
idx = np.where(e > thr)[0]
out = w[max(idx[0]-160,0):idx[-1]+160] if len(idx) else w
write_wav('$out', out, sr)
"
  fi
  echo "$key $out" >> "$out_scp"
done < "$in_scp"
