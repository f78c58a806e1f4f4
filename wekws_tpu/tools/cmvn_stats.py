"""Global CMVN statistics accumulation.

Equivalent of /root/reference/tools/compute_cmvn_stats.py:16-151:
accumulate per-dim sum and squared-sum of training features into the
JSON format consumed by frontend/cmvn.py
({mean_stat, var_stat, frame_num}).  Features come from the numpy
oracle (frontend/kaldi.py) with dither disabled, the same numerics the
on-device extractor reproduces.
"""

import json
from typing import Iterable, Optional

import numpy as np

from wekws_tpu.data.audio import read_wav, resample as resample_wave
from wekws_tpu.frontend.features import frontend_from_dataset_conf
from wekws_tpu.frontend.kaldi import compute_fbank_np, compute_mfcc_np


def compute_cmvn_stats(
    wav_paths: Iterable[str],
    dataset_conf: dict,
    out_path: Optional[str] = None,
) -> dict:
    import dataclasses

    extractor = frontend_from_dataset_conf(dataset_conf)
    cfg = dataclasses.replace(extractor.cfg, dither=0.0)
    fn = compute_mfcc_np if cfg.feature_type == "mfcc" else compute_fbank_np

    mean_stat = np.zeros(cfg.feat_dim, np.float64)
    var_stat = np.zeros(cfg.feat_dim, np.float64)
    frame_num = 0
    for path in wav_paths:
        wave, sr = read_wav(path)
        if sr != cfg.sample_rate:
            wave = resample_wave(wave, sr, cfg.sample_rate)
        feats = fn(wave * cfg.wave_scale, cfg).astype(np.float64)
        mean_stat += feats.sum(axis=0)
        var_stat += (feats ** 2).sum(axis=0)
        frame_num += feats.shape[0]
    stats = {
        "mean_stat": mean_stat.tolist(),
        "var_stat": var_stat.tolist(),
        "frame_num": frame_num,
    }
    if out_path is not None:
        with open(out_path, "w") as f:
            json.dump(stats, f)
    return stats


def wav_paths_from_scp(scp_path: str):
    with open(scp_path, encoding="utf8") as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            if len(parts) == 2:
                yield parts[1]


def wav_paths_from_data_list(list_path: str):
    with open(list_path, encoding="utf8") as f:
        for line in f:
            if line.strip():
                yield json.loads(line)["wav"]
