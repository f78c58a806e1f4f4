"""Checkpoint averaging.

Equivalent of /root/reference/wekws/bin/average_model.py:39-85: pick
the top-N checkpoints by sidecar ``cv_loss`` (or the last N by epoch)
and arithmetically average their parameters — load-bearing for the
published accuracy numbers (SURVEY.md §5).
"""

import glob
import os
from typing import Any, List, Tuple

import jax
import numpy as np

from wekws_tpu.train.checkpoint import (
    load_checkpoint,
    load_checkpoint_info,
    save_checkpoint,
)


def find_checkpoints(
    model_dir: str, num: int, val_best: bool = True
) -> List[str]:
    paths = sorted(
        p
        for p in glob.glob(os.path.join(model_dir, "*.ckpt"))
        if os.path.basename(p)[0].isdigit() and not os.path.islink(p)
    )
    if val_best:
        scored: List[Tuple[float, str]] = []
        for p in paths:
            info = load_checkpoint_info(p)
            if "cv_loss" in info and np.isfinite(info["cv_loss"]):
                scored.append((float(info["cv_loss"]), p))
        scored.sort(key=lambda x: x[0])
        return [p for _, p in scored[:num]]
    paths.sort(key=lambda p: int(os.path.basename(p).split(".")[0]))
    return paths[-num:]


def average_checkpoints(
    model_dir: str, dst_path: str, num: int, val_best: bool = True
) -> List[str]:
    picked = find_checkpoints(model_dir, num, val_best)
    assert picked, f"no checkpoints found in {model_dir}"
    acc_params: Any = None
    batch_stats = None
    for p in picked:
        params, stats = load_checkpoint(p)
        if acc_params is None:
            acc_params = jax.tree_util.tree_map(
                lambda x: np.asarray(x, np.float64), params
            )
            batch_stats = stats
        else:
            acc_params = jax.tree_util.tree_map(
                lambda a, x: a + np.asarray(x, np.float64), acc_params, params
            )
    n = len(picked)
    avg = jax.tree_util.tree_map(
        lambda a: (a / n).astype(np.float32), acc_params
    )
    save_checkpoint(dst_path, avg, batch_stats)
    return picked
