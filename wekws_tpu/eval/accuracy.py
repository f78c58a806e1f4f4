"""Utterance classification accuracy (speech-commands path).

Counting loop behind bin/compute_accuracy.py — reference semantics
/root/reference/wekws/bin/compute_accuracy.py:87-99, plus the
bucketed-batch fill-row guard (rows with valid=0 hold no utterance
and must count toward neither total nor correct).
"""

from typing import Callable, Dict, Iterable, Tuple

import numpy as np


def accuracy_over_dataset(
    forward_fn: Callable[[Dict], tuple], dataset: Iterable[Dict]
) -> Tuple[int, int]:
    """-> (correct, total) over valid utterances only."""
    correct, total = 0, 0
    for batch in dataset:
        logits, _ = forward_fn(batch)
        pred = np.argmax(np.asarray(logits), axis=-1)
        valid = np.asarray(
            batch.get("valid", np.ones(len(batch["keys"])))
        ).astype(bool)
        hits = (pred == np.asarray(batch["target"])) & valid
        correct += int(hits.sum())
        total += int(valid.sum())
    return correct, total
