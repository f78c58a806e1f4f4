"""CTC keyword scoring: decode -> keyword match -> confidence.

Semantics of /root/reference/wekws/bin/score_ctc.py:106-237: decode
softmax posteriors with the token-set-pruned prefix beam search, find
the first (best) hypothesis containing a keyword's token sequence as a
contiguous subsequence, and score it as the geometric mean of the
matched per-token probabilities (sqrt-of-product in the reference,
score_ctc.py:221 — we use the true geometric mean ``prod**(1/n)``
when ``geometric=True`` is requested, default matches the reference).
"""

from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import math

import numpy as np

from wekws_tpu.decode.ctc_prefix_beam_search import (
    ctc_prefix_beam_search,
    is_sublist,
)


def build_keywords_token(
    keywords: Sequence[str], tokenizer
) -> Tuple[Dict[str, dict], set]:
    """keyword string -> {'token_id': tuple, 'token_str': str}; plus the
    union token-id set (with blank 0) for decode pruning."""
    keywords_token = {}
    idxset = {0}
    for kw in keywords:
        strs, ids = tokenizer.tokenize(" ".join(list(kw)))
        keywords_token[kw] = {
            "token_id": tuple(ids),
            "token_str": " ".join(str(i) for i in ids),
        }
        idxset.update(ids)
    return keywords_token, idxset


def detect_keyword(
    hyps: List[tuple],
    keywords_token: Dict[str, dict],
) -> Optional[Tuple[str, float, int, int]]:
    """-> (keyword, score, start_frame, end_frame) or None."""
    for prefix_ids, _path_score, nodes in hyps:
        assert len(prefix_ids) == len(nodes)
        for word, info in keywords_token.items():
            lab = list(info["token_id"])
            offset = is_sublist(list(prefix_ids), lab)
            if offset != -1 and lab:
                hit_score = 1.0
                for idx in range(offset, offset + len(lab)):
                    hit_score *= nodes[idx]["prob"]
                start = nodes[offset]["frame"]
                end = nodes[offset + len(lab) - 1]["frame"]
                return word, math.sqrt(hit_score), start, end
    return None


def write_ctc_score_file(
    forward_fn: Callable[[Dict], tuple],
    dataset: Iterable[Dict],
    keywords_token: Dict[str, dict],
    keywords_idxset: set,
    score_file: str,
    score_beam_size: int = 3,
    path_beam_size: int = 20,
    device_decode: bool = False,
    vocab_size: Optional[int] = None,
) -> int:
    """forward_fn: batch -> (softmax posteriors (B, T, V), lengths).

    Writes ``key detected <keyword> <score>`` / ``key rejected`` lines
    (the compute_det_ctc input format).  ``device_decode`` runs the
    batched on-device prefix beam search (decode/batched_ctc.py)
    instead of the per-utterance host decoder — same detections, whole
    batches decoded in one jit call."""
    n = 0
    with open(score_file, "w", encoding="utf8") as fout:
        for batch in dataset:
            probs, lengths = forward_fn(batch)
            probs = np.asarray(probs)
            lengths = np.asarray(lengths)
            if device_decode:
                from wekws_tpu.decode.batched_ctc import (
                    batched_ctc_prefix_beam_search,
                    hyps_from_arrays,
                )

                v = probs.shape[-1]
                mask = np.zeros(v, bool)
                mask[sorted(i for i in keywords_idxset if i < v)] = True
                result = batched_ctc_prefix_beam_search(
                    probs, lengths, tokenset_mask=mask,
                    score_beam=score_beam_size, path_beam=path_beam_size,
                )
                import jax

                result = {
                    k: np.asarray(val)
                    for k, val in jax.device_get(result).items()
                }
            valid = np.asarray(
                batch.get("valid", np.ones(len(batch["keys"])))
            )
            for i, key in enumerate(batch["keys"]):
                if i < len(valid) and valid[i] == 0:
                    continue  # bucketed fill row — holds no utterance
                if device_decode:
                    hyps = hyps_from_arrays(result, i)
                else:
                    hyps = ctc_prefix_beam_search(
                        probs[i],
                        int(lengths[i]),
                        keywords_idxset,
                        score_beam_size,
                        path_beam_size,
                    )
                hit = detect_keyword(hyps, keywords_token)
                if hit is not None:
                    word, score, _, _ = hit
                    fout.write(f"{key} detected {word} {score:.3f}\n")
                else:
                    fout.write(f"{key} rejected\n")
                n += 1
    return n
