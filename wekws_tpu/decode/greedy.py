"""On-device greedy CTC decode + batched token accuracy.

The reference computes a CTC quality signal during validation by
running a host-side prefix beam search per utterance followed by a
Python edit-distance alignment (/root/reference/wekws/model/loss.py:
100-131, ``acc_utterance``).  That is a host bottleneck (SURVEY.md
§3.1) and the reference only runs it when ``need_acc=True``.

Here the whole computation is a fixed-shape jittable program so it can
ride along with every cv step at negligible cost:

  * greedy decode: per-frame argmax -> collapse repeats -> drop blanks.
    The collapse uses a stable argsort on the keep-mask to compact
    surviving tokens to the front — no scatter, no dynamic shapes.
  * token accuracy: batched Levenshtein distance.  The row update of
    the classic DP has a sequential dependency along the reference
    axis (insertions); it is vectorized with the min-plus trick
    ``new_row = cummin(cand - arange) + arange`` so the whole DP is a
    single ``lax.scan`` over hypothesis positions with O(U) work per
    step on the VPU.

Accuracy per utterance is ``(ref_len - edit_distance) / ref_len`` —
the same ``(all - ins - sub - del) / all`` the reference reports,
computed per utterance instead of pooled over tokens, and with greedy
decode instead of beam (beam-vs-greedy differs only when the top CTC
path is ambiguous; for KWS-scale vocabularies the cv signal is
equivalent).  Utterances with empty references contribute 0 (the
reference skips them).
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from wekws_tpu.losses.mask import padding_mask


def ctc_greedy_decode(
    logits: jnp.ndarray,
    lengths: jnp.ndarray,
    blank_id: int = 0,
    pad_id: int = -1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched greedy CTC decode with static output shape.

    Args:
        logits: (B, T, V) frame logits (or log-probs — only argmax is
            used).
        lengths: (B,) valid frame counts.
    Returns:
        (hyps, hyp_lengths): (B, T) token ids padded with ``pad_id``
        (collapsed tokens compacted to the front), and (B,) counts.
    """
    b, t, _ = logits.shape
    ids = jnp.argmax(logits, axis=-1)  # (B, T)
    valid = ~padding_mask(lengths, t)  # (B, T) True=real frame
    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, ids.dtype), ids[:, :-1]], axis=1
    )
    keep = valid & (ids != blank_id) & (ids != prev)
    # stable compaction: kept positions first, original order preserved
    order = jnp.argsort(jnp.where(keep, 0, 1), axis=1, stable=True)
    hyps = jnp.take_along_axis(ids, order, axis=1)
    hyp_lengths = jnp.sum(keep, axis=1)
    pos = jnp.arange(t)[None, :]
    hyps = jnp.where(pos < hyp_lengths[:, None], hyps, pad_id)
    return hyps, hyp_lengths


def batched_edit_distance(
    hyps: jnp.ndarray,
    hyp_lengths: jnp.ndarray,
    refs: jnp.ndarray,
    ref_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Levenshtein distance per batch row, fully vectorized.

    Args:
        hyps: (B, T) hypothesis token ids (padding ignored via
            ``hyp_lengths``).
        refs: (B, U) reference token ids.
    Returns:
        (B,) int32 minimal ins+del+sub counts.
    """
    b, t = hyps.shape
    u = refs.shape[1]
    j = jnp.arange(u + 1)
    row0 = jnp.broadcast_to(j, (b, u + 1)).astype(jnp.int32)

    def step(row, inputs):
        hyp_tok, active = inputs  # (B,), (B,) bool
        sub_cost = (hyp_tok[:, None] != refs).astype(jnp.int32)  # (B, U)
        # candidate best-before-insertions at each column:
        #   j=0   : delete the hyp token          -> row[0] + 1
        #   j>=1  : min(delete, substitute/match) -> min(row[j]+1,
        #                                                row[j-1]+sub)
        cand = jnp.concatenate(
            [
                row[:, :1] + 1,
                jnp.minimum(row[:, 1:] + 1, row[:, :-1] + sub_cost),
            ],
            axis=1,
        )
        # fold in insertions (new_row[j-1] + 1 chains) via min-plus
        # cumulative minimum: new_row[j] = min_i<=j (cand[i] + (j - i))
        new_row = jax.lax.cummin(cand - j[None, :], axis=1) + j[None, :]
        return jnp.where(active[:, None], new_row, row), None

    pos = jnp.arange(t)[None, :]
    active = pos < hyp_lengths[:, None]  # (B, T)
    final_row, _ = jax.lax.scan(
        step, row0, (hyps.T.astype(jnp.int32), active.T)
    )
    return jnp.take_along_axis(
        final_row, ref_lengths[:, None].astype(jnp.int32), axis=1
    )[:, 0]


def ctc_token_accuracy(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Per-utterance greedy token accuracy in [~, 1] (can go negative
    when insertions dominate, as the reference's formula does).

    Returns (B,) float32 ``(ref_len - edits) / ref_len``; 0 for empty
    references.
    """
    hyps, hyp_lengths = ctc_greedy_decode(logits, logit_lengths, blank_id)
    dist = batched_edit_distance(
        hyps, hyp_lengths, target.astype(jnp.int32), target_lengths
    )
    ref_len = target_lengths.astype(jnp.float32)
    acc = (ref_len - dist.astype(jnp.float32)) / jnp.maximum(ref_len, 1.0)
    return jnp.where(target_lengths > 0, acc, 0.0)
