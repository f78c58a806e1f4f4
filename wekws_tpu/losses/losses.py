"""Training criteria: max-pooling, cross-entropy, CTC.

Numerical semantics match the reference loss module
(/root/reference/wekws/model/loss.py:26-203), but everything is
vectorized for TPU: the reference's per-utterance x per-keyword Python
double loop (loss.py:52-70, a host-side bottleneck noted in SURVEY.md
§3.1) becomes masked reductions over the (B, T, K) posterior tensor,
fully inside jit.
"""

from typing import Optional, Tuple

import jax.numpy as jnp
import optax

from wekws_tpu.losses.ctc_compact import ctc_loss_compact

from wekws_tpu.losses.mask import padding_mask


def max_pooling_per_utt(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    lengths: jnp.ndarray,
    min_duration: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-utterance (loss, correct) vectors — see max_pooling_loss."""
    b, t, k = logits.shape
    pad = padding_mask(lengths, t)  # (B, T) True=pad

    pos_mask = pad | (jnp.arange(t)[None, :] < min_duration)  # (B, T)
    pos_prob = jnp.where(pos_mask[:, :, None], 0.0, logits)
    max_prob = jnp.clip(jnp.max(pos_prob, axis=1), 1e-8, 1.0)  # (B, K)
    pos_loss = -jnp.log(max_prob)

    neg_prob = jnp.where(pad[:, :, None], 1.0, 1.0 - logits)
    min_prob = jnp.clip(jnp.min(neg_prob, axis=1), 1e-8, 1.0)  # (B, K)
    neg_loss = -jnp.log(min_prob)

    is_target = target[:, None] == jnp.arange(k)[None, :]  # (B, K)
    loss_b = jnp.sum(jnp.where(is_target, pos_loss, neg_loss), axis=1)

    masked = jnp.where(pad[:, :, None], 0.0, logits)
    peak = jnp.max(masked, axis=1)  # (B, K)
    max_p = jnp.max(peak, axis=1)
    idx = jnp.argmax(peak, axis=1)
    correct = ((max_p > 0.5) & (idx == target)) | ((max_p < 0.5) & (target < 0))
    return loss_b, correct.astype(jnp.float32)


def max_pooling_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    lengths: jnp.ndarray,
    min_duration: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Max-pooling wake-word loss over sigmoid posteriors.

    For the labeled keyword: -log(max prob) over valid frames after
    ``min_duration``.  For every other keyword (or all keywords of a
    filler utterance, ``target < 0``): -log(min(1 - prob)) — the hardest
    frame.  Matches loss.py:26-88 including the clamp-to-[1e-8, 1]
    and mask fill values (0.0 on the positive path, 1.0 negative).

    Args:
        logits: (B, T, K) sigmoid outputs.
        target: (B,) int32; keyword index, negative => filler.
        lengths: (B,) valid frame counts.
    Returns:
        (scalar loss, scalar accuracy)
    """
    loss_b, correct = max_pooling_per_utt(logits, target, lengths, min_duration)
    return jnp.mean(loss_b), jnp.mean(correct)


def acc_frame(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Classification accuracy (%) — loss.py:91-99."""
    pred = jnp.argmax(logits, axis=-1)
    return jnp.mean((pred == target).astype(jnp.float32)) * 100.0


def cross_entropy(
    logits: jnp.ndarray, target: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CE over utterance logits (B, K) — loss.py:167-180."""
    loss = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(
            logits, target.astype(jnp.int32)
        )
    )
    return loss, acc_frame(logits, target)


def ctc_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CTC loss, batch-mean of per-utterance sums — loss.py:135-164.

    Args:
        logits: (B, T, V) raw (pre-softmax) frame logits.
        target: (B, U) padded label ids.
    Returns:
        (scalar loss, 0.0) — decode-based accuracy is host-side
        (wekws_tpu.decode.acc_utterance), used only in validation.
    """
    t = logits.shape[1]
    u = target.shape[1]
    logit_pad = padding_mask(logit_lengths, t).astype(jnp.float32)
    label_pad = padding_mask(target_lengths, u).astype(jnp.float32)
    per_seq = ctc_loss_compact(
        logits, logit_pad, target.astype(jnp.int32), label_pad,
        blank_id=blank_id,
    )
    return jnp.mean(per_seq), jnp.asarray(0.0)


def criterion(
    loss_type: str,
    logits: jnp.ndarray,
    target: jnp.ndarray,
    lengths: jnp.ndarray,
    target_lengths: Optional[jnp.ndarray] = None,
    min_duration: int = 0,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch on 'ce' | 'max_pooling' | 'ctc' — loss.py:183-203.

    ``valid`` (B,) 0/1 excludes filler rows (bucketed batches may carry
    schedule-fill rows that hold no data) from both the loss mean and
    the accuracy — the gradient is exactly the masked-batch gradient.
    """
    if valid is not None:
        if loss_type == "ctc":
            # masked CTC loss WITHOUT criterion_per_utt: its accuracy
            # term is a greedy decode + Levenshtein scan, which belongs
            # in the cv step, not the training hot path (train-time
            # CTC acc is 0, as in the unmasked path / the reference's
            # need_acc=False)
            t, u = logits.shape[1], target.shape[1]
            logit_pad = padding_mask(lengths, t).astype(jnp.float32)
            label_pad = padding_mask(target_lengths, u).astype(jnp.float32)
            loss_b = ctc_loss_compact(
                logits, logit_pad, target.astype(jnp.int32), label_pad,
                blank_id=0,
            )
            n = jnp.maximum(jnp.sum(valid), 1.0)
            return jnp.sum(loss_b * valid) / n, jnp.asarray(0.0)
        loss_b, correct_b = criterion_per_utt(
            loss_type, logits, target, lengths, target_lengths,
            min_duration,
        )
        n = jnp.maximum(jnp.sum(valid), 1.0)
        loss = jnp.sum(loss_b * valid) / n
        acc = jnp.sum(correct_b * valid) / n
        if loss_type == "ce":
            acc = acc * 100.0  # acc_frame reports percent
        return loss, acc
    if loss_type == "ce":
        return cross_entropy(logits, target)
    if loss_type == "max_pooling":
        return max_pooling_loss(logits, target, lengths, min_duration)
    if loss_type == "ctc":
        return ctc_loss(logits, target, lengths, target_lengths)
    raise ValueError(f"unknown criterion {loss_type}")


def criterion_per_utt(
    loss_type: str,
    logits: jnp.ndarray,
    target: jnp.ndarray,
    lengths: jnp.ndarray,
    target_lengths: Optional[jnp.ndarray] = None,
    min_duration: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-utterance (loss, correct) vectors for exact CV accumulation
    over sharded batches with padding (executor masks invalid rows)."""
    if loss_type == "ce":
        loss_b = optax.softmax_cross_entropy_with_integer_labels(
            logits, target.astype(jnp.int32)
        )
        correct = (jnp.argmax(logits, axis=-1) == target).astype(jnp.float32)
        return loss_b, correct
    if loss_type == "max_pooling":
        return max_pooling_per_utt(logits, target, lengths, min_duration)
    if loss_type == "ctc":
        t = logits.shape[1]
        u = target.shape[1]
        logit_pad = padding_mask(lengths, t).astype(jnp.float32)
        label_pad = padding_mask(target_lengths, u).astype(jnp.float32)
        loss_b = ctc_loss_compact(
            logits, logit_pad, target.astype(jnp.int32), label_pad,
            blank_id=0,
        )
        # on-device greedy token accuracy — the cv-quality signal the
        # reference computes with a host-side beam decode
        # (loss.py:100-131); greedy + batched Levenshtein stays inside
        # the jitted cv step at negligible cost
        from wekws_tpu.decode.greedy import ctc_token_accuracy

        acc_b = ctc_token_accuracy(logits, target, lengths, target_lengths)
        return loss_b, acc_b
    raise ValueError(f"unknown criterion {loss_type}")
