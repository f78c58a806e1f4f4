"""Compact CTC loss: the forward-alpha recursion on label columns
only — the full (B, T, V) log-prob tensor is never materialized.

``optax.ctc_loss`` computes log_softmax over the whole vocabulary and
runs its recursion against it; at the FSMN-CTC bench shape
(B=256, T=666, V=2599) that loss path is 45% of the measured train
step (PERF.md r5 'FSMN-CTC step').  CTC only ever consumes V-space
through (a) the per-frame normalizer and (b) the ~2U+1 extended-label
columns, so this implementation reduces V out FIRST:

    lse  = logsumexp(logits, -1)                      one read pass
    lbl  = einsum('btv,buv->btu', logits, onehot)     MXU, U columns
    logp = lbl - lse[..., None]  (and blank column)   (B, T, U+1)

and runs the standard alpha recursion (lax.scan over T, carry
(B, 2U+1) in log space).  Gradients come from plain autodiff: the
scan residuals are (T, B, 2U+1) floats (~9 MB at the bench shape) and
the V-sized backward work is exactly the softmax-times-cotangent pass
XLA derives for logsumexp plus the einsum transpose — ~2 passes over
the logits instead of optax's materialized log-prob pipeline.

Semantics match optax.ctc_loss (blank id, per-sequence negative log
likelihood, paddings): pinned to ~1e-4 in tests/test_losses.py over
random cases including repeated labels and ragged paddings.
"""

import jax
import jax.numpy as jnp

_NEG = -1e30


def ctc_loss_compact(
    logits: jnp.ndarray,       # (B, T, V), any float dtype
    logit_paddings: jnp.ndarray,   # (B, T) 1.0 = pad
    labels: jnp.ndarray,       # (B, U) int
    label_paddings: jnp.ndarray,   # (B, U) 1.0 = pad
    blank_id: int = 0,
) -> jnp.ndarray:
    """Per-sequence negative log likelihood, shape (B,)."""
    b, t, v = logits.shape
    u = labels.shape[1]
    s = 2 * u + 1
    f32 = jnp.float32

    # ---- V-space reduction (the only passes over the big tensor) ----
    lse = jax.nn.logsumexp(logits.astype(f32), axis=-1)      # (B, T)
    # NOTE: the batched GEMM makes XLA transpose-copy the logits into
    # a batch-minor layout (~0.57 ms at the bench shape); an
    # rhs-(B, V, U) spelling measured NEUTRAL — the copy belongs to
    # the batched-gemm kernel's operand preference, not the einsum
    # spelling.  Next lever would be contracting label columns out of
    # the classifier WEIGHTS instead of the logits (avoids the big
    # operand entirely) at the cost of a loss/classifier API coupling
    # — deferred (PERF.md r5).
    onehot = jax.nn.one_hot(labels, v, dtype=logits.dtype)   # (B, U, V)
    lbl = jnp.einsum("btv,buv->btu", logits, onehot).astype(f32)
    logp_lbl = lbl - lse[..., None]                          # (B, T, U)
    logp_blank = logits[..., blank_id].astype(f32) - lse     # (B, T)

    # extended sequence z = [blank, l1, blank, l2, ..., lU, blank]:
    # per-frame emission log-probs in z order, (B, T, S)
    em = jnp.zeros((b, t, s), f32)
    em = em.at[:, :, 0::2].set(logp_blank[..., None])
    em = em.at[:, :, 1::2].set(logp_lbl)

    # skip-transition mask: alpha[s] may come from alpha[s-2] iff
    # z_s is a label AND z_s != z_{s-2} (repeated labels forbid it)
    lbl_i = labels.astype(jnp.int32)
    same_as_prev = jnp.concatenate(
        [jnp.zeros((b, 1), bool), lbl_i[:, 1:] == lbl_i[:, :-1]], axis=1
    )                                                        # (B, U)
    can_skip = jnp.zeros((b, s), bool).at[:, 1::2].set(~same_as_prev)

    # valid z positions: blanks up to 2*U_b, labels with s=2u+1, u<U_b
    u_len = jnp.sum(1.0 - label_paddings, axis=1).astype(jnp.int32)
    s_len = 2 * u_len + 1                                    # (B,)
    s_idx = jnp.arange(s)[None, :]
    z_valid = s_idx < s_len[:, None]                         # (B, S)

    alpha0 = jnp.full((b, s), _NEG, f32)
    alpha0 = alpha0.at[:, 0].set(em[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(u_len > 0, em[:, 0, 1], _NEG))
    valid0 = logit_paddings[:, 0] < 0.5
    alpha0 = jnp.where(valid0[:, None], alpha0, _NEG)
    # frames before T_b==0 cannot occur (T_b >= 1 for real rows);
    # fully-padded rows produce loss 0 via the final mask below.

    def shift1(x):
        return jnp.concatenate(
            [jnp.full((b, 1), _NEG, x.dtype), x[:, :-1]], axis=1)

    def step(alpha, inputs):
        em_t, pad_t = inputs                                 # (B,S),(B,)
        stay = alpha
        prev1 = shift1(alpha)
        prev2 = jnp.where(can_skip, shift1(shift1(alpha)), _NEG)
        m = jnp.maximum(stay, jnp.maximum(prev1, prev2))
        m_safe = jnp.maximum(m, _NEG)
        summed = m_safe + jnp.log(
            jnp.exp(stay - m_safe) + jnp.exp(prev1 - m_safe)
            + jnp.exp(prev2 - m_safe)
        )
        new = jnp.where(z_valid, summed + em_t, _NEG)
        upd = pad_t < 0.5                                    # frame real?
        alpha = jnp.where(upd[:, None], new, alpha)
        return alpha, None

    em_sw = jnp.swapaxes(em, 0, 1)                           # (T, B, S)
    pad_sw = jnp.swapaxes(logit_paddings, 0, 1)              # (T, B)
    alpha_T, _ = jax.lax.scan(
        step, alpha0, (em_sw[1:], pad_sw[1:]))

    # final: logsumexp(alpha[S_b-1], alpha[S_b-2]) via one-hot dots
    end1 = jax.nn.one_hot(s_len - 1, s, dtype=f32)
    end2 = jax.nn.one_hot(jnp.maximum(s_len - 2, 0), s, dtype=f32)
    a1 = jnp.sum(alpha_T * end1, axis=1)
    a2 = jnp.where(
        s_len >= 2, jnp.sum(alpha_T * end2, axis=1), _NEG)
    m = jnp.maximum(a1, a2)
    ll = m + jnp.log(jnp.exp(a1 - m) + jnp.exp(a2 - m))
    has_frames = jnp.sum(1.0 - logit_paddings, axis=1) > 0
    return jnp.where(has_frames, -ll, 0.0)
