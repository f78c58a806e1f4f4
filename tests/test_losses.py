"""Loss tests: vectorized losses vs straightforward numpy references.

The numpy oracles here re-derive the reference semantics
(/root/reference/wekws/model/loss.py:26-203) independently; the
vectorized jax implementations must match them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wekws_tpu.losses import (
    acc_frame,
    criterion,
    cross_entropy,
    ctc_loss,
    max_pooling_loss,
    padding_mask,
)


def np_max_pooling_loss(logits, target, lengths, min_duration=0):
    """Literal per-utterance/per-keyword oracle (loss.py:52-71)."""
    b, t, k = logits.shape
    loss = 0.0
    for i in range(b):
        for j in range(k):
            if target[i] == j:
                prob = logits[i, :, j].copy()
                prob[lengths[i]:] = 0.0
                prob[:min_duration] = 0.0
                prob = np.clip(prob, 1e-8, 1.0)
                loss += -np.log(prob.max())
            else:
                prob = 1.0 - logits[i, :, j]
                prob[lengths[i]:] = 1.0
                prob = np.clip(prob, 1e-8, 1.0)
                loss += -np.log(prob.min())
    return loss / b


class TestPaddingMask:
    def test_basic(self):
        m = padding_mask(jnp.asarray([2, 2, 3]), 3)
        want = np.array(
            [[False, False, True], [False, False, True],
             [False, False, False]]
        )
        np.testing.assert_array_equal(np.asarray(m), want)


class TestMaxPooling:
    @pytest.mark.parametrize("min_duration", [0, 5])
    def test_matches_oracle(self, rng, min_duration):
        b, t, k = 6, 40, 3
        logits = rng.uniform(0.01, 0.99, (b, t, k)).astype(np.float32)
        target = np.array([0, 1, 2, -1, -1, 1], np.int32)
        lengths = np.array([40, 35, 20, 40, 10, 40], np.int32)
        want = np_max_pooling_loss(logits, target, lengths, min_duration)
        got, acc = max_pooling_loss(
            jnp.asarray(logits), jnp.asarray(target), jnp.asarray(lengths),
            min_duration,
        )
        np.testing.assert_allclose(float(got), want, rtol=1e-5)
        assert 0.0 <= float(acc) <= 1.0

    def test_perfect_predictions_low_loss(self):
        b, t, k = 2, 10, 2
        logits = np.full((b, t, k), 0.001, np.float32)
        logits[0, 5, 0] = 0.999  # utt0 fires keyword 0
        target = np.array([0, -1], np.int32)
        lengths = np.array([10, 10], np.int32)
        loss, acc = max_pooling_loss(
            jnp.asarray(logits), jnp.asarray(target), jnp.asarray(lengths)
        )
        assert float(loss) < 0.02
        assert float(acc) == 1.0

    def test_gradient_flows(self):
        def f(x):
            loss, _ = max_pooling_loss(
                jax.nn.sigmoid(x),
                jnp.asarray([0, -1]),
                jnp.asarray([8, 8]),
            )
            return loss

        g = jax.grad(f)(jnp.zeros((2, 8, 2)))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestCrossEntropy:
    def test_matches_manual(self, rng):
        logits = rng.standard_normal((4, 12)).astype(np.float32)
        target = np.array([0, 3, 11, 5], np.int32)
        loss, acc = cross_entropy(jnp.asarray(logits), jnp.asarray(target))
        lse = np.log(np.exp(logits).sum(-1))
        want = np.mean(lse - logits[np.arange(4), target])
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    def test_acc_frame(self):
        logits = jnp.asarray([[0.9, 0.1], [0.2, 0.8]])
        assert float(acc_frame(logits, jnp.asarray([0, 1]))) == 100.0
        assert float(acc_frame(logits, jnp.asarray([1, 1]))) == 50.0


class TestCTC:
    def test_matches_torch_ctc(self, rng):
        torch = pytest.importorskip("torch")
        b, t, v, u = 3, 20, 7, 5
        logits = rng.standard_normal((b, t, v)).astype(np.float32)
        target = rng.integers(1, v, (b, u)).astype(np.int32)
        logit_lengths = np.array([20, 15, 12], np.int32)
        target_lengths = np.array([5, 3, 2], np.int32)

        got, _ = ctc_loss(
            jnp.asarray(logits), jnp.asarray(target),
            jnp.asarray(logit_lengths), jnp.asarray(target_lengths),
        )

        lp = torch.from_numpy(logits).transpose(0, 1).log_softmax(2)
        want = torch.nn.functional.ctc_loss(
            lp, torch.from_numpy(target.astype(np.int64)),
            torch.from_numpy(logit_lengths.astype(np.int64)),
            torch.from_numpy(target_lengths.astype(np.int64)),
            reduction="sum",
        ) / b
        np.testing.assert_allclose(float(got), float(want), rtol=1e-4)

    def test_criterion_dispatch(self, rng):
        logits = jnp.asarray(rng.uniform(0.1, 0.9, (2, 10, 2)), jnp.float32)
        loss, _ = criterion(
            "max_pooling", logits, jnp.asarray([0, -1]), jnp.asarray([10, 10])
        )
        assert np.isfinite(float(loss))
        with pytest.raises(ValueError):
            criterion("bogus", logits, jnp.asarray([0]), jnp.asarray([1]))


class TestCompactCTC:
    """ctc_loss_compact == optax.ctc_loss (values AND gradients) —
    the V-reduced formulation must be numerically interchangeable."""

    def _case(self, rng, b, t, v, u, repeated=False):
        logits = rng.standard_normal((b, t, v)).astype(np.float32)
        t_lens = rng.integers(max(2 * u + 2, t // 2), t + 1, (b,))
        u_lens = rng.integers(1, u + 1, (b,))
        labels = rng.integers(1, v, (b, u)).astype(np.int32)
        if repeated:
            labels[:, 1::2] = labels[:, 0:1]  # force repeats
        logit_pad = (np.arange(t)[None, :] >= t_lens[:, None]).astype(
            np.float32)
        label_pad = (np.arange(u)[None, :] >= u_lens[:, None]).astype(
            np.float32)
        return logits, logit_pad, labels, label_pad

    @pytest.mark.parametrize("repeated", [False, True])
    def test_loss_and_grad_match_optax(self, rng, repeated):
        import optax

        from wekws_tpu.losses.ctc_compact import ctc_loss_compact

        args = self._case(rng, b=5, t=37, v=29, u=6, repeated=repeated)

        def total_opt(lg):
            return optax.ctc_loss(
                lg, jnp.asarray(args[1]), jnp.asarray(args[2]),
                jnp.asarray(args[3])).sum()

        def total_cmp(lg):
            return ctc_loss_compact(
                lg, jnp.asarray(args[1]), jnp.asarray(args[2]),
                jnp.asarray(args[3])).sum()

        lg = jnp.asarray(args[0])
        lo, go = jax.value_and_grad(total_opt)(lg)
        lc, gc = jax.value_and_grad(total_cmp)(lg)
        np.testing.assert_allclose(float(lc), float(lo), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(gc), np.asarray(go), atol=2e-5)

    def test_per_sequence_values(self, rng):
        import optax

        from wekws_tpu.losses.ctc_compact import ctc_loss_compact

        args = self._case(rng, b=8, t=50, v=12, u=4)
        want = optax.ctc_loss(
            jnp.asarray(args[0]), jnp.asarray(args[1]),
            jnp.asarray(args[2]), jnp.asarray(args[3]))
        got = ctc_loss_compact(
            jnp.asarray(args[0]), jnp.asarray(args[1]),
            jnp.asarray(args[2]), jnp.asarray(args[3]))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_edge_cases_match_optax(self, rng):
        """Zero-length labels (pure-blank rows), single-frame inputs,
        and labels nearly as long as frames."""
        import optax

        from wekws_tpu.losses.ctc_compact import ctc_loss_compact

        # all-blank row: every label padded
        logits = rng.standard_normal((2, 9, 7)).astype(np.float32)
        labels = np.ones((2, 3), np.int32)
        label_pad = np.asarray([[1, 1, 1], [0, 1, 1]], np.float32)
        logit_pad = np.zeros((2, 9), np.float32)
        want = optax.ctc_loss(jnp.asarray(logits), jnp.asarray(logit_pad),
                              jnp.asarray(labels), jnp.asarray(label_pad))
        got = ctc_loss_compact(jnp.asarray(logits), jnp.asarray(logit_pad),
                               jnp.asarray(labels), jnp.asarray(label_pad))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

        # T == U (tight alignment, no blanks possible between labels)
        logits = rng.standard_normal((1, 4, 6)).astype(np.float32)
        labels = np.asarray([[1, 2, 3, 4]], np.int32)
        zeros4 = np.zeros((1, 4), np.float32)
        want = optax.ctc_loss(jnp.asarray(logits), jnp.asarray(zeros4),
                              jnp.asarray(labels), jnp.asarray(zeros4))
        got = ctc_loss_compact(jnp.asarray(logits), jnp.asarray(zeros4),
                               jnp.asarray(labels), jnp.asarray(zeros4))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

        # single frame, single label
        logits = rng.standard_normal((1, 1, 5)).astype(np.float32)
        labels = np.asarray([[2]], np.int32)
        z1 = np.zeros((1, 1), np.float32)
        want = optax.ctc_loss(jnp.asarray(logits), jnp.asarray(z1),
                              jnp.asarray(labels), jnp.asarray(z1))
        got = ctc_loss_compact(jnp.asarray(logits), jnp.asarray(z1),
                               jnp.asarray(labels), jnp.asarray(z1))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
