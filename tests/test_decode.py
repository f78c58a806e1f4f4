"""Decoder tests: CTC prefix beam search, keyword match, edit distance."""

import numpy as np

from wekws_tpu.decode import (
    Calculator,
    acc_utterance,
    ctc_prefix_beam_search,
)
from wekws_tpu.decode.ctc_prefix_beam_search import PrefixBeam, is_sublist


def probs_for(seq, vocab, peak=0.9):
    """Frame posteriors that spell out ``seq`` (0 = blank)."""
    t = len(seq)
    p = np.full((t, vocab), (1.0 - peak) / (vocab - 1))
    for i, s in enumerate(seq):
        p[i] = (1.0 - peak) / (vocab - 1)
        p[i, s] = peak
    return p.astype(np.float32)


class TestPrefixBeamSearch:
    def test_simple_greedy_path(self):
        # blank, a, a, blank, b  ->  [a, b]
        probs = probs_for([0, 1, 1, 0, 2], vocab=4)
        hyps = ctc_prefix_beam_search(probs)
        best = hyps[0]
        assert best[0] == (1, 2)
        assert len(best[2]) == 2
        assert best[2][0]["token"] == 1
        assert best[2][1]["token"] == 2
        # timestamps: 'a' seen best at frame 1 or 2, 'b' at frame 4
        assert best[2][0]["frame"] in (1, 2)
        assert best[2][1]["frame"] == 4

    def test_repeat_collapse_vs_blank_separation(self):
        # a a -> 'a'; a blank a -> 'a a'
        h1 = ctc_prefix_beam_search(probs_for([1, 1], 3))
        assert h1[0][0] == (1,)
        h2 = ctc_prefix_beam_search(probs_for([1, 0, 1], 3))
        assert h2[0][0] == (1, 1)

    def test_tokenset_filtering(self):
        probs = probs_for([1, 2, 3], 5)
        hyps = ctc_prefix_beam_search(probs, keywords_tokenset={1, 3})
        assert hyps[0][0] == (1, 3)

    def test_streaming_matches_offline(self):
        rng = np.random.default_rng(7)
        probs = rng.dirichlet(np.ones(6) * 0.3, size=30).astype(np.float32)
        offline = ctc_prefix_beam_search(probs)
        beam = PrefixBeam()
        for t in range(30):
            beam.step(probs[t])
        online = beam.hypotheses()
        assert [h[0] for h in offline] == [h[0] for h in online]
        for a, b in zip(offline, online):
            np.testing.assert_allclose(a[1], b[1], rtol=1e-6)

    def test_probability_is_sane(self):
        probs = probs_for([0, 1, 0, 2, 0], 4, peak=0.99)
        hyps = ctc_prefix_beam_search(probs)
        assert 0.9 < hyps[0][1] <= 1.0


class TestIsSublist:
    def test_cases(self):
        assert is_sublist([1, 2, 3, 4], [2, 3]) == 1
        assert is_sublist([1, 2, 3], [1, 2, 3]) == 0
        assert is_sublist([1, 2, 3], [3, 4]) == -1
        assert is_sublist([1, 2], [1, 2, 3]) == -1
        # match at the very tail (reference's off-by-one case)
        assert is_sublist([1, 2, 3, 4], [3, 4]) == 2
        assert is_sublist([5], []) == 0


class TestCalculator:
    def test_perfect(self):
        c = Calculator()
        r = c.calculate(["a", "b", "c"], ["a", "b", "c"])
        assert r["all"] == 3 and r["cor"] == 3
        assert r["ins"] == r["del"] == r["sub"] == 0

    def test_mixed_errors(self):
        c = Calculator()
        r = c.calculate(["a", "b", "c", "d"], ["a", "x", "d"])
        # b->x sub, c deleted (or equivalent-cost alignment)
        assert r["all"] == 4
        assert r["sub"] + r["del"] + r["ins"] == 2
        overall = c.overall()
        assert overall["all"] == 4

    def test_accumulates_across_calls(self):
        c = Calculator()
        c.calculate(["a"], ["a"])
        c.calculate(["a"], ["b"])
        assert c.data["a"]["all"] == 2
        assert c.data["a"]["cor"] == 1
        assert c.data["a"]["sub"] == 1


class TestAccUtterance:
    def test_perfect_decode(self):
        probs = probs_for([1, 0, 2, 0, 3], 5, peak=0.95)[None]
        acc = acc_utterance(
            probs, np.array([[1, 2, 3]]), [5], [3]
        )
        assert acc == 100.0

    def test_partial(self):
        probs = probs_for([1, 0, 2], 5, peak=0.95)[None]
        acc = acc_utterance(probs, np.array([[1, 2, 3]]), [3], [3])
        assert 0.0 < acc < 100.0


class TestGreedyDevice:
    """On-device greedy decode + batched Levenshtein (losses' cv
    accuracy path) vs naive host references."""

    def test_greedy_collapse(self):
        import jax.numpy as jnp

        from wekws_tpu.decode import ctc_greedy_decode

        # frame argmax path: 1 1 0 2 2 2 0 0 1 -> collapse -> 1 2 1
        path = [1, 1, 0, 2, 2, 2, 0, 0, 1]
        logits = np.zeros((1, len(path), 4), np.float32)
        for t, s in enumerate(path):
            logits[0, t, s] = 5.0
        hyps, lens = ctc_greedy_decode(
            jnp.asarray(logits), jnp.asarray([len(path)])
        )
        assert int(lens[0]) == 3
        assert list(np.asarray(hyps)[0, :3]) == [1, 2, 1]

    def test_edit_distance_matches_naive(self, rng=np.random.RandomState(7)):
        import jax.numpy as jnp

        from wekws_tpu.decode import batched_edit_distance

        def naive(h, r):
            d = np.zeros((len(h) + 1, len(r) + 1), np.int32)
            d[:, 0] = np.arange(len(h) + 1)
            d[0, :] = np.arange(len(r) + 1)
            for i in range(1, len(h) + 1):
                for j in range(1, len(r) + 1):
                    d[i, j] = min(
                        d[i - 1, j] + 1,
                        d[i, j - 1] + 1,
                        d[i - 1, j - 1] + (h[i - 1] != r[j - 1]),
                    )
            return d[len(h), len(r)]

        B, T, U = 16, 12, 8
        hyps = rng.randint(1, 5, (B, T)).astype(np.int32)
        hyp_lens = rng.randint(0, T + 1, (B,)).astype(np.int32)
        refs = rng.randint(1, 5, (B, U)).astype(np.int32)
        ref_lens = rng.randint(0, U + 1, (B,)).astype(np.int32)
        got = np.asarray(batched_edit_distance(
            jnp.asarray(hyps), jnp.asarray(hyp_lens),
            jnp.asarray(refs), jnp.asarray(ref_lens),
        ))
        for b in range(B):
            want = naive(list(hyps[b, :hyp_lens[b]]),
                         list(refs[b, :ref_lens[b]]))
            assert got[b] == want, (b, got[b], want)

    def test_ctc_cv_accuracy_nonzero(self):
        """criterion_per_utt('ctc') now reports a real quality signal
        (VERDICT round 1: cv_acc was a constant 0 for CTC runs)."""
        import jax.numpy as jnp

        from wekws_tpu.losses import criterion_per_utt

        probs = probs_for([1, 0, 2, 0, 3], 5, peak=0.95)[None]
        logits = jnp.log(jnp.asarray(probs) + 1e-8)
        loss_b, acc_b = criterion_per_utt(
            "ctc", logits, jnp.asarray([[1, 2, 3]]),
            jnp.asarray([5]), jnp.asarray([3]),
        )
        assert float(acc_b[0]) == 1.0
        loss_b, acc_b = criterion_per_utt(
            "ctc", logits, jnp.asarray([[1, 2, 9]]),
            jnp.asarray([5]), jnp.asarray([3]),
        )
        assert abs(float(acc_b[0]) - 2.0 / 3.0) < 1e-6
