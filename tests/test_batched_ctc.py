"""Batched on-device CTC beam search vs the host decoder."""

import jax.numpy as jnp
import numpy as np
import pytest

from wekws_tpu.decode import ctc_prefix_beam_search
from wekws_tpu.decode.batched_ctc import (
    batched_ctc_prefix_beam_search,
    hyps_from_arrays,
)


def spelled(seq, v, peak=0.9):
    p = np.full((len(seq), v), (1 - peak) / (v - 1), np.float32)
    for t, s in enumerate(seq):
        p[t, s] = peak
    return p


class TestBatchedCtc:
    def test_spelled_sequences_exact(self):
        v = 6
        seqs = [
            [0, 1, 1, 0, 2],
            [3, 0, 3, 0, 3],
            [0, 0, 0, 0, 0],
            [4, 4, 0, 4, 4],
        ]
        t = 5
        probs = np.stack([spelled(s, v) for s in seqs])
        lengths = np.full(len(seqs), t, np.int32)
        result = batched_ctc_prefix_beam_search(
            jnp.asarray(probs), jnp.asarray(lengths), path_beam=8
        )
        for i, seq in enumerate(seqs):
            want = ctc_prefix_beam_search(probs[i], t, None, 3, 8)
            got = hyps_from_arrays(
                {k: np.asarray(val) for k, val in result.items()}, i
            )
            assert got[0][0] == want[0][0], (i, got[0][0], want[0][0])
            np.testing.assert_allclose(got[0][1], want[0][1], rtol=1e-4)
            # timestamps on the best path
            for gn, wn in zip(got[0][2], want[0][2]):
                assert gn["token"] == wn["token"]
                assert gn["frame"] == wn["frame"]

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_posteriors_match_host(self, seed):
        """Every host hypothesis carrying non-negligible mass must be
        present with the same score.  (Hypotheses at < 1e-3 of the top
        score are tie-broken differently under beam pruning — scores
        are unnormalized products, so after ~20 frames the beam tail is
        numerically indistinguishable noise on both sides.)"""
        rng = np.random.default_rng(seed)
        b, t, v = 4, 16, 8
        probs = rng.dirichlet(np.ones(v) * 0.4, size=(b, t)).astype(
            np.float32
        )
        lengths = np.array([16, 12, 16, 9], np.int32)
        result = batched_ctc_prefix_beam_search(
            jnp.asarray(probs), jnp.asarray(lengths), path_beam=20
        )
        res = {k: np.asarray(val) for k, val in result.items()}
        for i in range(b):
            want = ctc_prefix_beam_search(
                probs[i], int(lengths[i]), None, 3, 20
            )
            got = hyps_from_arrays(res, i)
            assert got[0][0] == want[0][0], (i, got[0][0], want[0][0])
            np.testing.assert_allclose(got[0][1], want[0][1], rtol=1e-3)
            got_map = {h[0]: h[1] for h in got}
            cutoff = want[0][1] * 1e-3
            for p, s, _nodes in want:
                if s < cutoff:
                    continue
                assert p in got_map, (i, p, s)
                np.testing.assert_allclose(got_map[p], s, rtol=1e-3)

    def test_tokenset_pruning(self):
        v = 6
        probs = np.stack([spelled([0, 1, 0, 5, 0, 2], v)])
        mask = np.zeros(v, bool)
        mask[[0, 1, 2]] = True
        result = batched_ctc_prefix_beam_search(
            jnp.asarray(probs), jnp.asarray([6]),
            tokenset_mask=jnp.asarray(mask),
        )
        res = {k: np.asarray(val) for k, val in result.items()}
        got = hyps_from_arrays(res, 0)
        assert got[0][0] == (1, 2)

    def test_keyword_detection_compatible(self):
        """Device decode feeds the existing keyword matcher."""
        from wekws_tpu.eval.score_ctc import detect_keyword

        v = 6
        probs = np.stack([spelled([0, 1, 1, 0, 2, 0], v, peak=0.95)])
        result = batched_ctc_prefix_beam_search(
            jnp.asarray(probs), jnp.asarray([6])
        )
        res = {k: np.asarray(val) for k, val in result.items()}
        hyps = hyps_from_arrays(res, 0)
        hit = detect_keyword(
            hyps, {"kw": {"token_id": (1, 2), "token_str": "1 2"}}
        )
        assert hit is not None
        word, score, start, end = hit
        assert word == "kw" and score > 0.9
        assert start in (1, 2) and end == 4
