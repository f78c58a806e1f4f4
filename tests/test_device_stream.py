"""On-device streaming decode (beam+FSM in jit) vs host StreamDetector.

The device path must reproduce the host FSM's decisions — activations,
keyword identity, span, score, refractory suppression, stale-beam
resets — chunk for chunk, because the batched serving engine swaps one
in for the other per configuration.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from wekws_tpu.decode.device_stream import (
    init_stream_state,
    make_keyword_arrays,
    stream_detect_step,
)
from wekws_tpu.runtime.keyword_spotter import StreamDetector

V = 8
KEYWORDS = {
    "kw_a": {"token_id": (1, 2, 3), "token_str": "1 2 3"},
    "kw_b": {"token_id": (4, 5), "token_str": "4 5"},
}
IDXSET = {0, 1, 2, 3, 4, 5}

FSM = dict(
    threshold=0.3,
    min_frames=2,
    max_frames=60,
    interval_frames=10,
)


def planted_stream(rng, t_total, spans):
    """Dirichlet noise with keyword token spellings planted at spans.

    spans: list of (start_frame, token_seq). Each token holds 2 frames
    with 2 blank frames after it (strong 0.9 peaks)."""
    probs = rng.dirichlet(np.ones(V) * 0.25, size=t_total).astype(
        np.float32
    ) * 0.2
    probs[:, 0] += 0.8  # mostly blank background
    probs /= probs.sum(1, keepdims=True)
    for start, seq in spans:
        t = start
        for tok in seq:
            for _ in range(2):
                if t < t_total:
                    probs[t] = (1 - 0.9) / (V - 1)
                    probs[t, tok] = 0.9
                t += 1
            for _ in range(2):
                if t < t_total:
                    probs[t] = (1 - 0.92) / (V - 1)
                    probs[t, 0] = 0.92
                t += 1
    return probs


def host_detectors(n, downsampling=1):
    dets = []
    for _ in range(n):
        d = StreamDetector(
            FSM["threshold"], FSM["min_frames"], FSM["max_frames"],
            FSM["interval_frames"], 3, 20, 0.01, downsampling,
        )
        d.set_tables(KEYWORDS, IDXSET)
        dets.append(d)
    return dets


def run_device(probs_all, chunk, downsampling=1, resets=None,
               inactive=None):
    """probs_all: (B, T, V). Returns list of per-chunk event dicts."""
    b, t_total, _ = probs_all.shape
    kw_tok, kw_len, mask, names = make_keyword_arrays(KEYWORDS, V)
    state = init_stream_state(b)
    out = []
    for c0 in range(0, t_total, chunk):
        reset = np.zeros((b,), bool)
        if resets and c0 in resets:
            for i in resets[c0]:
                reset[i] = True
        active = np.ones((b,), bool)
        if inactive and c0 in inactive:
            for i in inactive[c0]:
                active[i] = False
        t0 = np.full((b,), c0 * downsampling, np.int32)
        state, ev = stream_detect_step(
            state,
            jnp.asarray(probs_all[:, c0 : c0 + chunk]),
            jnp.asarray(active),
            jnp.asarray(reset),
            jnp.asarray(t0),
            jnp.asarray(kw_tok),
            jnp.asarray(kw_len),
            jnp.asarray(mask),
            downsampling=downsampling,
            **FSM,
        )
        out.append(
            {k: np.asarray(v) for k, v in ev.items()} | {"names": names}
        )
    return out


def run_host(probs_all, chunk, downsampling=1, resets=None,
             inactive=None):
    b, t_total, _ = probs_all.shape
    dets = host_detectors(b, downsampling)
    out = []
    for c0 in range(0, t_total, chunk):
        if resets and c0 in resets:
            for i in resets[c0]:
                dets[i].reset_all()
        skip = (inactive or {}).get(c0, set())
        evs = []
        for i in range(b):
            if i in skip:
                evs.append({})
                continue
            idx = (np.arange(c0, c0 + chunk) * downsampling).astype(
                np.int64
            )
            evs.append(dets[i].process(idx, probs_all[i, c0 : c0 + chunk]))
        out.append(evs)
    return out


def compare(dev_events, host_events, b):
    for ci, (dev, host) in enumerate(zip(dev_events, host_events)):
        for i in range(b):
            h = host[i]
            fired_h = bool(h) and h.get("state") == 1
            fired_d = bool(dev["fired"][i])
            assert fired_d == fired_h, (ci, i, h, dev)
            if fired_h:
                assert dev["names"][int(dev["kw"][i])] == h["keyword"]
                # host start/end are seconds at its resolution (0.01)
                assert int(dev["start"][i]) == round(h["start"] / 0.01)
                assert int(dev["end"][i]) == round(h["end"] / 0.01)
                # node tracks on merged prefixes keep the max-pnb
                # contributor on device vs first-created on host (the
                # documented batched_ctc approximation). Traced on seed
                # 1: both sides match the SAME tail hypothesis (1,2,3)
                # at the same offset but carry different node probs
                # (0.00129 vs 0.00078), and the reference's persistent
                # hit_score quirk accumulates the gap across frames.
                # Decisions and timestamps match exactly; clean
                # activations (dominant path, score>0.8) match to 1e-7.
                np.testing.assert_allclose(
                    float(dev["score"][i]), h["score"], rtol=0.35
                )
                if h["score"] > 0.8:
                    np.testing.assert_allclose(
                        float(dev["score"][i]), h["score"], rtol=1e-5
                    )


class TestDeviceStreamFSM:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_parity_planted_keywords(self, seed):
        rng = np.random.default_rng(seed)
        b, t_total = 4, 96
        spans = {
            0: [(8, (1, 2, 3)), (60, (4, 5))],
            1: [(20, (4, 5))],
            2: [],  # noise only
            3: [(4, (1, 2)), (40, (1, 2, 3))],  # partial then full
        }
        probs = np.stack(
            [planted_stream(rng, t_total, spans[i]) for i in range(b)]
        )
        dev = run_device(probs, chunk=8)
        host = run_host(probs, chunk=8)
        compare(dev, host, b)
        total_fired = sum(int(d["fired"].sum()) for d in dev)
        assert total_fired >= 4  # the planted keywords actually fire

    def test_refractory_and_repeat(self):
        """Same keyword twice within the refractory window: second
        activation must be suppressed in both implementations."""
        rng = np.random.default_rng(7)
        probs = np.stack(
            [planted_stream(rng, 64, [(4, (4, 5)), (16, (4, 5)),
                                      (40, (4, 5))])]
        )
        dev = run_device(probs, chunk=8)
        host = run_host(probs, chunk=8)
        compare(dev, host, 1)
        fired_chunks = [i for i, d in enumerate(dev) if d["fired"][0]]
        assert len(fired_chunks) >= 2  # first and the post-refractory one

    def test_mid_stream_reset_parity(self):
        rng = np.random.default_rng(3)
        probs = np.stack(
            [planted_stream(rng, 64, [(8, (1, 2, 3)), (36, (1, 2, 3))])]
            * 2
        )
        resets = {32: {0}}
        dev = run_device(probs, chunk=8, resets=resets)
        host = run_host(probs, chunk=8, resets=resets)
        compare(dev, host, 2)

    def test_inactive_rows_frozen(self):
        """A stream that skips chunks (slow client) must end up in the
        same state as one fed the same frames without gaps."""
        rng = np.random.default_rng(11)
        probs1 = planted_stream(rng, 48, [(20, (1, 2, 3))])
        # stream 0 participates every chunk; stream 1's chunks 1-2 are
        # inactive, then it receives those frames later — the host run
        # below feeds both identically, so parity requires frozen rows.
        probs = np.stack([probs1, probs1])
        inactive = {8: {1}, 16: {1}}
        b, t_total = 2, 48
        kw_tok, kw_len, mask, names = make_keyword_arrays(KEYWORDS, V)
        state = init_stream_state(b)
        fired1 = []
        next1 = 0  # next frame index stream 1 should consume
        for c0 in range(0, t_total, 8):
            active = np.array(
                [True, c0 not in (inactive.keys() if False else {8, 16})]
            )
            feats = np.zeros((b, 8, V), np.float32)
            feats[0] = probs[0, c0 : c0 + 8]
            t0 = np.array([c0, next1], np.int32)
            if active[1]:
                feats[1] = probs[1, next1 : next1 + 8]
            state, ev = stream_detect_step(
                state, jnp.asarray(feats), jnp.asarray(active),
                jnp.zeros((b,), bool), jnp.asarray(t0),
                jnp.asarray(kw_tok), jnp.asarray(kw_len),
                jnp.asarray(mask), downsampling=1, **FSM,
            )
            if active[1]:
                next1 += 8
            if ev["fired"][1]:
                fired1.append((int(ev["start"][1]), int(ev["end"][1])))
        # stream 1 consumed fewer frames; drain the rest
        while next1 < t_total:
            feats = np.zeros((b, 8, V), np.float32)
            feats[1] = probs[1, next1 : next1 + 8]
            t0 = np.array([t_total, next1], np.int32)
            state, ev = stream_detect_step(
                state, jnp.asarray(feats),
                jnp.asarray(np.array([False, True])),
                jnp.zeros((b,), bool), jnp.asarray(t0),
                jnp.asarray(kw_tok), jnp.asarray(kw_len),
                jnp.asarray(mask), downsampling=1, **FSM,
            )
            next1 += 8
            if ev["fired"][1]:
                fired1.append((int(ev["start"][1]), int(ev["end"][1])))
        host = run_host(probs[:1], chunk=8)
        fired0 = [
            (round(h[0]["start"] / 0.01), round(h[0]["end"] / 0.01))
            for h in host
            if h[0] and h[0].get("state") == 1
        ]
        assert fired1 == fired0 and fired0

    def test_downsampling_indices(self):
        """frame_skip=3: absolute indices stride by 3; duration gates
        operate on absolute frames in both paths."""
        rng = np.random.default_rng(5)
        probs = np.stack([planted_stream(rng, 48, [(10, (4, 5))])])
        dev = run_device(probs, chunk=8, downsampling=3)
        host = run_host(probs, chunk=8, downsampling=3)
        compare(dev, host, 1)
        assert any(d["fired"][0] for d in dev)

    def test_stale_beam_reset(self):
        """A partial keyword followed by long silence must not fire
        when the tail arrives after max_frames (stale reset)."""
        rng = np.random.default_rng(9)
        # tokens 1,2 at t=4, then silence, token 3 at t=80 (> max 60)
        probs = planted_stream(rng, 112, [(4, (1, 2))])
        tail = planted_stream(rng, 112, [(80, (3,))])
        probs[80:92] = tail[80:92]
        probs = probs[None]
        dev = run_device(probs, chunk=8)
        host = run_host(probs, chunk=8)
        compare(dev, host, 1)
        assert not any(d["fired"][0] for d in dev)


class TestBatchSpotterDeviceDecode:
    """BatchKeywordSpotter(device_decode=True) must reproduce the
    host-decode engine's detections end-to-end (frontend -> model ->
    beam -> FSM), including staggered arrival and slot resets."""

    def _make(self, spotter_setup, device_decode, n=3):
        from wekws_tpu.runtime import BatchKeywordSpotter

        ckpt, config, tokens = spotter_setup
        eng = BatchKeywordSpotter(
            ckpt, config, tokens, None, threshold=0.05,
            num_streams=n, step_frames=8, min_frames=1,
        ) if not device_decode else BatchKeywordSpotter(
            ckpt, config, tokens, None, threshold=0.05,
            num_streams=n, step_frames=8, min_frames=1,
            device_decode=True,
        )
        eng.set_keywords("hi,hx")
        return eng

    def _drive(self, eng, waves, reset_at=None):
        detections = []
        offsets = [0] * len(waves)
        chunk = [4800, 9600, 3200]
        rounds = 0
        while any(offsets[i] < len(waves[i]) for i in range(len(waves))):
            for i in range(len(waves)):
                if offsets[i] < len(waves[i]):
                    eng.accept_wave(
                        i, waves[i][offsets[i] : offsets[i] + chunk[i]]
                    )
                    offsets[i] += chunk[i]
            while True:
                results = eng.step()
                if not results:
                    break
                for i, r in results.items():
                    if r and r.get("state") == 1:
                        detections.append(
                            (i, r["keyword"], round(r["start"], 2),
                             round(r["end"], 2), round(r["score"], 3))
                        )
            rounds += 1
            if reset_at is not None and rounds == reset_at:
                eng.reset_stream(0)
        for i, r in eng.flush().items():
            if r and r.get("state") == 1:
                detections.append(
                    (i, r["keyword"], round(r["start"], 2),
                     round(r["end"], 2), round(r["score"], 3))
                )
        return sorted(detections)

    @pytest.mark.parametrize("reset_at", [None, 2])
    def test_matches_host_decode(self, spotter_setup, rng, reset_at):
        waves = [
            (rng.standard_normal(24000) * 3000).astype("<i2").tobytes()
            for _ in range(3)
        ]
        host_eng = self._make(spotter_setup, device_decode=False)
        dev_eng = self._make(spotter_setup, device_decode=True)
        host_det = self._drive(host_eng, waves, reset_at)
        dev_det = self._drive(dev_eng, waves, reset_at)
        # scores can drift on merged noise paths (documented); compare
        # decisions and timestamps strictly, scores loosely
        assert [d[:4] for d in dev_det] == [d[:4] for d in host_det]
        for d, h in zip(dev_det, host_det):
            np.testing.assert_allclose(d[4], h[4], rtol=0.35, atol=0.02)

    def test_requires_keywords(self, spotter_setup):
        from wekws_tpu.runtime import BatchKeywordSpotter

        ckpt, config, tokens = spotter_setup
        eng = BatchKeywordSpotter(
            ckpt, config, tokens, None, threshold=0.5,
            num_streams=1, step_frames=4, device_decode=True,
        )
        eng.accept_wave(0, np.zeros(8000, "<i2").tobytes())
        with pytest.raises(RuntimeError, match="set_keywords"):
            eng.step()


class TestMeshShardedServing:
    """Stream-axis sharding over a device mesh: the serving step is
    per-row, so sharded and single-device engines must be bit-equal."""

    def _detections(self, eng, waves):
        out = []
        offsets = [0] * len(waves)
        while any(offsets[i] < len(waves[i]) for i in range(len(waves))):
            for i in range(len(waves)):
                if offsets[i] < len(waves[i]):
                    eng.accept_wave(i, waves[i][offsets[i] : offsets[i] + 6400])
                    offsets[i] += 6400
            while True:
                results = eng.step()
                if not results:
                    break
                for i, r in results.items():
                    if r and r.get("state") == 1:
                        out.append((i, r["keyword"], round(r["start"], 2),
                                    round(r["end"], 2)))
        for i, r in eng.flush().items():
            if r and r.get("state") == 1:
                out.append((i, r["keyword"], round(r["start"], 2),
                            round(r["end"], 2)))
        return sorted(out)

    @pytest.mark.parametrize(
        "device_decode,device_frontend",
        [(False, False), (True, False), (False, True), (True, True)],
    )
    def test_sharded_matches_single_device(
        self, spotter_setup, rng, device_decode, device_frontend
    ):
        import jax
        from jax.sharding import Mesh

        from wekws_tpu.runtime import BatchKeywordSpotter

        assert len(jax.devices()) >= 8  # conftest forces the CPU mesh
        mesh = Mesh(np.array(jax.devices()[:8]), ("streams",))
        ckpt, config, tokens = spotter_setup
        waves = [
            (rng.standard_normal(19200) * 3000).astype("<i2").tobytes()
            for _ in range(8)
        ]

        def build(m):
            eng = BatchKeywordSpotter(
                ckpt, config, tokens, None, threshold=0.05,
                num_streams=8, step_frames=8, min_frames=1,
                device_decode=device_decode,
                device_frontend=device_frontend, mesh=m,
            )
            eng.set_keywords("hi,hx")
            return eng

        base = self._detections(build(None), waves)
        sharded = self._detections(build(mesh), waves)
        assert sharded == base
        assert base  # the random audio actually triggers something

    def test_stream_count_must_divide(self, spotter_setup):
        import jax
        from jax.sharding import Mesh

        from wekws_tpu.runtime import BatchKeywordSpotter

        mesh = Mesh(np.array(jax.devices()[:8]), ("streams",))
        ckpt, config, tokens = spotter_setup
        with pytest.raises(AssertionError, match="multiple of the mesh"):
            BatchKeywordSpotter(
                ckpt, config, tokens, None, threshold=0.5,
                num_streams=6, mesh=mesh,
            )
