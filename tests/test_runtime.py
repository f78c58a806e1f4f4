"""Streaming runtime tests.

Key property: the chunk-incremental frontend + cached model forward
produce the same posteriors as the offline device pipeline + full
forward, so streaming detection matches offline scoring.
"""

import json

import jax
import numpy as np
import pytest
import yaml

from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline
from wekws_tpu.frontend.kaldi import FrontendConfig
from wekws_tpu.runtime import KeyWordSpotter, StreamingFrontend


class TestStreamingFrontend:
    @pytest.mark.parametrize("left,right,skip", [
        (0, 0, 1),
        (2, 2, 1),
        (2, 2, 3),
        (1, 0, 2),
    ])
    def test_matches_offline_pipeline(self, rng, left, right, skip):
        cfg = FrontendConfig(num_mel_bins=23, dither=0.0)
        wave = (rng.standard_normal(16000 * 2) * 1000).astype(np.float32)

        conf = {
            "feats_type": "fbank",
            "fbank_conf": {"num_mel_bins": 23, "frame_shift": 10,
                           "frame_length": 25, "dither": 0.0},
            "frame_skip": skip,
        }
        if left or right:
            conf["context_expansion"] = True
            conf["context_expansion_conf"] = {"left": left, "right": right}
        offline = DeviceFeaturePipeline.from_conf(conf, training=False)
        off_feats, off_len = offline(
            wave[None, :], np.array([len(wave)], np.int32)
        )
        off_feats = np.asarray(off_feats)[0, : int(off_len[0])]

        sf = StreamingFrontend(cfg, left, right, skip)
        chunks = []
        indices = []
        for start in range(0, len(wave), 4800):  # 0.3 s chunks
            f, idx = sf.accept_waveform(wave[start : start + 4800])
            if len(f):
                chunks.append(f)
                indices.append(idx)
        streamed = np.concatenate(chunks, axis=0)
        idx = np.concatenate(indices)

        n = min(len(streamed), len(off_feats))
        assert n > 50
        np.testing.assert_allclose(
            streamed[:n], off_feats[:n], atol=2e-3, rtol=1e-4
        )
        # absolute frame indices are the global skip grid
        np.testing.assert_array_equal(idx % skip, 0)
        np.testing.assert_array_equal(np.diff(idx), skip)

    def test_tiny_chunks_accumulate(self, rng):
        cfg = FrontendConfig(num_mel_bins=23, dither=0.0)
        sf = StreamingFrontend(cfg)
        wave = (rng.standard_normal(8000) * 1000).astype(np.float32)
        total = 0
        for start in range(0, len(wave), 160):  # 10ms chunks
            f, _ = sf.accept_waveform(wave[start : start + 160])
            total += len(f)
        # full wave has 48 frames; streaming may lag by the last frame
        assert total >= 47


class TestKeyWordSpotter:
    def test_streaming_forward_runs(self, spotter_setup, rng):
        ckpt, config, tokens = spotter_setup
        spotter = KeyWordSpotter(
            ckpt, config, tokens, None, threshold=0.5
        )
        spotter.set_keywords("hi")
        assert spotter.keywords_token["hi"]["token_id"] == (1, 2)
        pcm = (rng.standard_normal(16000) * 1000).astype("<i2").tobytes()
        for off in range(0, len(pcm), 9600):
            result = spotter.forward(pcm[off : off + 9600])
        assert spotter.total_frames > 0
        assert isinstance(result, dict)

    def test_detection_fsm_fires_on_injected_posteriors(self, spotter_setup):
        """Replace the model with deterministic posteriors spelling the
        keyword and check the FSM's gates."""
        ckpt, config, tokens = spotter_setup
        spotter = KeyWordSpotter(
            ckpt, config, tokens, None,
            threshold=0.3, min_frames=1, max_frames=250,
        )
        spotter.set_keywords("hi")

        v = 4
        frames = {10: 1, 30: 2}  # 'h' at frame 10, 'i' at frame 30

        def fake_apply(feats, cache):
            t = feats.shape[1]
            probs = np.full((1, t, v), 0.001, np.float32)
            probs[:, :, 0] = 0.9
            for i in range(t):
                absolute = spotter._frame_indices[i]
                if absolute in frames:
                    probs[0, i, 0] = 0.05
                    probs[0, i, frames[absolute]] = 0.9
            return probs, cache

        spotter._apply = fake_apply
        pcm = np.zeros(16000, np.float32)
        pcm_bytes = (pcm * 100).astype("<i2").tobytes()
        activated = None
        for off in range(0, len(pcm_bytes), 9600):
            result = spotter.forward(pcm_bytes[off : off + 9600])
            if result and result.get("state") == 1:
                activated = result
        assert activated is not None
        assert activated["keyword"] == "hi"
        # start/end in seconds at 10ms resolution
        assert abs(activated["start"] - 0.10) < 0.02
        assert abs(activated["end"] - 0.30) < 0.02
        assert activated["score"] > 0.5

    def test_threshold_gate_blocks(self, spotter_setup):
        ckpt, config, tokens = spotter_setup
        spotter = KeyWordSpotter(
            ckpt, config, tokens, None,
            threshold=0.99, min_frames=1,
        )
        spotter.set_keywords("hi")

        def fake_apply(feats, cache):
            t = feats.shape[1]
            probs = np.full((1, t, 4), 0.001, np.float32)
            probs[:, :, 0] = 0.9
            for i in range(t):
                a = spotter._frame_indices[i]
                if a == 10:
                    probs[0, i, 0] = 0.3
                    probs[0, i, 1] = 0.6
                if a == 30:
                    probs[0, i, 0] = 0.3
                    probs[0, i, 2] = 0.6
            return probs, cache

        spotter._apply = fake_apply
        pcm_bytes = np.zeros(16000, "<i2").tobytes()
        for off in range(0, len(pcm_bytes), 9600):
            result = spotter.forward(pcm_bytes[off : off + 9600])
        # sqrt(0.6*0.6)=0.6 < 0.99 -> never activates
        assert not result or result.get("state") == 0


@pytest.fixture
def mdtc_spotter_setup(tmp_path):
    """MDTC CTC artifacts for the fused spotter path."""
    import yaml as _yaml

    from wekws_tpu.models import init_model
    from wekws_tpu.train import save_checkpoint

    configs = {
        "dataset_conf": {
            "feats_type": "fbank",
            "fbank_conf": {"num_mel_bins": 23, "frame_shift": 10,
                           "frame_length": 25, "dither": 1.0},
        },
        "model": {
            "input_dim": 23, "output_dim": 4, "hidden_dim": 16,
            "preprocessing": {"type": "linear"},
            "backbone": {"type": "mdtc", "num_stack": 2, "stack_size": 2,
                         "kernel_size": 5, "hidden_dim": 16,
                         "causal": True},
            "classifier": {"type": "identity", "dropout": 0.0},
            "activation": {"type": "identity"},
        },
    }
    config_path = tmp_path / "config.yaml"
    config_path.write_text(_yaml.dump(configs))
    model = init_model(configs["model"])
    feats0 = np.zeros((1, 10, 23), np.float32)
    variables = model.init(jax.random.PRNGKey(0), feats0)
    ckpt = tmp_path / "final.ckpt"
    save_checkpoint(
        str(ckpt), variables["params"], variables.get("batch_stats", {})
    )
    tokens = tmp_path / "tokens.txt"
    tokens.write_text("<blk> 0\nh 1\ni 2\nx 3\n")
    return str(ckpt), str(config_path), str(tokens)


class TestFusedSpotter:
    def test_fused_posteriors_match_standard(self, mdtc_spotter_setup, rng):
        """use_fused spotter emits the same posteriors as the flax path
        (pallas interpret mode on CPU)."""
        from jax.experimental.pallas import tpu as pltpu

        ckpt, config, tokens = mdtc_spotter_setup
        std = KeyWordSpotter(ckpt, config, tokens, None, threshold=0.5)
        fused = KeyWordSpotter(
            ckpt, config, tokens, None, threshold=0.5, use_fused=True
        )
        assert fused._fused_init_cache is not None
        pcm = (rng.standard_normal(16000) * 1000).astype("<i2").tobytes()

        def run(spotter):
            spotter.reset_all()
            probs = []
            orig = spotter._apply_jit

            def capture(feats, cache):
                out, c = orig(feats, cache)
                probs.append(np.asarray(out))
                return out, c

            spotter._apply_jit = capture
            for off in range(0, len(pcm), 9600):
                spotter.forward(pcm[off : off + 9600])
            return np.concatenate(probs, axis=1)

        with pltpu.force_tpu_interpret_mode():
            got = run(fused)
        want = run(std)
        n = min(got.shape[1], want.shape[1])
        np.testing.assert_allclose(
            got[:, :n], want[:, :n], atol=5e-4, rtol=1e-3
        )


@pytest.fixture
def fsmn_spotter_setup(tmp_path):
    """FSMN CTC artifacts for the fused spotter path."""
    import yaml as _yaml

    from wekws_tpu.models import init_model
    from wekws_tpu.train import save_checkpoint

    configs = {
        "dataset_conf": {
            "feats_type": "fbank",
            "fbank_conf": {"num_mel_bins": 23, "frame_shift": 10,
                           "frame_length": 25, "dither": 1.0},
        },
        "model": {
            "input_dim": 23, "output_dim": 4, "hidden_dim": 32,
            "preprocessing": {"type": "none"},
            "backbone": {"type": "fsmn", "input_affine_dim": 24,
                         "num_layers": 2, "linear_dim": 32,
                         "proj_dim": 16, "left_order": 4,
                         "right_order": 1, "left_stride": 1,
                         "right_stride": 1, "output_affine_dim": 24},
            "classifier": {"type": "identity", "dropout": 0.0},
            "activation": {"type": "identity"},
        },
    }
    config_path = tmp_path / "config.yaml"
    config_path.write_text(_yaml.dump(configs))
    model = init_model(configs["model"])
    feats0 = np.zeros((1, 10, 23), np.float32)
    variables = model.init(jax.random.PRNGKey(0), feats0)
    ckpt = tmp_path / "final.ckpt"
    save_checkpoint(
        str(ckpt), variables["params"], variables.get("batch_stats", {})
    )
    tokens = tmp_path / "tokens.txt"
    tokens.write_text("<blk> 0\nh 1\ni 2\nx 3\n")
    return str(ckpt), str(config_path), str(tokens)


class TestFusedSpotterFSMN:
    def test_fused_fsmn_posteriors_match_standard(
        self, fsmn_spotter_setup, rng
    ):
        """The fused serving path now covers FSMN (second-most-served
        backbone): use_fused spotter == flax spotter."""
        from jax.experimental.pallas import tpu as pltpu

        ckpt, config, tokens = fsmn_spotter_setup
        std = KeyWordSpotter(ckpt, config, tokens, None, threshold=0.5)
        fused = KeyWordSpotter(
            ckpt, config, tokens, None, threshold=0.5, use_fused=True
        )
        assert fused._fused_init_cache is not None
        pcm = (rng.standard_normal(16000) * 1000).astype("<i2").tobytes()

        def run(spotter):
            spotter.reset_all()
            probs = []
            orig = spotter._apply_jit

            def capture(feats, cache):
                out, c = orig(feats, cache)
                probs.append(np.asarray(out))
                return out, c

            spotter._apply_jit = capture
            for off in range(0, len(pcm), 9600):
                spotter.forward(pcm[off : off + 9600])
            return np.concatenate(probs, axis=1)

        with pltpu.force_tpu_interpret_mode():
            got = run(fused)
        want = run(std)
        n = min(got.shape[1], want.shape[1])
        np.testing.assert_allclose(
            got[:, :n], want[:, :n], atol=5e-4, rtol=1e-3
        )


class TestBatchKeywordSpotter:
    """The batched multi-stream engine must be frame-exact with N
    independent single-stream engines."""

    def _make_batch(self, spotter_setup, n, **kw):
        from wekws_tpu.runtime import BatchKeywordSpotter

        ckpt, config, tokens = spotter_setup
        return BatchKeywordSpotter(
            ckpt, config, tokens, None, threshold=0.5, num_streams=n, **kw
        )

    def _single_posteriors(self, spotter_setup, pcm):
        """Reference posteriors: one single-stream spotter per wave."""
        ckpt, config, tokens = spotter_setup
        spotter = KeyWordSpotter(ckpt, config, tokens, None, threshold=0.5)
        spotter.set_keywords("hi")
        probs = []
        orig = spotter._apply

        def capture(feats, cache):
            out, c = orig(feats, cache)
            probs.append(np.asarray(out))
            return out, c

        spotter._apply = capture
        for off in range(0, len(pcm), 9600):
            spotter.forward(pcm[off : off + 9600])
        return np.concatenate(probs, axis=1)[0]

    def test_matches_independent_single_streams(self, spotter_setup, rng):
        """3 streams with different audio, staggered chunk arrival:
        posteriors per stream == a dedicated single-stream engine."""
        n = 3
        batch = self._make_batch(spotter_setup, n, step_frames=8)
        batch.set_keywords("hi")

        waves = [
            (rng.standard_normal(16000) * 1000).astype("<i2").tobytes()
            for _ in range(n)
        ]
        want = [self._single_posteriors(spotter_setup, w) for w in waves]

        got = [[] for _ in range(n)]
        orig = batch._step_jit

        def capture(feats, active, reset, cache):
            probs, c = orig(feats, active, reset, cache)
            p = np.asarray(probs)
            for i in range(n):
                if active[i]:
                    got[i].append(p[i])
            return probs, c

        batch._step_jit = capture
        # staggered arrival: stream i gets its chunk every i+1 rounds
        offsets = [0] * n
        chunk = [4800, 9600, 3200]
        while any(offsets[i] < len(waves[i]) for i in range(n)):
            for i in range(n):
                if offsets[i] < len(waves[i]):
                    batch.accept_wave(
                        i, waves[i][offsets[i] : offsets[i] + chunk[i]]
                    )
                    offsets[i] += chunk[i]
            batch.step()
        batch.flush()

        for i in range(n):
            g = np.concatenate(got[i], axis=0)
            w = want[i]
            m = min(len(g), len(w))
            assert m > 80
            np.testing.assert_allclose(g[:m], w[:m], atol=1e-5, rtol=1e-5)

    def test_detection_matches_single(self, spotter_setup):
        """Deterministic posteriors spelling the keyword: the batched
        FSM activates with the same timestamps as the single engine."""
        from wekws_tpu.runtime import BatchKeywordSpotter

        ckpt, config, tokens = spotter_setup
        batch = BatchKeywordSpotter(
            ckpt, config, tokens, None,
            threshold=0.3, num_streams=2, step_frames=8, min_frames=1,
        )
        batch.set_keywords("hi")
        v = 4
        frames = {10: 1, 30: 2}  # 'h' at abs frame 10, 'i' at 30

        def fake_step(feats, active, reset, cache):
            t = feats.shape[1]
            probs = np.full((2, t, v), 0.001, np.float32)
            probs[:, :, 0] = 0.9
            # stream 0 spells the keyword; stream 1 stays blank
            for i in range(t):
                absolute = batch._pending_idx[0][i] if len(
                    batch._pending_idx[0]
                ) > i else -1
                if absolute in frames:
                    probs[0, i, 0] = 0.05
                    probs[0, i, frames[absolute]] = 0.9
            return probs, cache

        batch._step_jit = fake_step
        pcm = np.zeros(16000, "<i2").tobytes()
        activated = {}
        off = 0
        while off < len(pcm):
            batch.accept_wave(0, pcm[off : off + 9600])
            batch.accept_wave(1, pcm[off : off + 9600])
            off += 9600
            for i, r in batch.step().items():
                if r and r.get("state") == 1:
                    activated[i] = r
        assert 0 in activated and 1 not in activated
        assert activated[0]["keyword"] == "hi"
        assert abs(activated[0]["start"] - 0.10) < 0.02
        assert abs(activated[0]["end"] - 0.30) < 0.02

    def test_reset_stream_isolated(self, spotter_setup, rng):
        """Resetting stream 0 mid-run must not perturb stream 1's
        posteriors (cache-row zeroing is row-local)."""
        n = 2
        wave = (rng.standard_normal(16000) * 1000).astype("<i2").tobytes()
        want = self._single_posteriors(spotter_setup, wave)

        batch = self._make_batch(spotter_setup, n, step_frames=8)
        batch.set_keywords("hi")
        got = []
        orig = batch._step_jit

        def capture(feats, active, reset, cache):
            probs, c = orig(feats, active, reset, cache)
            if active[1]:
                got.append(np.asarray(probs)[1])
            return probs, c

        batch._step_jit = capture
        for k, off in enumerate(range(0, len(wave), 4800)):
            batch.accept_wave(0, wave[off : off + 4800])
            batch.accept_wave(1, wave[off : off + 4800])
            batch.step()
            if k == 1:
                batch.reset_stream(0)  # mid-run slot recycle
        batch.flush()
        g = np.concatenate(got, axis=0)
        m = min(len(g), len(want))
        assert m > 80
        np.testing.assert_allclose(g[:m], want[:m], atol=1e-5, rtol=1e-5)


@pytest.fixture
def maxpool_spotter_setup(tmp_path):
    """Max-pooling (sigmoid) wake-word artifacts for the batched
    max-pooling engine."""
    import yaml as _yaml

    from wekws_tpu.models import init_model
    from wekws_tpu.train import save_checkpoint

    configs = {
        "dataset_conf": {
            "feats_type": "fbank",
            "fbank_conf": {"num_mel_bins": 23, "frame_shift": 10,
                           "frame_length": 25, "dither": 1.0},
        },
        "model": {
            "input_dim": 23, "output_dim": 2, "hidden_dim": 16,
            "preprocessing": {"type": "linear"},
            "backbone": {"type": "tcn", "ds": True, "num_layers": 3,
                         "kernel_size": 8, "dropout": 0.0},
        },
    }
    config_path = tmp_path / "config.yaml"
    config_path.write_text(_yaml.dump(configs))
    model = init_model(configs["model"])
    feats0 = np.zeros((1, 10, 23), np.float32)
    variables = model.init(jax.random.PRNGKey(0), feats0)
    ckpt = tmp_path / "final.ckpt"
    save_checkpoint(
        str(ckpt), variables["params"], variables.get("batch_stats", {})
    )
    return str(ckpt), str(config_path)


class TestBatchMaxPoolSpotter:
    """Batched serving engine for max-pooling (sigmoid) models."""

    def test_matches_independent_streams(self, maxpool_spotter_setup, rng):
        """Staggered multi-stream posteriors == a dedicated 1-stream
        engine per wave (lockstep masking is exact)."""
        from wekws_tpu.runtime import BatchMaxPoolSpotter

        ckpt, config = maxpool_spotter_setup
        n = 3
        waves = [
            (rng.standard_normal(12000) * 1000).astype("<i2").tobytes()
            for _ in range(n)
        ]

        def capture_engine(eng, nstreams):
            probs = [[] for _ in range(nstreams)]
            orig = eng._step_jit

            def capture(feats, active, reset, cache):
                out, c = orig(feats, active, reset, cache)
                p = np.asarray(out)
                for i in range(nstreams):
                    if active[i]:
                        probs[i].append(p[i])
                return out, c

            eng._step_jit = capture
            return probs

        want = []
        for w in waves:
            single = BatchMaxPoolSpotter(
                ckpt, config, threshold=0.5, num_streams=1, step_frames=8
            )
            probs = capture_engine(single, 1)
            single.accept_wave(0, w)
            while single.step():
                pass
            single.flush()
            want.append(np.concatenate(probs[0], axis=0))

        batch = BatchMaxPoolSpotter(
            ckpt, config, threshold=0.5, num_streams=n, step_frames=8
        )
        got = capture_engine(batch, n)
        offsets = [0] * n
        chunk = [4800, 9600, 3200]
        while any(offsets[i] < len(waves[i]) for i in range(n)):
            for i in range(n):
                if offsets[i] < len(waves[i]):
                    batch.accept_wave(
                        i, waves[i][offsets[i] : offsets[i] + chunk[i]]
                    )
                    offsets[i] += chunk[i]
            batch.step()
        batch.flush()

        for i in range(n):
            g = np.concatenate(got[i], axis=0)
            m = min(len(g), len(want[i]))
            assert m > 60
            np.testing.assert_allclose(
                g[:m], want[i][:m], atol=1e-5, rtol=1e-5
            )

    def test_threshold_and_refractory(self, maxpool_spotter_setup):
        """Fires at the first frame >= threshold, stays silent for
        interval_frames, fires again afterwards; reset clears the
        refractory state."""
        from wekws_tpu.runtime import BatchMaxPoolSpotter

        ckpt, config = maxpool_spotter_setup
        eng = BatchMaxPoolSpotter(
            ckpt, config, threshold=0.5, num_streams=1, step_frames=8,
            interval_frames=20, keyword_names=["hey", "ok"],
        )

        def fake_step(feats, active, reset, cache):
            t = feats.shape[1]
            probs = np.zeros((1, t, 2), np.float32)
            probs[0, :, 1] = 0.9  # keyword 'ok' hot every frame
            return probs, cache

        eng._step_jit = fake_step
        pcm = np.zeros(16000, "<i2").tobytes()
        eng.accept_wave(0, pcm)

        fired_frames = []
        while True:
            res = eng.step()
            if not res:
                break
            r = res[0]
            if r["state"]:
                assert r["keyword"] == "ok"
                assert r["score"] == pytest.approx(0.9)
                fired_frames.append(r["frame"])
        # every fire separated by > interval_frames, first fire at 0
        assert fired_frames[0] == 0
        assert all(
            b - a > 20 for a, b in zip(fired_frames, fired_frames[1:])
        )
        assert len(fired_frames) >= 3

        # reset clears the refractory clock: a fresh stream fires at
        # its first frame again
        eng.reset_stream(0)
        eng.accept_wave(0, pcm)
        res = eng.step()
        assert res[0]["state"] == 1 and res[0]["frame"] == 0

    def test_tail_flush_is_one_padded_dispatch(self, maxpool_spotter_setup):
        """A sub-step remainder flushes in ONE length-masked dispatch
        (not one T=1 dispatch per frame — each dispatch pays an
        RTT-sized floor in serving), results stay exact for the valid
        prefix, and the flushed slot is scheduled for a cache reset."""
        from wekws_tpu.runtime import BatchMaxPoolSpotter

        ckpt, config = maxpool_spotter_setup
        eng = BatchMaxPoolSpotter(
            ckpt, config, threshold=0.5, num_streams=2, step_frames=8,
            interval_frames=20, keyword_names=["hey", "ok"],
        )

        seen_t = []

        def fake_step(feats, active, reset, cache):
            t = feats.shape[1]
            seen_t.append(t)
            probs = np.zeros((2, t, 2), np.float32)
            probs[:, :, 1] = 0.9
            return probs, cache

        eng._step_jit = fake_step
        # ~35 frames => 4 full 8-frame steps + a 3-frame tail
        eng.accept_wave(0, np.zeros(16000 // 100 * 36 * 2, "<i2")
                        .tobytes())
        while eng.step():
            pass
        before = eng.stats["dispatches"]
        tail = eng.flush_stream(0)
        assert eng.stats["dispatches"] == before + 1  # ONE dispatch
        assert seen_t[-1] == 8  # padded to step_frames, not T=1
        assert len(tail) == 1 and tail[0]["state"] == 0  # refractory
        assert eng._reset_mask[0] and not eng._reset_mask[1]
        # the padded rows beyond the tail produced no phantom frames
        assert eng.pending_frames(0) == 0

    def test_multiple_same_chunk_events_not_dropped(
        self, maxpool_spotter_setup
    ):
        """Two keywords crossing threshold in ONE chunk: the engine
        contract stays one-result-per-step, but the second event
        queues (backlog) and surfaces on a later step or at flush —
        never silently dropped (it used to be, since the chunk's
        frames are consumed and never re-examined)."""
        from wekws_tpu.runtime import BatchMaxPoolSpotter

        ckpt, config = maxpool_spotter_setup
        eng = BatchMaxPoolSpotter(
            ckpt, config, threshold=0.5, num_streams=1, step_frames=8,
            interval_frames=20, keyword_names=["hey", "ok"],
        )

        def fake_step(feats, active, reset, cache):
            t = feats.shape[1]
            probs = np.zeros((1, t, 2), np.float32)
            probs[0, :, 0] = 0.7  # 'hey' hot every frame
            probs[0, :, 1] = 0.9  # 'ok' hotter every frame
            return probs, cache
        eng._step_jit = fake_step

        # exactly one 8-frame chunk + a 3-frame tail
        eng.accept_wave(0, np.zeros(2 * 160 * 11, "<i2").tobytes())
        first = eng.step()[0]
        assert first["state"] == 1 and first["keyword"] == "ok"
        # 'hey' fired in the same chunk (frame 0, argmax picked 'ok'
        # first; 'hey' fires at the next scanned frame) — it must
        # arrive via the flush drain, not vanish
        tail = [r for r in eng.flush_stream(0) if r["state"] == 1]
        assert any(r["keyword"] == "hey" for r in tail)
        # refractory held per keyword: no duplicate within 20 frames
        frames = {}
        for r in [first] + tail:
            frames.setdefault(r["keyword"], []).append(r["frame"])
        for kw, fr in frames.items():
            assert all(b - a > 20 for a, b in zip(fr, fr[1:]))
