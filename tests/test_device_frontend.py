"""Device-batched streaming frontend (runtime/device_frontend.py).

Parity contract: WaveStreamBuffer + build_batch_featurizer must emit
the SAME features, indices and step schedule as the host
StreamingFrontend (reference bookkeeping) for any chunking of the
input — including the stream head's replicate-pad, the splice
right-context delay, frame-skip phase and flush tails.
"""

import numpy as np
import pytest
import yaml

import jax

from wekws_tpu.frontend.kaldi import FrontendConfig, compute_fbank_np
from wekws_tpu.runtime.device_frontend import (
    WaveStreamBuffer,
    build_batch_featurizer,
)
from wekws_tpu.runtime.streaming_frontend import StreamingFrontend

GEOMETRIES = [
    pytest.param(0, 0, 1, id="plain"),        # flagship max-pooling
    pytest.param(2, 2, 3, id="splice-skip"),  # hi_xiaowen FSMN-CTC
    pytest.param(1, 2, 2, id="asymmetric"),
]


def _cfg():
    return FrontendConfig(num_mel_bins=23, dither=0.0)


@pytest.mark.parametrize("left,right,skip", GEOMETRIES)
def test_featurizer_matches_streaming_frontend(rng, left, right, skip):
    cfg = _cfg()
    m = 8  # step_frames
    host = StreamingFrontend(cfg, left, right, skip)
    buf = WaveStreamBuffer(cfg.frame_shift, cfg.frame_length,
                           left, right, skip, m)
    featurize, window_samples = build_batch_featurizer(
        cfg, left, right, skip, m)
    assert window_samples == buf.window_samples
    fj = jax.jit(featurize)

    wave = (rng.standard_normal(3 * 16000) * 1000).astype(np.float32)
    host_feats, host_idx = [], []
    dev_feats, dev_idx = [], []
    # uneven chunking exercises every carry-over path
    chunks = [389, 1600, 111, 4800, 2000, 7919, 16000, 15181]
    off = 0
    for ch in chunks:
        piece = wave[off:off + ch]
        off += ch
        f, i = host.accept_waveform(piece)
        if f.shape[0]:
            host_feats.append(f)
            host_idx.append(i)
        buf.append(piece)
        while buf.available_outputs() >= m:
            w, lo = buf.window()
            out = np.asarray(fj(w[None, :], np.asarray([lo])))[0]
            dev_feats.append(out)
            dev_idx.append(buf.consume(m))
    # drain the host's remainder schedule to the same boundary
    n_dev = sum(f.shape[0] for f in dev_feats)
    hf = np.concatenate(host_feats)[:n_dev]
    hi = np.concatenate(host_idx)[:n_dev]
    df = np.concatenate(dev_feats)
    di = np.concatenate(dev_idx)
    np.testing.assert_array_equal(hi, di)
    np.testing.assert_allclose(hf, df, rtol=0, atol=2e-3)
    assert n_dev > 0


@pytest.mark.parametrize("left,right,skip", GEOMETRIES)
def test_featurizer_partial_tail(rng, left, right, skip):
    """Flush-style partial windows: fewer than step_frames outputs
    available — the valid prefix must still match the host frontend,
    with garbage only past it."""
    cfg = _cfg()
    m = 8
    host = StreamingFrontend(cfg, left, right, skip)
    buf = WaveStreamBuffer(cfg.frame_shift, cfg.frame_length,
                           left, right, skip, m)
    featurize, _ = build_batch_featurizer(cfg, left, right, skip, m)
    # enough samples for a handful of outputs but fewer than m
    need_frames = left + (m // 2) * skip + right + 1
    n = (need_frames - 1) * cfg.frame_shift + cfg.frame_length + 7
    wave = (rng.standard_normal(n) * 1000).astype(np.float32)
    hf, hi = host.accept_waveform(wave)
    buf.append(wave)
    avail = buf.available_outputs()
    assert avail == hf.shape[0]
    assert 0 < avail < m
    w, lo = buf.window()
    out = np.asarray(featurize(w[None, :], np.asarray([lo])))[0]
    np.testing.assert_allclose(hf, out[:avail], rtol=0, atol=2e-3)
    np.testing.assert_array_equal(hi, buf.consume(avail))


def test_buffer_trims_consumed_samples(rng):
    cfg = _cfg()
    buf = WaveStreamBuffer(cfg.frame_shift, cfg.frame_length, 2, 2, 3, 8)
    for _ in range(50):
        buf.append((rng.standard_normal(16000) * 100).astype(np.float32))
        while buf.available_outputs() >= 8:
            buf.window()
            buf.consume(8)
    # steady state keeps only the context overlap, not the history
    assert buf._buflen + sum(c.size for c in buf._chunks) \
        < 2 * buf.window_samples


def _engine_pair(tmp_path, left, right, skip, n_streams=3):
    """Host-frontend and device-frontend BatchKeywordSpotter over the
    same random-init CTC model with the given feature geometry."""
    from wekws_tpu.models import init_model
    from wekws_tpu.runtime import BatchKeywordSpotter
    from wekws_tpu.train import save_checkpoint

    dim = 23 * (left + 1 + right)
    configs = {
        "dataset_conf": {
            "feats_type": "fbank",
            "fbank_conf": {"num_mel_bins": 23, "frame_shift": 10,
                           "frame_length": 25, "dither": 1.0},
            "context_expansion": bool(left or right),
            "context_expansion_conf": {"left": left, "right": right},
            "frame_skip": skip,
        },
        "model": {
            "input_dim": dim, "output_dim": 4, "hidden_dim": 16,
            "preprocessing": {"type": "linear"},
            "backbone": {"type": "tcn", "ds": True, "num_layers": 2,
                         "kernel_size": 4, "dropout": 0.0},
            "classifier": {"type": "element", "dropout": 0.0},
            "activation": {"type": "identity"},
        },
    }
    config_path = tmp_path / "config.yaml"
    config_path.write_text(yaml.dump(configs))
    model = init_model(configs["model"])
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 10, dim), np.float32))
    ckpt = tmp_path / "final.ckpt"
    save_checkpoint(
        str(ckpt), variables["params"], variables.get("batch_stats", {}))
    tokens = tmp_path / "tokens.txt"
    tokens.write_text("<blk> 0\nh 1\ni 2\nx 3\n")
    engines = []
    for device_frontend in (False, True):
        eng = BatchKeywordSpotter(
            str(ckpt), str(config_path), str(tokens), None,
            threshold=0.05, num_streams=n_streams, step_frames=4,
            min_frames=1, device_frontend=device_frontend,
        )
        eng.set_keywords("hi,hx")
        engines.append(eng)
    return engines


@pytest.mark.parametrize("left,right,skip",
                         [pytest.param(0, 0, 1, id="plain"),
                          pytest.param(2, 2, 3, id="splice-skip")])
def test_engine_detection_parity(tmp_path, rng, left, right, skip):
    """End-to-end: the device-frontend engine steps on the same
    schedule and produces the same detections as the host engine."""
    host_eng, dev_eng = _engine_pair(tmp_path, left, right, skip)
    waves = [
        (rng.standard_normal(16000) * 2000).astype("<i2").tobytes()
        for _ in range(3)
    ]
    host_results, dev_results = [], []
    for step in range(12):
        for eng, out in ((host_eng, host_results),
                         (dev_eng, dev_results)):
            for s in range(3):
                chunk = 1600 * ((step + s) % 3 + 1)
                off = (step * 1600 * 3) % len(waves[s])
                eng.accept_wave(s, waves[s][off:off + chunk])
            out.append(eng.step())
    # same step schedule (which streams ran when)
    assert [sorted(r) for r in host_results] == \
        [sorted(r) for r in dev_results]
    fired = 0
    for hr, dr in zip(host_results, dev_results):
        for s in hr:
            assert hr[s]["state"] == dr[s]["state"]
            if hr[s]["state"] == 1:
                fired += 1
                assert hr[s]["keyword"] == dr[s]["keyword"]
                assert hr[s]["start"] == pytest.approx(
                    dr[s]["start"], abs=1e-6)
    # flush parity: padded-tail windows (host zero-pads feats, device
    # zero-fills the wave window past the buffered end)
    hflush, dflush = host_eng.flush(), dev_eng.flush()
    assert sorted(hflush) == sorted(dflush)
    for s in hflush:
        assert hflush[s]["state"] == dflush[s]["state"]


def test_engine_reset_stream(tmp_path, rng):
    """reset_stream clears the wave buffer and the cursor."""
    _, dev_eng = _engine_pair(tmp_path, 2, 2, 3, n_streams=2)
    dev_eng.accept_wave(0, (rng.standard_normal(8000) * 500)
                        .astype("<i2").tobytes())
    assert dev_eng.pending_frames(0) > 0
    dev_eng.reset_stream(0)
    assert dev_eng.pending_frames(0) == 0
    assert dev_eng.wave_bufs[0]._next == 0


def test_buffer_overconsume_is_safe(rng):
    """Flush-style consume past the buffered data (padded tails): the
    buffer must stay internally consistent and later windows must not
    resurrect consumed samples."""
    cfg = _cfg()
    buf = WaveStreamBuffer(cfg.frame_shift, cfg.frame_length, 0, 0, 1, 8)
    buf.append((rng.standard_normal(1000) * 100).astype(np.float32))
    avail = buf.available_outputs()
    assert 0 < avail < 8
    buf.window()
    buf.consume(8)  # consume the padded tail's full step
    assert buf.available_outputs() == 0
    # appending fresh audio keeps absolute alignment monotonic
    buf.append((rng.standard_normal(16000) * 100).astype(np.float32))
    assert buf.available_outputs() >= 0
    w, lo = buf.window()
    assert w.shape == (buf.window_samples,)
    assert lo == 0
