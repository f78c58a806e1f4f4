"""Device-side waveform augmentation (data/device_aug.py) — math
parity with the host pipeline stages (data/processor.py, data/audio.py)
and integration through DeviceFeaturePipeline."""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wekws_tpu.data import audio
from wekws_tpu.data.device_aug import (
    DeviceWaveAug,
    MatmulFFT,
    mix_noise_batch,
    reverb_batch,
    reverb_batch_blocked,
    speed_perturb_batch,
)

KEY = jax.random.PRNGKey(0)


def test_speed_perturb_lengths_exact_rational(rng):
    """Device lengths == host lengths for EVERY input length — both
    sides now use floor(len * q / p) (exact integers; the old f32 and
    f64 divisions each drift by 1 near exact multiples, e.g.
    int(33 / 1.1) == 29 in f64)."""
    lens = np.arange(1, 4000, 7, dtype=np.int32)
    waves = np.zeros((len(lens), 4000), np.float32)
    for speed in (0.9, 1.1):
        _, new_len = speed_perturb_batch(
            KEY, jnp.asarray(waves), jnp.asarray(lens), speeds=(speed,))
        host = [len(audio.speed_perturb(np.zeros(int(n), np.float32),
                                        speed)) for n in lens]
        np.testing.assert_array_equal(np.asarray(new_len), host)


def test_speed_perturb_group_matches_host(rng):
    """Group-partitioned speed: each contiguous row group resamples at
    exactly its speed, waveform-identical to the host resampler, with
    exact rational lengths and zeroed padding."""
    from wekws_tpu.data.device_aug import speed_perturb_group

    b, s = 7, 3000
    waves = (rng.standard_normal((b, s)) * 800).astype(np.float32)
    lengths = np.asarray([s, s - 100, s, s - 3, s, s, s - 50], np.int32)
    for i in range(b):
        waves[i, lengths[i]:] = 0.0
    speeds = (0.9, 1.0, 1.1)
    out, new_len = speed_perturb_group(
        jnp.asarray(waves), jnp.asarray(lengths), speeds)
    out = np.asarray(out)
    # groups (remainder rows go to the early groups): rows 0-2 -> 0.9,
    # rows 3-4 -> 1.0, rows 5-6 -> 1.1
    assign = [0.9] * 3 + [1.0] * 2 + [1.1] * 2
    for i, sp in enumerate(assign):
        host = audio.speed_perturb(waves[i, :lengths[i]], sp)
        assert int(new_len[i]) == len(host)
        np.testing.assert_allclose(out[i, :len(host)], host, atol=2.0)
        assert np.all(out[i, len(host):] == 0.0)


@pytest.mark.parametrize("s,r", [(3000, 400), (9000, 400), (8192, 1000)])
def test_reverb_blocked_matches_host(rng, s, r):
    """Overlap-save (block DFT ~2*rir_len) == full linear convolution,
    including multi-block framing and the block-boundary history."""
    wave = (rng.standard_normal((2, s)) * 1000).astype(np.float32)
    rir = rng.standard_normal(r).astype(np.float32)
    rir = rir / np.sqrt(np.sum(rir.astype(np.float64) ** 2))
    fft = MatmulFFT.for_block(r, target=2048)
    spec = np.zeros((4, fft.nh), np.complex64)
    spec[0] = fft.spectrum_mat_half(rir).reshape(-1)
    out = np.asarray(reverb_batch_blocked(
        KEY, jnp.asarray(wave), jnp.asarray([s, s - 777]),
        fft, jnp.asarray(spec.real, jnp.float32),
        jnp.asarray(spec.imag, jnp.float32),
        n_rirs=1, prob=1.0, rir_len=r))
    for b in range(2):
        expected = np.convolve(
            wave[b].astype(np.float64), rir.astype(np.float64))[:s]
        n_valid = s if b == 0 else s - 777
        np.testing.assert_allclose(
            out[b, :n_valid], expected[:n_valid], atol=0.15)
        assert np.all(out[b, n_valid:] == 0.0)


def test_reverb_blocked_default_precision_bound(rng):
    """precision='default' (1-pass bf16) stays within ~1e-2 relative
    of the exact convolution — augmentation-grade (the production
    setting; 'high' is pinned at 1e-4-grade above)."""
    s, r = 9000, 700
    wave = (rng.standard_normal((1, s)) * 1000).astype(np.float32)
    rir = rng.standard_normal(r).astype(np.float32)
    rir = rir / np.sqrt(np.sum(rir.astype(np.float64) ** 2))
    fft = MatmulFFT.for_block(r, target=2048, precision="default")
    spec = np.zeros((4, fft.nh), np.complex64)
    spec[0] = fft.spectrum_mat_half(rir).reshape(-1)
    out = np.asarray(reverb_batch_blocked(
        KEY, jnp.asarray(wave), jnp.asarray([s]),
        fft, jnp.asarray(spec.real, jnp.float32),
        jnp.asarray(spec.imag, jnp.float32),
        n_rirs=1, prob=1.0, rir_len=r))[0]
    expected = np.convolve(
        wave[0].astype(np.float64), rir.astype(np.float64))[:s]
    err = np.linalg.norm(out - expected) / np.linalg.norm(expected)
    assert err < 2e-2, err


def test_reverb_bf16_chain_error_bound(rng):
    """dtype='bfloat16' banks/intermediates (the production from_conf
    default): reverb output stays within ~3% relative of the exact
    convolution — augmentation-grade; parity-grade math stays on the
    float32 instances above."""
    s, r = 9000, 700
    wave = (rng.standard_normal((1, s)) * 1000).astype(np.float32)
    rir = rng.standard_normal(r).astype(np.float32)
    rir = rir / np.sqrt(np.sum(rir.astype(np.float64) ** 2))
    fft = MatmulFFT.for_length(s + r - 1, precision="default",
                               dtype="bfloat16")
    spec = np.zeros((4, fft.nh), np.complex64)
    spec[0] = fft.spectrum_mat_half(rir).reshape(-1)
    out = np.asarray(reverb_batch(
        KEY, jnp.asarray(wave), jnp.asarray([s]),
        fft, jnp.asarray(spec.real, jnp.bfloat16),
        jnp.asarray(spec.imag, jnp.bfloat16),
        n_rirs=1, prob=1.0))[0]
    expected = np.convolve(
        wave[0].astype(np.float64), rir.astype(np.float64))[:s]
    err = np.linalg.norm(out - expected) / np.linalg.norm(expected)
    assert err < 3e-2, err


def _small_aug(rng, precision="high", n_noise=3, n_rirs=2,
               deterministic=False):
    """Small full-chain aug (blocked reverb) for the mesh tests."""
    out_len = int(np.ceil(4000 / 0.9))
    rirs = rng.standard_normal((max(n_rirs, 1), 200)).astype(np.float32)
    rirs /= np.sqrt((rirs ** 2).sum(1, keepdims=True))
    fft = MatmulFFT.for_block(200, target=1024, precision=precision)
    spec = np.zeros((8, fft.nh), np.complex64)
    for i in range(n_rirs):
        spec[i] = fft.spectrum_mat_half(rirs[i]).reshape(-1)
    rows = np.zeros((16, out_len), np.float32)
    for i in range(n_noise):
        rows[i] = (rng.standard_normal(out_len) * 200).astype(np.float32)
    snr = (10.0, 10.0) if deterministic else (5.0, 15.0)
    return DeviceWaveAug(
        speed_perturb=True,
        speeds=(0.9,) if deterministic else (0.9, 1.0, 1.1),
        fft=fft,
        rir_re=jnp.asarray(spec.real, jnp.float32),
        rir_im=jnp.asarray(spec.imag, jnp.float32),
        n_rirs=n_rirs, reverb_prob=1.0 if deterministic else 0.5,
        noise_rows=jnp.asarray(rows),
        snr_lo=jnp.full((16,), snr[0]), snr_hi=jnp.full((16,), snr[1]),
        n_noise_rows=n_noise, noise_prob=1.0 if deterministic else 0.7,
        power_scale=1.0 / 32768.0, rir_len=200, precision=precision,
    )


def test_aug_sharded_matches_single_device(rng):
    """SPMD invariance under the ('data',) mesh: the full chain
    (polyphase speed + blocked reverb + noise) on a mesh-sharded batch
    equals the single-device result bit-for-bit with partitionable
    threefry keys — per-device shards draw exactly their rows' slice
    of the global randomness (the device-chain analog of the r3
    rank-aware-seeding fix)."""
    from wekws_tpu.parallel.mesh import data_sharding, make_mesh

    jax.config.update("jax_threefry_partitionable", True)
    aug = _small_aug(rng)
    waves = jnp.asarray(
        (rng.standard_normal((16, 4000)) * 500).astype(np.float32))
    lengths = jnp.full((16,), 4000, jnp.int32)
    key = jax.random.PRNGKey(7)
    leaves = aug.leaves()

    fn = jax.jit(lambda lv, k, w, ln: aug.bind(lv)(k, w, ln))
    ref_out, ref_len = jax.device_get(fn(leaves, key, waves, lengths))

    mesh = make_mesh(8)
    shard = data_sharding(mesh)
    w_sh = jax.device_put(waves, shard)
    l_sh = jax.device_put(lengths, shard)
    out, new_len = jax.device_get(fn(leaves, key, w_sh, l_sh))
    np.testing.assert_array_equal(new_len, ref_len)
    np.testing.assert_allclose(out, ref_out, atol=1e-3)


def test_aug_rows_decorrelated_across_devices(rng):
    """Identical input rows spread over all 8 devices receive
    DIFFERENT augmentation draws (per-row picks/SNRs are functions of
    the global row index, not replicated per device) — the reference
    behavior of independent per-rank draws under DDP
    (processor.py:395-430 + dataset.py:82-97)."""
    from wekws_tpu.parallel.mesh import data_sharding, make_mesh

    aug = _small_aug(rng)
    one = (rng.standard_normal(4000) * 500).astype(np.float32)
    waves = jnp.asarray(np.tile(one, (16, 1)))
    lengths = jnp.full((16,), 4000, jnp.int32)
    mesh = make_mesh(8)
    shard = data_sharding(mesh)
    out, _ = jax.device_get(jax.jit(
        lambda lv, k, w, ln: aug.bind(lv)(k, w, ln)
    )(aug.leaves(), jax.random.PRNGKey(3),
      jax.device_put(waves, shard), jax.device_put(lengths, shard)))
    # 16 identical inputs -> the draws must produce >4 distinct outputs
    distinct = len({out[i].tobytes() for i in range(16)})
    assert distinct > 4, f"only {distinct} distinct augmented rows"


def test_snr_range_prefix_matching():
    """Reference semantics: key.startswith('noise'/'speech'/'music')
    (processor.py:404-411) — musan-style keys without underscores
    resolve to their corpus range, not the default."""
    from wekws_tpu.data.processor import snr_range_for_key

    assert snr_range_for_key("speech-librivox-0001") == (5, 30)
    assert snr_range_for_key("music-hd-0042") == (5, 15)
    assert snr_range_for_key("noise_001") == (0, 15)
    assert snr_range_for_key("aug/music_007") == (5, 15)
    assert snr_range_for_key("unknown-key") == (0, 15)


@pytest.mark.parametrize("speed", [0.9, 1.1])
def test_speed_perturb_matches_host(rng, speed):
    s = 4000
    n = 3517  # valid samples; rest is padding
    wave = np.zeros((2, s), np.float32)
    wave[0, :n] = (rng.standard_normal(n) * 1000).astype(np.float32)
    wave[1, :n] = (rng.standard_normal(n) * 1000).astype(np.float32)
    lengths = np.full((2,), n, np.int32)
    # a single-speed tuple removes the per-row randomness
    out, new_len = speed_perturb_batch(
        KEY, jnp.asarray(wave), jnp.asarray(lengths), speeds=(speed,))
    out = np.asarray(out)
    for b in range(2):
        host = audio.speed_perturb(wave[b, :n], speed)
        assert int(new_len[b]) == len(host)
        # f32 positions vs the host's f64 np.interp: ~3e-4-sample
        # position error * O(2000/sample) slopes => ~1 LSB-scale diffs
        np.testing.assert_allclose(
            out[b, : len(host)], host, atol=2.0)
        # padding region stays zero
        assert np.all(out[b, len(host):] == 0.0)


def test_matmul_fft_matches_numpy(rng):
    fft = MatmulFFT(16, 12)
    x = rng.standard_normal((3, fft.n)) + 1j * rng.standard_normal(
        (3, fft.n))
    xm = x.reshape(3, fft.a, fft.b)  # [n1, n2] natural layout
    re, im = fft.fft_mat(jnp.asarray(xm.real, jnp.float32),
                         jnp.asarray(xm.imag, jnp.float32))
    ref = fft.spectrum_mat(x)  # numpy fft in [k1, k2] layout
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=1e-3)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=1e-3)
    ire = fft.ifft_mat_real(re, im)
    np.testing.assert_allclose(np.asarray(ire), xm.real, atol=1e-4)
    # real-input fast path (xim=None)
    re2, im2 = fft.fft_mat(jnp.asarray(xm.real, jnp.float32))
    ref2 = fft.spectrum_mat(x.real)
    np.testing.assert_allclose(np.asarray(re2), ref2.real, atol=1e-3)
    np.testing.assert_allclose(np.asarray(im2), ref2.imag, atol=1e-3)


def test_rfft_half_spectrum_roundtrip(rng):
    """Hermitian half path: rfft_mat matches np.fft on the kept rows
    and irfft_mat_real reconstructs the signal EXACTLY (the mirror
    rows' contribution is folded in as 2x weights — a symmetry, not an
    approximation), including the lane-padded zero-weight rows."""
    for a, b in [(320, 4), (16, 12), (256, 6)]:
        fft = MatmulFFT(a, b, precision="highest")
        x = rng.standard_normal((2, fft.n)).astype(np.float32)
        xm = x.reshape(2, a, b)
        re, im = fft.rfft_mat(jnp.asarray(xm))
        ref = fft.spectrum_mat(x)
        keep = min(fft.ah, a // 2 + 1)
        np.testing.assert_allclose(
            np.asarray(re)[:, :keep], ref.real[:, :keep], atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(im)[:, :keep], ref.imag[:, :keep], atol=2e-3)
        half = fft.spectrum_mat_half(x)
        back = fft.irfft_mat_real(
            jnp.asarray(half.real, jnp.float32),
            jnp.asarray(half.imag, jnp.float32))
        np.testing.assert_allclose(np.asarray(back), xm, atol=2e-4)


def _rir_setup(rng, s, r, pad_rows=4):
    rir = rng.standard_normal(r).astype(np.float32)
    rir = rir / np.sqrt(np.sum(rir.astype(np.float64) ** 2))
    fft = MatmulFFT.for_length(s + r - 1)
    spec = np.zeros((pad_rows, fft.nh), np.complex64)
    spec[0] = fft.spectrum_mat_half(rir).reshape(-1)
    return rir, fft, (jnp.asarray(spec.real, jnp.float32),
                      jnp.asarray(spec.imag, jnp.float32))


def test_reverb_matches_host(rng):
    s, r = 3000, 400
    wave = (rng.standard_normal(s) * 1000).astype(np.float32)
    rir, fft, (sre, sim) = _rir_setup(rng, s, r)
    out = np.asarray(reverb_batch(
        KEY, jnp.asarray(wave[None, :]), jnp.asarray([s]),
        fft, sre, sim, n_rirs=1, prob=1.0))[0]
    expected = np.convolve(
        wave.astype(np.float64), rir.astype(np.float64))[:s]
    np.testing.assert_allclose(out, expected, atol=0.1)


def test_reverb_prob_zero_is_identity(rng):
    s = 1000
    wave = (rng.standard_normal(s) * 1000).astype(np.float32)
    _, fft, (sre, sim) = _rir_setup(rng, s, 100)
    out = np.asarray(reverb_batch(
        KEY, jnp.asarray(wave[None, :]), jnp.asarray([s]),
        fft, sre, sim, n_rirs=1, prob=0.0))[0]
    np.testing.assert_array_equal(out, wave)


def _host_noise_mix(wave, noise, snr, scale=1.0 / 32768.0):
    """The reference's add_noise math (processor.py:163-188) on [-1, 1)
    scaled copies of int16-scale arrays."""
    w = wave * scale
    n = noise * scale
    audio_db = 10 * np.log10(np.mean(w ** 2) + 1e-4)
    noise_db = 10 * np.log10(np.mean(n ** 2) + 1e-4)
    k = np.sqrt(10 ** ((audio_db - noise_db - snr) / 10))
    return wave + k * noise


def test_mix_noise_matches_host_equal_length(rng):
    s = 2000
    wave = (rng.standard_normal(s) * 800).astype(np.float32)
    noise = (rng.standard_normal(s) * 300).astype(np.float32)
    snr = 7.5
    rows = np.zeros((4, s), np.float32)
    rows[0] = np.resize(noise, (s,))
    out = np.asarray(mix_noise_batch(
        KEY, jnp.asarray(wave[None, :]), jnp.asarray([s]),
        jnp.asarray(rows), jnp.full((4,), snr), jnp.full((4,), snr),
        n_rows=1, prob=1.0, power_scale=1.0 / 32768.0))[0]
    np.testing.assert_allclose(
        out, _host_noise_mix(wave, noise, snr), rtol=1e-4, atol=0.05)


def test_mix_noise_tiles_short_noise(rng):
    s, sn = 2000, 700
    wave = (rng.standard_normal(s) * 800).astype(np.float32)
    noise = (rng.standard_normal(sn) * 300).astype(np.float32)
    snr = 10.0
    rows = np.zeros((4, s), np.float32)
    rows[0] = np.resize(noise, (s,))
    out = np.asarray(mix_noise_batch(
        KEY, jnp.asarray(wave[None, :]), jnp.asarray([s]),
        jnp.asarray(rows), jnp.full((4,), snr), jnp.full((4,), snr),
        n_rows=1, prob=1.0, power_scale=1.0 / 32768.0))[0]
    tiled = np.resize(noise, (s,))
    np.testing.assert_allclose(
        out, _host_noise_mix(wave, tiled, snr), rtol=1e-4, atol=0.05)


def _write_wav_blob(writer, key, wave_f32, sr=16000):
    buf = io.BytesIO()
    pcm = np.clip(wave_f32 * 32768.0, -32768, 32767).astype("<i2")
    import struct

    data = pcm.tobytes()
    buf.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
    buf.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr,
                                    sr * 2, 2, 16))
    buf.write(b"data" + struct.pack("<I", len(data)) + data)
    writer.put(key, buf.getvalue())


def test_from_conf_stages_banks(tmp_path, rng):
    from wekws_tpu.data.blobstore import BlobWriter

    with BlobWriter(str(tmp_path / "noise_store")) as w:
        _write_wav_blob(w, "noise_001", rng.standard_normal(1500) * 0.01)
        _write_wav_blob(w, "music_001", rng.standard_normal(900) * 0.01)
    with BlobWriter(str(tmp_path / "rir_store")) as w:
        _write_wav_blob(w, "rir_001", rng.standard_normal(300) * 0.1)

    conf = {
        "speed_perturb": True,
        "noise_prob": 0.8, "noise_source": "noise_store",
        "reverb_prob": 0.5, "reverb_source": "rir_store",
    }
    aug = DeviceWaveAug.from_conf(
        conf, max_wave_samples=2000, data_dir=str(tmp_path))
    # 2 noise clips x 8 crop variants, zero-padded to 512 rows
    assert aug.n_noise_rows == 16
    assert aug.noise_rows.shape[0] == 512
    # per-prefix SNR ranges resolved from the key prefixes
    np.testing.assert_allclose(np.asarray(aug.snr_lo[:16:8]), [0.0, 5.0])
    np.testing.assert_allclose(np.asarray(aug.snr_hi[:16]),
                               [15.0] * 16)
    assert aug.n_rirs == 1 and aug.rir_re.shape[0] == 512
    assert aug.fft.n >= int(np.ceil(2000 / 0.9)) + 300 - 1

    waves = jnp.asarray(
        (rng.standard_normal((4, 2000)) * 500).astype(np.float32))
    lengths = jnp.asarray([2000, 1800, 1500, 2000], jnp.int32)
    out, new_len = aug(KEY, waves, lengths)
    assert out.shape == (4, int(np.ceil(2000 / 0.9)))
    ls = np.asarray(lengths, np.float64)
    nl = np.asarray(new_len, np.float64)
    assert np.all(nl >= np.floor(ls / 1.1)) and \
        np.all(nl <= np.floor(ls / 0.9))
    assert np.isfinite(np.asarray(out)).all()


def test_pipeline_integration(rng):
    """wave_aug slots into DeviceFeaturePipeline before the fbank and
    the feature lengths follow the augmented wave lengths."""
    from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline

    conf = {
        "feats_type": "fbank",
        "fbank_conf": {"num_mel_bins": 23, "frame_shift": 10,
                       "frame_length": 25, "dither": 0.0},
    }
    pipe = DeviceFeaturePipeline.from_conf(conf, training=True)
    pipe.wave_aug = DeviceWaveAug(
        speed_perturb=True, speeds=(0.9,),  # deterministic slow-down
        fft=None, rir_re=None, rir_im=None, n_rirs=0, reverb_prob=0.0,
        noise_rows=None, snr_lo=None, snr_hi=None, n_noise_rows=0,
        noise_prob=0.0, power_scale=1.0 / 32768.0,
    )
    waves = jnp.asarray(
        (rng.standard_normal((2, 16000)) * 500).astype(np.float32))
    lengths = jnp.asarray([16000, 16000], jnp.int32)
    feats, feat_lengths = jax.jit(pipe)(waves, lengths,
                                        jax.random.PRNGKey(3))
    base_frames = (16000 - 400) // 160 + 1
    slow_frames = (int(16000 / 0.9) - 400) // 160 + 1
    assert int(feat_lengths[0]) == slow_frames > base_frames
    assert feats.shape[1] >= slow_frames
