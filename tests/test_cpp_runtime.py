"""C++ runtime parity: native engine == Python pipeline + flax model.

Builds the runtime (cmake+ninja/make) if needed, exports a model
artifact, streams a waveform through the C API via ctypes, and checks
the per-frame posteriors against the offline Python path — the
train/runtime parity gate of SURVEY.md §7 step 9.
"""

import ctypes
import os
import subprocess

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD_DIR = os.path.join(REPO, "runtime", "build")
LIB = os.path.join(BUILD_DIR, "libwekws_capi.so")


@pytest.fixture(scope="module")
def capi():
    if not os.path.exists(LIB):
        os.makedirs(BUILD_DIR, exist_ok=True)
        try:
            subprocess.run(
                ["cmake", "..", "-G", "Ninja"], cwd=BUILD_DIR, check=True,
                capture_output=True,
            )
            subprocess.run(
                ["ninja"], cwd=BUILD_DIR, check=True, capture_output=True
            )
        except (OSError, subprocess.CalledProcessError) as e:
            pytest.skip(f"cannot build C++ runtime: {e}")
    lib = ctypes.CDLL(LIB)
    lib.wekws_create.restype = ctypes.c_void_p
    lib.wekws_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.wekws_free.argtypes = [ctypes.c_void_p]
    lib.wekws_output_dim.argtypes = [ctypes.c_void_p]
    lib.wekws_cache_len.argtypes = [ctypes.c_void_p]
    lib.wekws_accept_waveform.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.wekws_set_input_finished.argtypes = [ctypes.c_void_p]
    lib.wekws_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.wekws_reset.argtypes = [ctypes.c_void_p]
    return lib


def export_tiny_model(tmp_path, with_context=False, mfcc=False):
    from wekws_tpu.export import export_model
    from wekws_tpu.models import init_model

    dataset_conf = {
        "feats_type": "mfcc" if mfcc else "fbank",
        ("mfcc_conf" if mfcc else "fbank_conf"): {
            "num_mel_bins": 23, "num_ceps": 23,
            "frame_shift": 10, "frame_length": 25, "dither": 1.0,
        },
    }
    input_dim = 23
    if with_context:
        dataset_conf["context_expansion"] = True
        dataset_conf["context_expansion_conf"] = {"left": 2, "right": 2}
        dataset_conf["frame_skip"] = 3
        input_dim = 23 * 5
    model_conf = {
        "input_dim": input_dim, "output_dim": 3, "hidden_dim": 16,
        "preprocessing": {"type": "linear"},
        "backbone": {"type": "tcn", "ds": True, "num_layers": 2,
                     "kernel_size": 4, "dropout": 0.0},
    }
    model = init_model(model_conf)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 20, input_dim))
    variables = model.init(jax.random.PRNGKey(1), x)
    out_dir = str(tmp_path / "artifact")
    export_model(
        model, variables,
        {"model": model_conf, "dataset_conf": dataset_conf}, out_dir,
    )
    return model, variables, dataset_conf, out_dir


def run_capi(capi, out_dir, wave, chunk=4800, softmax=False):
    h = capi.wekws_create(out_dir.encode(), 1 if softmax else 0)
    assert h, "wekws_create failed"
    try:
        dim = capi.wekws_output_dim(h)
        for s in range(0, len(wave), chunk):
            seg = np.ascontiguousarray(wave[s : s + chunk], np.float32)
            capi.wekws_accept_waveform(
                h, seg.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                len(seg),
            )
        capi.wekws_set_input_finished(h)
        rows = []
        idxs = []
        buf = np.zeros((64, dim), np.float32)
        idx = np.zeros(64, np.int64)
        while True:
            n = capi.wekws_decode(
                h, 64, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
            if n == 0:
                break
            rows.append(buf[:n].copy())
            idxs.append(idx[:n].copy())
        return np.concatenate(rows), np.concatenate(idxs)
    finally:
        capi.wekws_free(h)


@pytest.mark.parametrize("with_context,mfcc", [
    (False, False), (True, False), (False, True),
])
def test_cpp_matches_python(capi, tmp_path, rng, with_context, mfcc):
    from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline

    model, variables, dataset_conf, out_dir = export_tiny_model(
        tmp_path, with_context, mfcc
    )
    wave = (rng.standard_normal(16000) * 1000).astype(np.float32)

    got, idx = run_capi(capi, out_dir, wave)

    pipeline = DeviceFeaturePipeline.from_conf(dataset_conf, training=False)
    feats, flens = pipeline(wave[None, :], np.array([len(wave)], np.int32))
    want, _ = model.apply(variables, feats)
    want = np.asarray(want)[0, : int(flens[0])]

    n = min(len(got), len(want))
    assert n > 20
    np.testing.assert_allclose(got[:n], want[:n], atol=2e-3, rtol=1e-3)
    skip = dataset_conf.get("frame_skip", 1)
    np.testing.assert_array_equal(np.diff(idx), skip)


def test_cpp_quantized_artifact(capi, tmp_path, rng):
    from wekws_tpu.export.quantize import quantize_artifact

    model, variables, dataset_conf, out_dir = export_tiny_model(tmp_path)
    qdir = str(tmp_path / "quant")
    quantize_artifact(out_dir, qdir)
    wave = (rng.standard_normal(16000) * 1000).astype(np.float32)
    f32, _ = run_capi(capi, out_dir, wave)
    q, _ = run_capi(capi, qdir, wave)
    np.testing.assert_allclose(q, f32, atol=0.05)


def test_kws_main_binary(capi, tmp_path, rng):
    from wekws_tpu.data.audio import write_wav

    _, _, _, out_dir = export_tiny_model(tmp_path)
    wav_path = str(tmp_path / "x.wav")
    write_wav(wav_path, rng.standard_normal(16000).astype(np.float32) * 0.05,
              16000)
    exe = os.path.join(BUILD_DIR, "kws_main")
    result = subprocess.run(
        [exe, out_dir, wav_path, "40"], capture_output=True, text=True,
        check=True,
    )
    lines = [ln for ln in result.stdout.splitlines() if ln.startswith("frame")]
    assert len(lines) == 98
    assert all(len(ln.split()) == 2 + 3 for ln in lines)


def test_cpp_static_quantized_matches_np_spec(capi, tmp_path, rng):
    """Static int8 EXECUTION parity: the C++ integer path must match
    the numpy executable spec (np_runtime int8 path) to float noise —
    same observers, same zero-point arithmetic, same int32
    accumulation — and stay within DET-meaningful distance of f32."""
    from wekws_tpu.export import GraphRuntime
    from wekws_tpu.export.calibrate import feats_from_waves
    from wekws_tpu.export.quantize import quantize_artifact

    model, variables, dataset_conf, out_dir = export_tiny_model(tmp_path)
    calib_waves = [
        (rng.standard_normal(12000) * 1000).astype(np.float32)
        for _ in range(6)
    ]
    calib = feats_from_waves(out_dir, calib_waves)
    qdir = str(tmp_path / "static_q")
    artifact = quantize_artifact(out_dir, qdir, calib_feats=calib)
    assert artifact["meta"]["static_quant"] is True

    wave = (rng.standard_normal(16000) * 1000).astype(np.float32)
    got, _ = run_capi(capi, qdir, wave)

    feats = feats_from_waves(qdir, [wave])[0]
    np_rt = GraphRuntime(qdir)
    want, _ = np_rt.forward(feats)
    n = min(len(got), len(want))
    assert n > 20
    # tiny frontend float differences can flip an activation's int8
    # bin; a one-bin flip moves the posterior by O(scale * |w|)
    np.testing.assert_allclose(got[:n], want[:n], atol=2e-2, rtol=1e-2)
    flips = np.abs(got[:n] - want[:n]) > 2e-3
    assert flips.mean() < 0.05  # bit-exact for >95% of entries

    f32, _ = run_capi(capi, out_dir, wave)
    assert np.abs(f32[:n] - got[:n]).max() < 0.05


def test_stream_kws_main_stdin_pcm(capi, tmp_path, rng):
    """The live-streaming driver's stdin path: raw S16_LE PCM piped in
    must produce the same per-frame posterior stream as the offline
    driver on the equivalent wav."""
    _, _, _, out_dir = export_tiny_model(tmp_path)
    wave_f = rng.standard_normal(16000).astype(np.float32) * 0.05
    pcm = (wave_f * 32768.0).astype(np.int16).tobytes()
    exe = os.path.join(BUILD_DIR, "stream_kws_main")
    result = subprocess.run(
        [exe, out_dir, "16"], input=pcm, capture_output=True, check=True,
    )
    lines = [
        ln for ln in result.stdout.decode().splitlines()
        if ln.startswith("frame")
    ]
    assert len(lines) == 98
    assert all(len(ln.split()) == 2 + 3 for ln in lines)


def test_stream_kws_main_mic_unavailable(capi, tmp_path, rng):
    """--mic on a machine without libasound must fail cleanly (message
    + drained pipeline), not hang or crash."""
    _, _, _, out_dir = export_tiny_model(tmp_path)
    exe = os.path.join(BUILD_DIR, "stream_kws_main")
    result = subprocess.run(
        [exe, "--mic", out_dir], capture_output=True, text=True,
        timeout=30,
    )
    assert result.returncode == 0
    has_alsa = os.path.exists("/usr/lib/x86_64-linux-gnu/libasound.so.2")
    if not has_alsa:
        assert "not available" in result.stderr or "cannot open" \
            in result.stderr


def test_cpp_static_quantized_fsmn_matches_np_spec(capi, tmp_path, rng):
    """fsmn_block int8 execution: taps in int8, identity path exact
    f32 — C++ vs numpy spec vs float artifact."""
    from wekws_tpu.export import GraphRuntime, export_model
    from wekws_tpu.export.calibrate import feats_from_waves
    from wekws_tpu.export.quantize import quantize_artifact
    from wekws_tpu.models import init_model

    dataset_conf = {
        "feats_type": "fbank",
        "fbank_conf": {"num_mel_bins": 23, "frame_shift": 10,
                       "frame_length": 25, "dither": 0.0},
    }
    model_conf = {
        "input_dim": 23, "output_dim": 3, "hidden_dim": 32,
        "preprocessing": {"type": "none"},
        "backbone": {"type": "fsmn", "input_affine_dim": 24,
                     "num_layers": 2, "linear_dim": 32, "proj_dim": 16,
                     "left_order": 4, "right_order": 2,
                     "left_stride": 1, "right_stride": 1,
                     "output_affine_dim": 24},
        "classifier": {"type": "identity", "dropout": 0.0},
        "activation": {"type": "identity"},
    }
    model = init_model(model_conf)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 20, 23))
    variables = model.init(jax.random.PRNGKey(1), x)
    out_dir = str(tmp_path / "fsmn_artifact")
    export_model(model, variables,
                 {"model": model_conf, "dataset_conf": dataset_conf},
                 out_dir)

    calib_waves = [
        (rng.standard_normal(12000) * 1000).astype(np.float32)
        for _ in range(6)
    ]
    calib = feats_from_waves(out_dir, calib_waves)
    qdir = str(tmp_path / "fsmn_q")
    artifact = quantize_artifact(out_dir, qdir, calib_feats=calib)
    n_fsmn_static = sum(
        1 for e in artifact["ops"]
        if e["op"] == "fsmn_block" and "in_scale" in e.get("attrs", {})
    )
    assert n_fsmn_static == 2

    wave = (rng.standard_normal(16000) * 1000).astype(np.float32)
    got, _ = run_capi(capi, qdir, wave)
    feats = feats_from_waves(qdir, [wave])[0]
    want, _ = GraphRuntime(qdir).forward(feats)
    n = min(len(got), len(want))
    assert n > 20
    np.testing.assert_allclose(got[:n], want[:n], atol=5e-2, rtol=2e-2)

    f32, _ = run_capi(capi, out_dir, wave)
    # raw CTC logits on an untrained model: gate int8 error relative
    # to the observed logit range (trained-model DET parity is gated
    # end-to-end in PERF.md / test_export.py)
    spread = float(f32[:n].max() - f32[:n].min())
    assert np.abs(f32[:n] - got[:n]).max() < 0.05 * max(spread, 1.0)


def write_wav_raw(path, pcm_bytes, bits, channels=1, rate=16000,
                  fmt=1):
    """Hand-rolled RIFF writer for arbitrary bit depths/format tags."""
    import struct

    block_align = channels * bits // 8
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm_bytes)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, fmt, channels, rate, rate * block_align,
        block_align, bits,
    )
    hdr += b"data" + struct.pack("<I", len(pcm_bytes))
    with open(path, "wb") as f:
        f.write(hdr + pcm_bytes)


def read_wav_capi(capi, path):
    capi.wekws_read_wav.restype = ctypes.c_int
    capi.wekws_read_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    rate = ctypes.c_int(0)
    n = capi.wekws_read_wav(path.encode(), None, 0, ctypes.byref(rate))
    if n < 0:
        return None, None
    buf = (ctypes.c_float * n)()
    got = capi.wekws_read_wav(path.encode(), buf, n, ctypes.byref(rate))
    assert got == n
    return np.asarray(buf, np.float32), rate.value


def test_wav_reader_bit_depths(capi, tmp_path):
    """8/16/24/32-bit PCM all decode to int16 scale; 24-bit in
    particular must NOT decode as silence (r2 verdict: it fell through
    every branch and produced zeros)."""
    import struct

    samples16 = np.asarray([0, 1000, -1000, 32767, -32768], np.int64)

    p16 = str(tmp_path / "a16.wav")
    write_wav_raw(p16, struct.pack("<5h", *samples16), 16)
    got, rate = read_wav_capi(capi, p16)
    assert rate == 16000
    np.testing.assert_array_equal(got, samples16.astype(np.float32))

    p24 = str(tmp_path / "a24.wav")
    s24 = samples16 * 256  # int24 scale
    raw24 = b"".join(
        struct.pack("<i", int(v))[:3] for v in s24
    )
    write_wav_raw(p24, raw24, 24)
    got, _ = read_wav_capi(capi, p24)
    np.testing.assert_allclose(got, samples16.astype(np.float32))

    p32 = str(tmp_path / "a32.wav")
    s32 = samples16 * 65536
    write_wav_raw(p32, struct.pack("<5i", *(int(v) for v in s32)), 32)
    got, _ = read_wav_capi(capi, p32)
    np.testing.assert_allclose(got, samples16.astype(np.float32))

    p8 = str(tmp_path / "a8.wav")
    write_wav_raw(p8, bytes([0, 128, 255]), 8)
    got, _ = read_wav_capi(capi, p8)
    np.testing.assert_allclose(got, [-32768.0, 0.0, 32512.0])

    # stereo: channel 0 only
    pst = str(tmp_path / "st.wav")
    inter = struct.pack("<6h", 10, -99, 20, -99, 30, -99)
    write_wav_raw(pst, inter, 16, channels=2)
    got, _ = read_wav_capi(capi, pst)
    np.testing.assert_array_equal(got, [10.0, 20.0, 30.0])


def test_wav_reader_rejects_unsupported(capi, tmp_path):
    """Unsupported layouts are an explicit error (-1 via the C API;
    the binaries' plain constructor aborts), never silent zeros."""
    bad_bits = str(tmp_path / "b20.wav")
    write_wav_raw(bad_bits, b"\x00" * 40, 20)
    n, _ = read_wav_capi(capi, bad_bits)
    assert n is None

    bad_fmt = str(tmp_path / "alaw.wav")
    write_wav_raw(bad_fmt, b"\x00" * 40, 16, fmt=6)  # A-law
    n, _ = read_wav_capi(capi, bad_fmt)
    assert n is None

    missing = str(tmp_path / "nope.wav")
    n, _ = read_wav_capi(capi, missing)
    assert n is None


def write_wav_extensible(path, pcm_bytes, bits, sub_format,
                         channels=1, rate=16000):
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) with a 40-byte fmt chunk."""
    import struct

    block_align = channels * bits // 8
    guid_tail = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38" \
                b"\x9b\x71"
    fmt = struct.pack(
        "<HHIIHHHHI", 0xFFFE, channels, rate, rate * block_align,
        block_align, bits, 22, bits, 1,
    ) + struct.pack("<H", sub_format) + guid_tail
    hdr = b"RIFF" + struct.pack("<I", 36 + 24 + len(pcm_bytes)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    hdr += b"data" + struct.pack("<I", len(pcm_bytes))
    with open(path, "wb") as f:
        f.write(hdr + pcm_bytes)


def test_wav_reader_extensible_format(capi, tmp_path):
    """0xFFFE wavs resolve the SubFormat: extensible int PCM decodes,
    extensible IEEE-float is REJECTED (not decoded as int garbage)."""
    import struct

    vals = [0, 1000, -1000]
    p_pcm = str(tmp_path / "ext_pcm.wav")
    write_wav_extensible(p_pcm, struct.pack("<3h", *vals), 16,
                         sub_format=1)
    got, rate = read_wav_capi(capi, p_pcm)
    assert rate == 16000
    np.testing.assert_array_equal(got, np.asarray(vals, np.float32))

    p_float = str(tmp_path / "ext_float.wav")
    write_wav_extensible(
        p_float, struct.pack("<3f", 0.0, 0.5, -0.5), 32, sub_format=3
    )
    n, _ = read_wav_capi(capi, p_float)
    assert n is None


def test_wav_reader_fuzz_no_crash(capi, tmp_path):
    """Garbage, truncated, and mutated wav files must come back as
    errors (-1) or valid decodes through the C API — never crash the
    process (the fuzz runs in-process: a segfault/abort fails the
    suite)."""
    import struct

    rng = np.random.default_rng(99)
    p = str(tmp_path / "fuzz.wav")

    # pure garbage
    for n in (0, 1, 7, 44, 200):
        with open(p, "wb") as f:
            f.write(bytes(rng.integers(0, 256, n, dtype=np.uint8)))
        read_wav_capi(capi, p)

    # a valid wav, truncated at every interesting boundary
    good = struct.pack("<8h", *range(8))
    write_wav_raw(p, good, 16)
    blob = open(p, "rb").read()
    for cut in (4, 12, 20, 36, 44, len(blob) - 3):
        with open(p, "wb") as f:
            f.write(blob[:cut])
        read_wav_capi(capi, p)

    # random single-byte mutations of a valid file
    for _ in range(40):
        mutated = bytearray(blob)
        mutated[int(rng.integers(0, len(blob)))] = int(rng.integers(0, 256))
        with open(p, "wb") as f:
            f.write(bytes(mutated))
        read_wav_capi(capi, p)
