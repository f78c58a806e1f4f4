"""Data pipeline tests: host stages, blob store, device pipeline."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wekws_tpu.data import init_dataset
from wekws_tpu.data.audio import read_wav, resample, speed_perturb, write_wav
from wekws_tpu.data.blobstore import BlobData, BlobWriter
from wekws_tpu.data.dataset import DataList, scrub_conf
from wekws_tpu.data.device_pipeline import (
    DeviceFeaturePipeline,
    context_expansion,
    frame_skip,
    spec_aug,
)
from wekws_tpu.data import processor


def write_tone(path, freq, n, sr=16000, amp=0.3):
    t = np.arange(n) / sr
    write_wav(path, (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32), sr)


@pytest.fixture
def corpus(tmp_path):
    """Six tiny wavs + data.list with integer labels."""
    lines = []
    for i in range(6):
        p = tmp_path / f"u{i}.wav"
        write_tone(str(p), 300 + 100 * i, 8000 + 1600 * i)
        lines.append(
            json.dumps(
                {"key": f"u{i}", "txt": str(i % 3), "wav": str(p)}
            )
        )
    lst = tmp_path / "data.list"
    lst.write_text("\n".join(lines))
    return str(lst)


class TestAudio:
    def test_wav_roundtrip(self, tmp_path, rng):
        w = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        path = str(tmp_path / "x.wav")
        write_wav(path, w, 16000)
        got, sr = read_wav(path)
        assert sr == 16000
        np.testing.assert_allclose(got, w, atol=1e-4)

    def test_resample_halves_length(self, rng):
        w = rng.standard_normal(16000).astype(np.float32)
        out = resample(w, 16000, 8000)
        assert abs(len(out) - 8000) <= 1

    def test_speed_perturb_lengths(self, rng):
        w = rng.standard_normal(16000).astype(np.float32)
        assert abs(len(speed_perturb(w, 0.9)) - 16000 / 0.9) < 20
        assert abs(len(speed_perturb(w, 1.1)) - 16000 / 1.1) < 20
        assert speed_perturb(w, 1.0) is w


class TestBlobStore:
    def test_roundtrip_and_random(self, tmp_path):
        path = str(tmp_path / "store")
        with BlobWriter(path) as w:
            for i in range(5):
                w.put(f"noise_{i}", bytes([i]) * (i + 1))
        store = BlobData(path, seed=0)
        assert len(store) == 5
        key, val = store.get(2)
        assert key == "noise_2" and val == b"\x02\x02\x02"
        keys = {store.random_one()[0] for _ in range(50)}
        assert len(keys) > 1


class TestDataList:
    def test_sharding_partitions_disjoint(self):
        lines = [str(i) for i in range(10)]
        seen = []
        for r in range(2):
            dl = DataList(lines, shuffle=True, rank=r, world_size=2)
            dl.set_epoch(3)
            seen.append({s["src"] for s in dl})
        assert seen[0] | seen[1] == set(lines)
        assert not (seen[0] & seen[1])

    def test_epoch_reshuffles(self):
        lines = [str(i) for i in range(20)]
        dl = DataList(lines, shuffle=True, rank=0, world_size=1)
        dl.set_epoch(0)
        a = [s["src"] for s in dl]
        dl.set_epoch(1)
        b = [s["src"] for s in dl]
        assert a != b and sorted(a) == sorted(b)


class TestDataset:
    def test_end_to_end_batches(self, corpus):
        conf = {
            "filter_conf": {"max_length": 2048, "min_length": 0},
            "resample_conf": {"resample_rate": 16000},
            "shuffle": False,
            "batch_conf": {"batch_size": 4, "bucket_samples": 8000},
        }
        ds = init_dataset(corpus, conf, split="train_noshuffle",
                          rank=0, world_size=1)
        batches = list(ds)
        assert len(batches) == 2
        b0 = batches[0]
        assert b0["waves"].shape[0] == 4
        assert b0["waves"].shape[1] % 8000 == 0
        assert b0["target"].shape == (4,)
        # int16 scaling applied
        assert np.abs(b0["waves"]).max() > 100
        # padding beyond lengths is zero
        i = int(np.argmin(b0["wave_lengths"]))
        assert np.all(b0["waves"][i, b0["wave_lengths"][i]:] == 0)

    def test_scrub_conf(self):
        conf = {
            "speed_perturb": True, "spec_aug": True, "shuffle": True,
            "noise_prob": 0.5, "reverb_prob": 0.5,
            "fbank_conf": {"dither": 1.0},
        }
        scrub_conf(conf)
        assert not conf["speed_perturb"] and not conf["spec_aug"]
        assert conf["fbank_conf"]["dither"] == 0.0

    def test_token_labels(self, tmp_path, corpus):
        tok = tmp_path / "tokens.txt"
        tok.write_text("<blank> 0\na 1\nb 2\n")
        from wekws_tpu.text import CharTokenizer

        tokenizer = CharTokenizer(str(tok), unk="<blank>")
        samples = [{"key": "k", "txt": "ab", "wav": np.zeros(100, np.float32),
                    "sample_rate": 16000}]
        out = list(processor.tokenize(iter(samples), tokenizer))
        assert out[0]["label"] == [1, 2]


class TestDevicePipeline:
    def test_context_expansion_semantics(self):
        # manual check of splice-with-clamp + drop-right
        t, d = 5, 2
        x = jnp.arange(t * d, dtype=jnp.float32).reshape(1, t, d)
        out = context_expansion(x, left=1, right=1)
        assert out.shape == (1, t - 1, d * 3)
        # frame 0: left context clamped to frame 0
        np.testing.assert_array_equal(
            np.asarray(out[0, 0]),
            np.concatenate([x[0, 0], x[0, 0], x[0, 1]]),
        )
        np.testing.assert_array_equal(
            np.asarray(out[0, 2]),
            np.concatenate([x[0, 1], x[0, 2], x[0, 3]]),
        )

    def test_frame_skip(self):
        x = jnp.arange(10, dtype=jnp.float32).reshape(1, 10, 1)
        out = frame_skip(x, 3)
        np.testing.assert_array_equal(
            np.asarray(out[0, :, 0]), [0, 3, 6, 9]
        )

    def test_spec_aug_masks_and_preserves(self, rng):
        x = jnp.ones((2, 50, 40))
        out = spec_aug(jax.random.PRNGKey(0), x, 1, 1, 10, 5)
        arr = np.asarray(out)
        assert ((arr == 0) | (arr == 1)).all()
        assert (arr == 0).any()
        # masking differs across batch entries (per-utterance randomness)
        assert not np.array_equal(arr[0], arr[1])

    def test_pipeline_from_conf(self):
        conf = {
            "feats_type": "fbank",
            "fbank_conf": {"num_mel_bins": 40, "frame_shift": 10,
                           "frame_length": 25, "dither": 1.0},
            "context_expansion": True,
            "context_expansion_conf": {"left": 2, "right": 2},
            "frame_skip": 3,
            "spec_aug": True,
            "spec_aug_conf": {"num_t_mask": 1, "num_f_mask": 1,
                              "max_t": 20, "max_f": 10},
        }
        pipe = DeviceFeaturePipeline.from_conf(conf, training=True)
        assert pipe.output_dim == 40 * 5
        waves = jnp.zeros((2, 16000)) + 100.0
        lengths = jnp.asarray([16000, 8000])
        feats, flens = jax.jit(pipe)(waves, lengths, jax.random.PRNGKey(1))
        assert feats.shape[0] == 2 and feats.shape[2] == 200
        # length formula: frames=98 -> -right=96 -> ceil(/3)=32
        assert int(flens[0]) == 32
        cv_pipe = DeviceFeaturePipeline.from_conf(conf, training=False)
        assert cv_pipe.spec_aug_conf is None
        assert cv_pipe.extractor.cfg.dither == 0.0


class TestDataLoader:
    def test_workers_union_equals_rank_shard(self, corpus):
        from wekws_tpu.data.loader import DataLoader

        conf = {
            "filter_conf": {"max_length": 2048, "min_length": 0},
            "resample_conf": {"resample_rate": 16000},
            "shuffle": False,
            "batch_conf": {"batch_size": 2, "bucket_samples": 8000},
        }
        ds = init_dataset(corpus, conf, split="cv", rank=0, world_size=1)
        serial_keys = sorted(
            k for b in ds for k in b["keys"]
        )
        loader = DataLoader(
            init_dataset(corpus, conf, split="cv", rank=0, world_size=1),
            num_workers=2,
        )
        loader.set_epoch(0)
        parallel_keys = sorted(k for b in loader for k in b["keys"])
        assert parallel_keys == serial_keys

    def test_zero_workers_prefetch(self, corpus):
        from wekws_tpu.data.loader import DataLoader

        conf = {
            "filter_conf": {"max_length": 2048, "min_length": 0},
            "resample_conf": {"resample_rate": 16000},
            "shuffle": False,
            "batch_conf": {"batch_size": 4, "bucket_samples": 8000},
        }
        loader = DataLoader(
            init_dataset(corpus, conf, split="cv", rank=0, world_size=1),
            num_workers=0,
        )
        assert sum(len(b["keys"]) for b in loader) == 6


def test_fixed_samples_batching(corpus):
    conf = {
        "filter_conf": {"max_length": 2048, "min_length": 0},
        "resample_conf": {"resample_rate": 16000},
        "shuffle": False,
        "batch_conf": {"batch_size": 4, "bucket_samples": 8000,
                       "fixed_samples": 16000},
    }
    ds = init_dataset(corpus, conf, split="cv", rank=0, world_size=1)
    shapes = {b["waves"].shape[1] for b in ds}
    assert shapes == {16000}


def test_emit_batch_asserts_on_overlong_labels():
    """fixed_label_len must never silently truncate CTC targets."""
    from wekws_tpu.data.processor import _emit_batch

    samples = [
        {"key": "ok", "wav": np.zeros(100, np.float32), "label": [1, 2]},
        {"key": "toolong", "wav": np.zeros(100, np.float32),
         "label": [1, 2, 3, 4]},
    ]
    with pytest.raises(AssertionError, match="toolong"):
        _emit_batch(samples, smax=100, wave_scale=1.0, fixed_label_len=3)
    # at the cap is fine
    out = _emit_batch(samples, smax=100, wave_scale=1.0, fixed_label_len=4)
    assert out["target"].shape == (2, 4)


def test_make_blob_cli(tmp_path, rng):
    """tools.make_blob packs a wav.scp into a BlobData-readable store
    (reference tools/make_lmdb.py equivalent)."""
    import subprocess
    import sys

    wavs = {}
    scp_lines = []
    for i in range(3):
        wave = (rng.standard_normal(800) * 1000).astype(np.float32)
        p = tmp_path / f"n{i}.wav"
        write_wav(str(p), wave, 16000)
        wavs[f"n{i}"] = p.read_bytes()
        scp_lines.append(f"n{i} {p}")
    scp = tmp_path / "wav.scp"
    scp.write_text("\n".join(scp_lines) + "\n")

    out = tmp_path / "noise_store"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    subprocess.run(
        [sys.executable, "-m", "wekws_tpu.tools.make_blob",
         str(scp), str(out)],
        check=True, capture_output=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    store = BlobData(str(out), seed=0)
    assert sorted(k for k, _, _ in store.entries) == ["n0", "n1", "n2"]
    key, data = store.random_one()
    assert data == wavs[key]


def test_int16_wire_roundtrip_exact(tmp_path, rng):
    """Default int16 wire format: for unaugmented int16-on-disk wavs
    the batch carries exactly the stored integer samples (and the f32
    cast downstream reproduces the float32 path bit-for-bit)."""
    from wekws_tpu.data.processor import _emit_batch

    from scipy.io import wavfile

    wave_int = rng.integers(-32768, 32767, 1600).astype(np.int16)
    p = tmp_path / "w.wav"
    wavfile.write(str(p), 16000, wave_int)  # exact stored integers
    loaded, _ = read_wav(str(p))
    sample = {"key": "w", "wav": loaded, "label": 0}
    b16 = _emit_batch([sample], smax=1600, wave_scale=32768.0,
                      wire_dtype="int16")
    assert b16["waves"].dtype == np.int16
    np.testing.assert_array_equal(b16["waves"][0], wave_int)
    b32 = _emit_batch([sample], smax=1600, wave_scale=32768.0)
    assert b32["waves"].dtype == np.float32
    np.testing.assert_array_equal(
        b16["waves"][0].astype(np.float32), b32["waves"][0]
    )


def test_blobstore_pickles_into_workers(tmp_path, rng):
    """BlobData must survive spawn-pickling (DataLoader workers open
    their own mmap) — regression for the aug-with-workers crash."""
    import pickle

    wave = (rng.standard_normal(800) * 1000).astype(np.float32)
    p = tmp_path / "noise_0.wav"
    write_wav(str(p), wave / 32768.0, 16000)
    with BlobWriter(str(tmp_path / "store")) as w:
        w.put("noise_0", p.read_bytes())
    store = BlobData(str(tmp_path / "store"), seed=0)
    key, data = store.random_one()  # open the mmap
    clone = pickle.loads(pickle.dumps(store))
    key2, data2 = clone.random_one()
    assert (key, data) == (key2, data2)


def test_shm_transport_matches_pickle(corpus):
    """Shared-memory batch transport (default) must deliver the exact
    arrays the pickling transport does, across multiple epochs (segment
    reuse), with both loaders closed cleanly."""
    from wekws_tpu.data.loader import DataLoader

    conf = {
        "filter_conf": {"max_length": 2048, "min_length": 0},
        "resample_conf": {"resample_rate": 16000},
        "shuffle": False,
        "batch_conf": {"batch_size": 2, "bucket_samples": 8000},
    }

    def collect(shm):
        loader = DataLoader(
            init_dataset(corpus, conf, split="cv", rank=0, world_size=1),
            num_workers=2, shm=shm,
        )
        out = {}
        for epoch in (0, 1):
            loader.set_epoch(epoch)
            for b in loader:
                for i, k in enumerate(b["keys"]):
                    out[(epoch, k)] = (
                        b["waves"][i].copy(),
                        int(b["wave_lengths"][i]),
                    )
        loader.close()
        return out

    got = collect(True)
    want = collect(False)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k][0], want[k][0])
        assert got[k][1] == want[k][1]


def test_add_reverb_matches_fftconvolve(tmp_path, rng):
    """Cached-spectrum reverb == scipy fftconvolve(full)[:n] to f32
    roundoff (different FFT evaluation order only)."""
    import random as pyrandom

    from scipy.signal import fftconvolve

    from wekws_tpu.data import processor

    with BlobWriter(str(tmp_path / "rir")) as w:
        for i in range(2):
            r = (rng.standard_normal(1600)
                 * np.exp(-np.arange(1600) / 800)).astype(np.float32)
            p = tmp_path / f"rir_{i}.wav"
            write_wav(str(p), r / 10, 16000)
            w.put(f"rir_{i}", p.read_bytes())

    samples = [
        {"key": f"s{i}",
         "wav": rng.standard_normal(9000 + i * 50).astype(np.float32)}
        for i in range(4)
    ]
    pyrandom.seed(9)
    got = [
        s["wav"]
        for s in processor.add_reverb(
            iter([dict(x) for x in samples]),
            BlobData(str(tmp_path / "rir"), seed=2), 1.0,
        )
    ]
    pyrandom.seed(9)
    store = BlobData(str(tmp_path / "rir"), seed=2)
    for g, s in zip(got, samples):
        pyrandom.random()  # the aug_prob draw
        _, rb = store.random_one()
        rir, _ = read_wav(rb)
        rir = rir / np.sqrt(np.sum(rir ** 2))
        want = fftconvolve(s["wav"], rir, mode="full")[: len(s["wav"])]
        np.testing.assert_allclose(g, want.astype(np.float32), atol=3e-6)


def test_worker_augmentation_decorrelated(tmp_path, corpus):
    """Spawn workers inherit a pickled Dataset; per-worker seeding must
    decorrelate the global-random aug draws AND the noise-store
    sampler, or every worker applies the same augmentation sequence."""
    import random as pyrandom

    with BlobWriter(str(tmp_path / "noise")) as w:
        for i in range(8):
            wav = tmp_path / f"noise_{i}.wav"
            write_wav(str(wav), np.zeros(400, np.float32), 16000)
            w.put(f"noise_{i}", wav.read_bytes())
    conf = {
        "filter_conf": {"max_length": 2048, "min_length": 0},
        "resample_conf": {"resample_rate": 16000},
        "noise_source": str(tmp_path / "noise"),
        "noise_prob": 0.5,
        "shuffle": True,
        "batch_conf": {"batch_size": 2, "bucket_samples": 8000},
    }

    def draws(worker):
        ds = init_dataset(corpus, conf, split="train", rank=0, world_size=1)
        ds.data_list.set_worker(worker, 2)
        ds.set_epoch(3)
        globals_seq = [pyrandom.random() for _ in range(6)]
        store_seq = [ds._noise_store.random_one()[0] for _ in range(6)]
        return globals_seq, store_seq

    g0, s0 = draws(0)
    g1, s1 = draws(1)
    assert g0 != g1, "global random stream identical across workers"
    assert s0 != s1, "noise-store sampler identical across workers"
    # same worker is reproducible
    g0b, s0b = draws(0)
    assert g0 == g0b and s0 == s0b


def test_wire_dtype_auto_float32_under_aug(tmp_path, corpus):
    """Waveform augmentation overshoots int16 range (0 dB noise mixes,
    reverb); the wire dtype auto-falls back to float32 so batches are
    NOT hard-clipped (explicit batch_conf.wire_dtype still wins)."""
    conf = {
        "filter_conf": {"max_length": 2048, "min_length": 0},
        "resample_conf": {"resample_rate": 16000},
        "speed_perturb": True,
        "shuffle": False,
        "batch_conf": {"batch_size": 2, "bucket_samples": 8000},
    }
    ds = init_dataset(corpus, conf, split="train", rank=0, world_size=1)
    batch = next(iter(ds))
    assert batch["waves"].dtype == np.float32
    clean = init_dataset(
        corpus, dict(conf, speed_perturb=False), split="cv",
        rank=0, world_size=1,
    )
    assert next(iter(clean))["waves"].dtype == np.int16


def test_rank_and_store_decorrelation(tmp_path, corpus):
    """Aug seeding must differ across RANKS too (multi-host), and the
    noise vs reverb store samplers must not mirror each other."""
    import random as pyrandom

    for kind in ("noise", "rir"):
        with BlobWriter(str(tmp_path / kind)) as w:
            for i in range(8):
                wav = tmp_path / f"{kind}_{i}.wav"
                write_wav(str(wav), np.zeros(400, np.float32), 16000)
                w.put(f"{kind}_{i}", wav.read_bytes())
    conf = {
        "filter_conf": {"max_length": 2048, "min_length": 0},
        "resample_conf": {"resample_rate": 16000},
        "noise_source": str(tmp_path / "noise"),
        "noise_prob": 0.5,
        "reverb_source": str(tmp_path / "rir"),
        "reverb_prob": 0.5,
        "shuffle": True,
        "batch_conf": {"batch_size": 2, "bucket_samples": 8000},
    }

    def draws(rank):
        ds = init_dataset(corpus, conf, split="train",
                          rank=rank, world_size=2)
        ds.set_epoch(1)
        g = [pyrandom.random() for _ in range(6)]
        noise_idx = [ds._noise_store.random_one()[0][-1] for _ in range(8)]
        rir_idx = [ds._reverb_store.random_one()[0][-1] for _ in range(8)]
        return g, noise_idx, rir_idx

    g0, n0, r0 = draws(0)
    g1, n1, r1 = draws(1)
    assert g0 != g1, "global random stream identical across ranks"
    assert n0 != r0, "noise and reverb samplers mirror each other"


def test_context_expansion_skip_fused_matches_unfused():
    """The gather-free fused splice+skip == frame_skip(context_expansion)
    exactly, across lefts/rights/skips and awkward lengths."""
    import jax.numpy as jnp

    from wekws_tpu.data.device_pipeline import (
        context_expansion,
        context_expansion_skip,
        frame_skip,
    )

    rng = np.random.default_rng(9)
    for t in (7, 30, 31, 32, 33, 100):
        for left, right in ((2, 2), (1, 0), (0, 2), (3, 1)):
            for skip in (2, 3, 4):
                x = jnp.asarray(
                    rng.standard_normal((2, t, 5)).astype(np.float32))
                want = frame_skip(
                    context_expansion(x, left, right), skip)
                got = context_expansion_skip(x, left, right, skip)
                assert got.shape == want.shape, (
                    t, left, right, skip, got.shape, want.shape)
                np.testing.assert_array_equal(
                    np.asarray(got), np.asarray(want),
                    err_msg=f"t={t} l={left} r={right} s={skip}")
