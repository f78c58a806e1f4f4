"""Device-resident epoch mode (data/resident.py) on the 8-device mesh.

Covers: shuffle-order parity with the streaming DataList, single-step
parity with the host-batched path, loss decrease over staged epochs,
exact cv accounting under tail padding, and both staging shardings
(replicated + sharded gather collectives).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wekws_tpu.data.dataset import DataList
from wekws_tpu.data.resident import (
    ResidentCorpus,
    make_resident_steps,
    stage_arrays,
    stage_data_list,
)
from wekws_tpu.models import init_model
from wekws_tpu.parallel import make_mesh, shard_batch
from wekws_tpu.train import Executor, Trainer
from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline

DATASET_CONF = {
    "filter_conf": {"max_length": 2048, "min_length": 0},
    "feats_type": "fbank",
    "fbank_conf": {"num_mel_bins": 40, "frame_shift": 10,
                   "frame_length": 25, "dither": 0.0},
    "batch_conf": {"batch_size": 8},
}

MODEL_CONF = {
    "input_dim": 40, "output_dim": 3, "hidden_dim": 32,
    "preprocessing": {"type": "linear"},
    "backbone": {"type": "tcn", "ds": True, "num_layers": 2,
                 "kernel_size": 4, "dropout": 0.0},
    "classifier": {"type": "global", "dropout": 0.0},
    "activation": {"type": "identity"},
}


def synth_arrays(n=24, s=4000, classes=3, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(s) / 16000.0
    waves = np.zeros((n, s), np.int16)
    target = np.zeros((n,), np.int32)
    for i in range(n):
        cls = i % classes
        w = 0.3 * np.sin(2 * np.pi * 400 * (cls + 1) * t)
        w += 0.02 * rng.standard_normal(s)
        waves[i] = np.clip(np.rint(w * 32768.0), -32768, 32767)
        target[i] = cls
    return {
        "waves": waves,
        "wave_lengths": np.full((n,), s, np.int32),
        "target": target,
        "target_lengths": np.ones((n,), np.int32),
    }


def make_trainer():
    model = init_model(MODEL_CONF)
    pipe = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=True)
    cvp = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=False)
    return Trainer(model, pipe, cvp, "ce", learning_rate=1e-3)


def test_epoch_index_matches_datalist():
    """The on-device shuffle order is bit-identical to the streaming
    DataList's Random(epoch) order."""
    n = 37
    corpus = ResidentCorpus(arrays={}, n=n, audio_seconds=0.0)
    dl = DataList([str(i) for i in range(n)], shuffle=True,
                  partition=False)
    for epoch in (0, 1, 5):
        dl.set_epoch(epoch)
        want = [int(s["src"]) for s in dl]
        idx = corpus.epoch_index(epoch, batch_size=5)
        got = idx.reshape(-1).tolist()
        assert got == want[: len(got)]  # drop_last truncates the tail


def test_epoch_index_drop_last_and_wrap():
    corpus = ResidentCorpus(arrays={}, n=10, audio_seconds=0.0)
    idx = corpus.epoch_index(0, 4, shuffle=False, drop_last=True)
    assert idx.shape == (2, 4)
    idx = corpus.epoch_index(0, 4, shuffle=False, drop_last=False)
    assert idx.shape == (3, 4)
    # wraparound fill comes from the front of the permutation
    assert idx.reshape(-1).tolist() == list(range(10)) + [0, 1]


def test_resident_step_parity_with_host_path():
    """One resident train step == one host-batched train step, given
    the same rows, rng and state."""
    mesh = make_mesh()
    trainer = make_trainer()
    arrays = synth_arrays(n=16)
    batch = {k: v[:8] for k, v in arrays.items()}
    rng = jax.random.key(7, impl="rbg")
    state = trainer.init_state(jax.random.PRNGKey(0), batch, mesh)

    sharded = shard_batch(dict(batch), mesh)
    s_host, m_host = trainer.train_step(state, sharded, rng, 1e-3)

    corpus = stage_arrays(arrays, mesh=mesh)
    train_step, _ = make_resident_steps(trainer, mesh, steps_per_epoch=2)
    epoch_idx = np.arange(16, dtype=np.int32).reshape(2, 8)
    s_res, m_res = train_step(
        state, corpus.arrays, {}, jax.device_put(epoch_idx),
        jnp.zeros((), jnp.int32), rng, jnp.asarray(1e-3, jnp.float32),
    )
    np.testing.assert_allclose(
        float(m_host["loss"]), float(m_res["loss"]), rtol=1e-5
    )
    host_leaves = jax.tree_util.tree_leaves(s_host.params)
    res_leaves = jax.tree_util.tree_leaves(s_res.params)
    for a, b in zip(host_leaves, res_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("budget", [1 << 40, 0])
def test_resident_training_decreases_loss(budget):
    """Full epochs through Executor.train_resident on both staging
    shardings (replicated, and sharded with gather collectives)."""
    mesh = make_mesh()
    trainer = make_trainer()
    arrays = synth_arrays(n=48)
    corpus = stage_arrays(arrays, mesh=mesh,
                          replicate_budget_bytes=budget)
    batch = {k: v[:8] for k, v in corpus.arrays.items()}
    state = trainer.init_state(jax.random.PRNGKey(0), batch, mesh)
    ex = Executor(trainer, mesh, log_interval=100)
    rng = jax.random.key(3, impl="rbg")
    first = last = None
    for epoch in range(4):
        state, summary = ex.train_resident(
            state, corpus, rng, 1e-3, epoch, batch_size=8
        )
        if first is None:
            first = summary["train_loss"]
        last = summary["train_loss"]
    assert last < first
    cv = ex.cv_resident(state, corpus, batch_size=8)
    assert cv["utts"] == 48
    assert cv["cv_acc"] > 0.5


def test_cv_resident_exact_tail_accounting():
    """n not a multiple of B: padded tail rows are excluded exactly."""
    mesh = make_mesh()
    trainer = make_trainer()
    arrays = synth_arrays(n=19)
    corpus = stage_arrays(arrays, mesh=mesh)
    batch = {k: v[:8] for k, v in corpus.arrays.items()}
    state = trainer.init_state(jax.random.PRNGKey(0), batch, mesh)
    ex = Executor(trainer, mesh, log_interval=100)
    cv = ex.cv_resident(state, corpus, batch_size=8)
    assert cv["utts"] == 19


def test_stage_data_list_roundtrip(tmp_path):
    """stage_data_list reads a real data.list and matches the raw
    waves; waveform-augmented configs are rejected."""
    from wekws_tpu.data.audio import read_wav, write_wav

    rng = np.random.default_rng(5)
    lines = []
    n, s = 6, 3200
    raw = []
    for i in range(n):
        w = (0.2 * rng.standard_normal(s)).astype(np.float32)
        p = tmp_path / f"u{i}.wav"
        write_wav(str(p), w, 16000)
        stored, _ = read_wav(str(p))  # what's actually on disk
        raw.append(np.rint(stored * 32768.0))
        lines.append(json.dumps(
            {"key": f"u{i}", "txt": str(i % 3), "wav": str(p)}
        ))
    lst = tmp_path / "data.list"
    lst.write_text("\n".join(lines))
    mesh = make_mesh()
    corpus = stage_data_list(str(lst), DATASET_CONF, split="train",
                             mesh=mesh, rank=0, world_size=1)
    assert corpus.n == n
    assert corpus.keys == [f"u{i}" for i in range(n)]
    waves = np.asarray(corpus.arrays["waves"])
    for i in range(n):
        np.testing.assert_array_equal(waves[i, :s], raw[i])

    aug_conf = dict(DATASET_CONF, speed_perturb=True)
    with pytest.raises(ValueError, match="augmentation"):
        stage_data_list(str(lst), aug_conf, split="train", mesh=mesh,
                        rank=0, world_size=1)


def test_stage_arrays_force_upload_modes():
    """force_upload wires correctly: async spawns a joinable forcer
    (wait_uploaded returns its measured seconds), sync completes
    inline, lazy leaves no thread — and the staged arrays are
    byte-identical in all modes."""
    arrays = synth_arrays(n=8)
    lazy = stage_arrays(dict(arrays), force_upload="lazy")
    assert lazy.upload_thread is None and lazy.upload_seconds is None
    sync = stage_arrays(dict(arrays), force_upload="sync")
    assert sync.upload_thread is None
    assert sync.upload_seconds is not None and sync.upload_seconds >= 0
    asy = stage_arrays(dict(arrays), force_upload="async")
    up = asy.wait_uploaded()
    assert up is not None and up >= 0
    assert asy.upload_thread is None  # cleared by wait_uploaded
    for k in arrays:
        np.testing.assert_array_equal(
            np.asarray(asy.arrays[k]), np.asarray(sync.arrays[k]))


def test_put_chunked_matches_direct():
    """_put_chunked (threaded enqueue + async device concat) produces
    the same staged array as a direct device_put, with and without a
    mesh sharding."""
    from wekws_tpu.data.resident import _put_chunked
    from wekws_tpu.parallel.mesh import make_mesh, replicated

    rng = np.random.default_rng(0)
    v = rng.integers(-1000, 1000, (1 << 21, 16)).astype(np.int16)
    assert v.nbytes >= (64 << 20)  # above the chunking threshold
    got = _put_chunked(v, threads=4)
    np.testing.assert_array_equal(np.asarray(got), v)
    mesh = make_mesh(1)
    got2 = _put_chunked(v, threads=4, sharding=replicated(mesh))
    np.testing.assert_array_equal(np.asarray(got2), v)


@pytest.mark.parametrize("bank_dtype", ["float32", "bfloat16"])
def test_resident_training_with_device_aug(bank_dtype):
    """Waveform augmentation inside the jitted resident step
    (data/device_aug.py): speed perturb grows the wave buffer, noise
    and reverb mix from staged banks, and training still learns —
    with f32 AND the production bf16 banks/DFT intermediates."""
    from wekws_tpu.data.device_aug import DeviceWaveAug

    rng_np = np.random.default_rng(5)
    noise_bank = (rng_np.standard_normal((3, 2500)) * 200).astype(
        np.float32)
    rir = rng_np.standard_normal(200)
    rir = (rir / np.sqrt(np.sum(rir ** 2))).astype(np.float32)
    from wekws_tpu.data.device_aug import MatmulFFT

    out_len = int(np.ceil(4000 / 0.9))
    fft = MatmulFFT.for_length(out_len + len(rir) - 1,
                               precision="default", dtype=bank_dtype)
    spec = np.zeros((8, fft.nh), np.complex64)
    spec[0] = fft.spectrum_mat_half(rir).reshape(-1)
    rows = np.zeros((16, out_len), np.float32)
    for i in range(3):
        rows[i] = np.resize(noise_bank[i], (out_len,))
    aug = DeviceWaveAug(
        speed_perturb=True, speeds=(0.9, 1.0, 1.1),
        fft=fft,
        rir_re=jnp.asarray(spec.real, bank_dtype),
        rir_im=jnp.asarray(spec.imag, bank_dtype),
        n_rirs=1, reverb_prob=0.5,
        noise_rows=jnp.asarray(rows, bank_dtype),
        snr_lo=jnp.full((16,), 5.0),
        snr_hi=jnp.full((16,), 15.0),
        n_noise_rows=3, noise_prob=0.7, power_scale=1.0 / 32768.0,
    )
    mesh = make_mesh()
    trainer = make_trainer()
    trainer.pipeline.wave_aug = aug
    corpus = stage_arrays(synth_arrays(n=32), mesh=mesh)
    example = {k: np.asarray(v[:8]) for k, v in corpus.arrays.items()}
    state = trainer.init_state(jax.random.PRNGKey(0), example, mesh)
    ex = Executor(trainer, mesh, log_interval=10**9)
    rng = jax.random.PRNGKey(1)
    losses = []
    for epoch in range(8):
        state, summary = ex.train_resident(
            state, corpus, rng, 1e-2, epoch, batch_size=8)
        losses.append(summary["train_loss"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
