"""End-to-end training tests on the 8-device CPU mesh.

The minimum end-to-end slice of SURVEY.md §7 step 4: synthetic tone
dataset -> host pipeline -> sharded jit train step -> loss decreases;
plus checkpoint round-trip, averaging, scheduler, and cv exactness
under batch padding.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wekws_tpu.data import init_dataset
from wekws_tpu.data.audio import write_wav
from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline
from wekws_tpu.models import init_model
from wekws_tpu.parallel import make_mesh
from wekws_tpu.train import (
    Executor,
    ReduceLROnPlateau,
    Trainer,
    average_checkpoints,
    load_checkpoint,
    save_checkpoint,
)


def tone_wave(rng, freq, n, sr=16000):
    t = np.arange(n) / sr
    return (
        0.3 * np.sin(2 * np.pi * freq * t)
        + 0.02 * rng.standard_normal(n)
    ).astype(np.float32)


@pytest.fixture(scope="module")
def tone_corpus(tmp_path_factory):
    """3-class tone corpus + CMVN stats: (data.list path, cmvn path)."""
    tmp = tmp_path_factory.mktemp("tones")
    rng = np.random.default_rng(0)
    lines = []
    paths = []
    for i in range(48):
        cls = i % 3
        p = tmp / f"u{i}.wav"
        write_wav(str(p), tone_wave(rng, 400 * (cls + 1), 8000), 16000)
        paths.append(str(p))
        lines.append(json.dumps({"key": f"u{i}", "txt": str(cls),
                                 "wav": str(p)}))
    lst = tmp / "data.list"
    lst.write_text("\n".join(lines))

    from wekws_tpu.tools import compute_cmvn_stats

    cmvn_path = str(tmp / "global_cmvn")
    compute_cmvn_stats(paths, DATASET_CONF, cmvn_path)
    return str(lst), cmvn_path


DATASET_CONF = {
    "filter_conf": {"max_length": 2048, "min_length": 0},
    "resample_conf": {"resample_rate": 16000},
    "feats_type": "fbank",
    "fbank_conf": {"num_mel_bins": 40, "frame_shift": 10,
                   "frame_length": 25, "dither": 0.0},
    "shuffle": True,
    "shuffle_conf": {"shuffle_size": 64},
    "batch_conf": {"batch_size": 16, "bucket_samples": 8000},
}

MODEL_CONF = {
    "input_dim": 40, "output_dim": 3, "hidden_dim": 32,
    "preprocessing": {"type": "linear"},
    "backbone": {"type": "tcn", "ds": True, "num_layers": 2,
                 "kernel_size": 4, "dropout": 0.0},
    "classifier": {"type": "global", "dropout": 0.0},
}


def build_trainer(lr=3e-3, cmvn_file=None):
    conf = dict(MODEL_CONF)
    if cmvn_file:
        conf["cmvn"] = {"cmvn_file": cmvn_file, "norm_var": True}
    model = init_model(conf)
    pipe = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=True)
    cv_pipe = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=False)
    return Trainer(
        model, pipe, cv_pipe, "ce", learning_rate=lr, grad_clip=5.0
    )


class TestEndToEnd:
    def test_ce_training_learns_tones(self, tone_corpus):
        data_list, cmvn = tone_corpus
        mesh = make_mesh(8)
        trainer = build_trainer(cmvn_file=cmvn)
        executor = Executor(trainer, mesh, log_interval=10)

        ds = init_dataset(data_list, DATASET_CONF, split="train",
                          rank=0, world_size=1)
        first = next(iter(ds))
        state = trainer.init_state(jax.random.PRNGKey(0), first)
        rng = jax.random.PRNGKey(1)

        cv0 = executor.cv(state, ds, 0)
        for epoch in range(4):
            ds.set_epoch(epoch)
            state, summary = executor.train(state, ds, rng, 3e-3, epoch)
        cv1 = executor.cv(state, ds, 1)
        assert cv1["cv_loss"] < cv0["cv_loss"] * 0.7
        assert cv1["cv_acc"] > 0.8
        assert summary["audio_seconds_per_s"] > 0

    def test_cv_exact_under_padding(self, tone_corpus):
        """CV with a remainder batch (not divisible by 8 devices) must
        count every utterance exactly once."""
        data_list, cmvn = tone_corpus
        mesh = make_mesh(8)
        trainer = build_trainer(cmvn_file=cmvn)
        conf = dict(DATASET_CONF)
        conf["batch_conf"] = {"batch_size": 13, "bucket_samples": 8000}
        conf["shuffle"] = False
        ds = init_dataset(data_list, conf, split="cv", rank=0, world_size=1)
        first = next(iter(ds))
        state = trainer.init_state(jax.random.PRNGKey(0), first)
        result = trainer and Executor(trainer, mesh).cv(state, ds, 0)
        assert result["utts"] == 48

    def test_max_pooling_training_runs(self, tone_corpus):
        """Wake-word path: sigmoid DS-TCN + max-pooling loss."""
        data_list, cmvn = tone_corpus
        mesh = make_mesh(8)
        model_conf = {
            "input_dim": 40, "output_dim": 1, "hidden_dim": 32,
            "preprocessing": {"type": "linear"},
            "backbone": {"type": "tcn", "ds": True, "num_layers": 2,
                         "kernel_size": 4, "dropout": 0.0},
            "cmvn": {"cmvn_file": cmvn, "norm_var": True},
        }
        model = init_model(model_conf)
        pipe = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=True)
        cvp = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=False)
        trainer = Trainer(model, pipe, cvp, "max_pooling",
                          learning_rate=1e-3, min_duration=5)
        executor = Executor(trainer, mesh)

        conf = dict(DATASET_CONF)
        ds = init_dataset(data_list, conf, split="train",
                          rank=0, world_size=1)
        # remap labels: class 0 -> keyword 0, others -> filler (-1)
        state = None
        rng = jax.random.PRNGKey(2)
        losses = []
        for epoch in range(2):
            ds.set_epoch(epoch)
            for batch in ds:
                batch["target"] = np.where(
                    batch["target"] == 0, 0, -1
                ).astype(np.int32)
                if state is None:
                    state = trainer.init_state(jax.random.PRNGKey(3), batch)
                db = executor._prepare(batch)
                state, m = trainer.train_step(state, db, rng, 1e-3)
                losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_ctc_training_runs(self, tone_corpus):
        """CTC path smoke: token-sequence labels, loss finite+decreasing."""
        mesh = make_mesh(8)
        model_conf = {
            "input_dim": 40, "output_dim": 5, "hidden_dim": 32,
            "preprocessing": {"type": "linear"},
            "backbone": {"type": "gru", "num_layers": 1},
            "classifier": {"type": "element", "dropout": 0.0},
            "activation": {"type": "identity"},
        }
        model = init_model(model_conf)
        pipe = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=True)
        cvp = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=False)
        trainer = Trainer(model, pipe, cvp, "ctc", learning_rate=3e-3)
        executor = Executor(trainer, mesh)
        ds = init_dataset(tone_corpus[0], DATASET_CONF, split="train",
                          rank=0, world_size=1)
        rng = jax.random.PRNGKey(4)
        state = None
        losses = []
        for epoch in range(2):
            ds.set_epoch(epoch)
            for batch in ds:
                # token sequence label per class
                seqs = {0: [1, 2], 1: [3], 2: [4, 2]}
                tgt = np.full((len(batch["target"]), 2), -1, np.int32)
                tlen = np.zeros(len(batch["target"]), np.int32)
                for i, c in enumerate(batch["target"]):
                    s = seqs[int(c)]
                    tgt[i, : len(s)] = s
                    tlen[i] = len(s)
                batch["target"] = tgt
                batch["target_lengths"] = tlen
                if state is None:
                    state = trainer.init_state(jax.random.PRNGKey(5), batch)
                db = executor._prepare(batch)
                state, m = trainer.train_step(state, db, rng, 3e-3)
                losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        trainer = build_trainer()
        batch = {
            "waves": np.random.default_rng(0)
            .standard_normal((8, 8000)).astype(np.float32),
            "wave_lengths": np.full(8, 8000, np.int32),
            "target": np.zeros(8, np.int32),
            "target_lengths": np.ones(8, np.int32),
        }
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        path = str(tmp_path / "0.ckpt")
        save_checkpoint(path, state.params, state.batch_stats,
                        {"epoch": 0, "lr": 1e-3, "cv_loss": 2.0})
        template = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }
        params, stats = load_checkpoint(path, template)
        for a, b in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_average(self, tmp_path):
        for epoch, loss in [(0, 3.0), (1, 1.0), (2, 2.0), (3, 0.5)]:
            save_checkpoint(
                str(tmp_path / f"{epoch}.ckpt"),
                {"w": np.full((2,), float(epoch), np.float32)},
                {},
                {"epoch": epoch, "lr": 1e-3, "cv_loss": loss},
            )
        picked = average_checkpoints(
            str(tmp_path), str(tmp_path / "avg.ckpt"), 2, val_best=True
        )
        assert len(picked) == 2  # epochs 3 (0.5) and 1 (1.0)
        params, _ = load_checkpoint(str(tmp_path / "avg.ckpt"))
        np.testing.assert_allclose(params["w"], [2.0, 2.0])


class TestScheduler:
    def test_reduce_on_plateau(self):
        sched = ReduceLROnPlateau(1e-3, factor=0.5, patience=2)
        lrs = [sched.step(1.0) for _ in range(7)]
        # first step sets best; then 2 bad epochs tolerated, 3rd reduces
        assert lrs[0] == 1e-3
        assert lrs[3] == 5e-4
        assert lrs[6] == 2.5e-4
        assert sched.step(0.5) == 2.5e-4  # improvement: no reduction
        for _ in range(10):
            sched.step(10.0)
        assert sched.lr >= 1e-6
