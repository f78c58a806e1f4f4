"""Length-bucketed lockstep batching (multi-host efficiency path).

The contract under test: with ``batch_conf.bucket_boundaries`` set,
every process emits the SAME deterministic sequence of batch shapes
(the epoch-seeded schedule) and the SAME number of batches, regardless
of how its local shard's lengths are distributed — the requirement for
multi-host SPMD lockstep — while padding each utterance only to its
bucket boundary instead of the global cap.
"""

import json

import numpy as np
import pytest

from wekws_tpu.data import processor
from wekws_tpu.data.dataset import init_dataset
from wekws_tpu.data.loader import DataLoader
from tests.test_data import write_tone


def make_samples(lengths, label=0):
    return [
        {"key": f"s{i}", "wav": np.ones(n, np.float32), "label": label,
         "sample_rate": 16000}
        for i, n in enumerate(lengths)
    ]


@pytest.fixture
def corpus(tmp_path):
    """20 wavs with a bimodal length distribution + durations."""
    lines = []
    for i in range(20):
        n = 13000 + 500 * (i % 4) if i % 2 else 27000 + 500 * (i % 4)
        p = tmp_path / f"u{i}.wav"
        write_tone(str(p), 300 + 20 * i, n)
        lines.append(json.dumps({
            "key": f"u{i}", "txt": str(i % 3), "wav": str(p),
            "duration": n / 16000.0,
        }))
    lst = tmp_path / "data.list"
    lst.write_text("\n".join(lines))
    return str(lst)


BASE_CONF = {
    "filter_conf": {"max_length": 2048, "min_length": 0},
    "resample_conf": {"resample_rate": 16000},
    "shuffle": False,
    "batch_conf": {
        "batch_size": 4,
        "bucket_boundaries": [16000, 32000],
    },
}


class TestBucketBatchStage:
    def test_shapes_follow_schedule(self):
        data = make_samples([100, 200, 15999, 16000, 20000, 30000] * 4)
        schedule = [0, 1, 0, 1, 1]
        batches = list(processor.bucket_batch(
            data, batch_size=4, bucket_boundaries=[16000, 32000],
            schedule=schedule,
        ))
        assert len(batches) == len(schedule)
        for b, batch in zip(schedule, batches):
            assert batch["waves"].shape == (4, [16000, 32000][b])
            assert batch["valid"].shape == (4,)

    def test_drops_overlong(self):
        data = make_samples([8000, 40000, 8000, 8000, 8000])
        batches = list(processor.bucket_batch(
            data, batch_size=4, bucket_boundaries=[16000, 32000],
            schedule=[0],
        ))
        assert "s1" not in batches[0]["keys"]

    def test_duplicate_fill_when_bucket_short(self):
        # only short samples exist but the schedule demands a long batch
        data = make_samples([8000] * 8)
        batches = list(processor.bucket_batch(
            data, batch_size=4, bucket_boundaries=[16000, 32000],
            schedule=[0, 1], fill="duplicate",
        ))
        long_b = batches[1]
        assert long_b["waves"].shape == (4, 32000)
        # filled with real (duplicate or shorter-bucket) samples
        assert long_b["valid"].sum() == 4

    def test_invalid_fill_for_cv(self):
        data = make_samples([8000] * 4)
        batches = list(processor.bucket_batch(
            data, batch_size=4, bucket_boundaries=[16000, 32000],
            schedule=[0, 0], fill="invalid",
        ))
        assert batches[0]["valid"].sum() == 4
        assert batches[1]["valid"].sum() == 0  # stream exhausted
        assert np.all(batches[1]["waves"] == 0)

    def test_token_labels_fixed_width(self):
        data = [
            {"key": f"s{i}", "wav": np.ones(8000, np.float32),
             "label": [1, 2, 3][: 1 + i % 3], "sample_rate": 16000}
            for i in range(8)
        ]
        batches = list(processor.bucket_batch(
            data, batch_size=4, bucket_boundaries=[16000],
            schedule=[0, 0, 0], fill="invalid", max_label_len=7,
        ))
        for b in batches:
            assert b["target"].shape == (4, 7)


class TestDatasetBucketing:
    def test_lockstep_across_ranks(self, corpus):
        """Both ranks emit identical shape sequences and counts."""
        seqs = []
        for rank in range(2):
            ds = init_dataset(corpus, BASE_CONF, split="train",
                              rank=rank, world_size=2)
            ds.set_epoch(3)
            seqs.append([
                (b["waves"].shape, b["target"].shape) for b in ds
            ])
        assert seqs[0] == seqs[1]
        assert len(seqs[0]) > 0

    def test_epoch_changes_schedule_deterministically(self, corpus):
        ds = init_dataset(corpus, BASE_CONF, split="train",
                          rank=0, world_size=1)
        s1 = ds.make_bucket_schedule(1)
        s1b = ds.make_bucket_schedule(1)
        s2 = ds.make_bucket_schedule(2)
        assert s1 == s1b
        assert s1 != s2  # overwhelmingly likely with >10 slots

    def test_weights_follow_durations(self, corpus):
        ds = init_dataset(corpus, BASE_CONF, split="train",
                          rank=0, world_size=1)
        w = ds.bucket_weights()
        # corpus is bimodal: half short, half long
        assert len(w) == 2
        assert w[0] == pytest.approx(10)
        assert w[1] == pytest.approx(10)

    def test_padding_waste_reduced_vs_fixed(self, corpus):
        def waste(conf):
            ds = init_dataset(corpus, conf, split="train",
                              rank=0, world_size=1)
            padded = real = 0
            for b in ds:
                padded += b["waves"].shape[0] * b["waves"].shape[1]
                real += int(b["wave_lengths"] @ b["valid"].astype(np.int64))
            return padded / max(real, 1)

        fixed_conf = {**BASE_CONF, "batch_conf": {
            "batch_size": 4, "fixed_samples": 32000}}
        assert waste(BASE_CONF) < waste(fixed_conf) * 0.8

    def test_cv_split_uses_invalid_fill(self, corpus):
        ds = init_dataset(corpus, BASE_CONF, split="cv",
                          rank=0, world_size=1)
        batches = list(ds)
        total_valid = sum(int(b["valid"].sum()) for b in batches)
        # every real utterance appears exactly once (no duplicates)
        assert total_valid == 20
        keys = [k for b in batches for k, v in zip(b["keys"], b["valid"])
                if v > 0]
        assert len(set(keys)) == 20

    def test_ordered_worker_merge_lockstep_across_ranks(self, corpus):
        """With loader workers, the rank-level shape sequence is the
        round-robin interleave of per-worker schedules — identical on
        every rank running the same num_workers (the lockstep
        contract).  A GLOBAL schedule sliced [w::W] would instead
        strand samples in workers owning no slot for their bucket."""
        seqs = []
        for rank in range(2):
            ds = init_dataset(corpus, BASE_CONF, split="train",
                              rank=rank, world_size=2)
            loader = DataLoader(ds, num_workers=2)
            loader.set_epoch(1)
            try:
                seqs.append([b["waves"].shape for b in loader])
            finally:
                loader.close()
        assert seqs[0] == seqs[1]
        assert len(seqs[0]) > 0

    def test_worker_sharded_cv_exact_coverage(self, corpus):
        """Every cv utterance reaches a slot in its own worker (the
        round-1 global-schedule slicing could strand samples whose
        bucket had no slot in their worker)."""
        ds = init_dataset(corpus, BASE_CONF, split="cv",
                          rank=0, world_size=1)
        loader = DataLoader(ds, num_workers=2)
        loader.set_epoch(0)
        try:
            keys = [
                k
                for b in loader
                for k, v in zip(b["keys"], b["valid"])
                if v > 0
            ]
        finally:
            loader.close()
        assert sorted(keys) == sorted(f"u{i}" for i in range(20))


def test_masked_train_criterion_ignores_fill_rows():
    """Gradient/loss with invalid fill rows == without them."""
    import jax
    import jax.numpy as jnp

    from wekws_tpu.losses import criterion

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.rand(6, 30, 3).astype(np.float32))
    target = jnp.asarray([0, 1, -1, 2, 0, 1])
    lengths = jnp.asarray([30, 25, 30, 20, 30, 30])
    valid = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)

    loss_m, acc_m = criterion(
        "max_pooling", logits, target, lengths, valid=valid
    )
    loss_ref, acc_ref = criterion(
        "max_pooling", logits[:4], target[:4], lengths[:4]
    )
    np.testing.assert_allclose(loss_m, loss_ref, rtol=1e-6)
    np.testing.assert_allclose(acc_m, acc_ref, rtol=1e-6)
