"""Data-parallel correctness on the virtual 8-device mesh.

The DP contract: an 8-way sharded train step produces the same loss
and parameter update as single-device execution (XLA's inserted
all-reduce == the reference's DDP gradient averaging).
"""

import jax
import jax.numpy as jnp
import numpy as np

from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline
from wekws_tpu.models import init_model
from wekws_tpu.parallel import (
    data_sharding,
    make_mesh,
    pad_batch_to_multiple,
    shard_batch,
)
from wekws_tpu.train import Trainer

DATASET_CONF = {
    "feats_type": "fbank",
    "fbank_conf": {"num_mel_bins": 40, "frame_shift": 10,
                   "frame_length": 25, "dither": 0.0},
}
MODEL_CONF = {
    "input_dim": 40, "output_dim": 1, "hidden_dim": 16,
    "preprocessing": {"type": "linear"},
    "backbone": {"type": "tcn", "ds": True, "num_layers": 2,
                 "kernel_size": 4, "dropout": 0.0},
}


def make_batch(b=16):
    rng = np.random.default_rng(0)
    return {
        "waves": (rng.standard_normal((b, 8000)) * 1000).astype(np.float32),
        "wave_lengths": np.full((b,), 8000, np.int32),
        "target": (np.arange(b) % 2 - 1).astype(np.int32),
        "target_lengths": np.ones((b,), np.int32),
    }


def build_trainer():
    model = init_model(MODEL_CONF)
    pipe = DeviceFeaturePipeline.from_conf(DATASET_CONF, True)
    cvp = DeviceFeaturePipeline.from_conf(DATASET_CONF, False)
    return Trainer(model, pipe, cvp, "max_pooling", learning_rate=1e-3)


def test_sharded_matches_single_device():
    """Loss and gradients agree between 1-device and 8-way-sharded
    execution (params are NOT compared after optimizer steps: Adam's
    sign-like early updates amplify reduction-order float noise)."""
    batch = make_batch(16)
    trainer = build_trainer()
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    from wekws_tpu.losses import criterion

    def loss_fn(params, b):
        feats, flens = trainer.cv_pipeline(b["waves"], b["wave_lengths"])
        logits, _ = trainer.model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            feats, lengths=flens,
        )
        loss, _ = criterion("max_pooling", logits, b["target"], flens)
        return loss

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    mesh8 = make_mesh(8)
    db8 = shard_batch(batch, mesh8)
    db1 = {k: jnp.asarray(v) for k, v in batch.items()
           if isinstance(v, np.ndarray)}

    l1, g1 = grad_fn(state.params, db1)
    l8, g8 = grad_fn(state.params, db8)
    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(g1)),
        jax.tree_util.tree_leaves(jax.device_get(g8)),
    ):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-3)


def test_batch_is_actually_sharded():
    mesh = make_mesh(8)
    batch = shard_batch(make_batch(16), mesh)
    sharding = batch["waves"].sharding
    assert sharding.is_equivalent_to(
        data_sharding(mesh), batch["waves"].ndim
    )
    # each device holds 2 of 16 rows
    shard_shapes = {s.data.shape for s in batch["waves"].addressable_shards}
    assert shard_shapes == {(2, 8000)}


def test_pad_batch_to_multiple():
    batch = make_batch(13)
    batch["keys"] = [f"u{i}" for i in range(13)]
    padded = pad_batch_to_multiple(batch, 8)
    assert padded["waves"].shape[0] == 16
    assert padded["valid"].sum() == 13
    assert list(padded["valid"][:13]) == [1.0] * 13
    assert len(padded["keys"]) == 16
    # padded rows are harmless (nonzero lengths)
    assert padded["wave_lengths"][13:].min() >= 1
