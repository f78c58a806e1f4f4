"""Fused TCNBlock training kernel (ops/fused_mdtc_train.py): forward,
batch stats and ALL gradients must match the unfused exact-BN block.

The unfused reference here is a plain jnp composition of the same math
(depthwise conv -> BN(batch stats) -> pointwise -> BN -> relu ->
pointwise -> BN -> +x -> relu) differentiated by jax autodiff — the
same semantics as models/mdtc.TCNBlock with ExactBatchNorm (whose
gradient parity vs flax BN is pinned in test_models.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wekws_tpu.ops.fused_mdtc_train import fused_tcn_block_train

C = 8
K = 3


def make_params(rng, c=C, k=K):
    def r(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32) * 0.3

    return {
        "dw_kernel": r(k, 1, c),
        "dw_bias": r(c),
        "bn0_scale": 1.0 + 0.1 * r(c),
        "bn0_bias": 0.1 * r(c),
        "pw1_kernel": r(c, c),
        "pw1_bias": 0.1 * r(c),
        "bn1_scale": 1.0 + 0.1 * r(c),
        "bn1_bias": 0.1 * r(c),
        "pw2_kernel": r(c, c),
        "pw2_bias": 0.1 * r(c),
        "bn2_scale": 1.0 + 0.1 * r(c),
        "bn2_bias": 0.1 * r(c),
    }


def ref_block(x, p, k=K, dilation=1, eps=1e-5):
    """Unfused reference with exact batch-stats BN."""
    pad = (k - 1) * dilation
    xf = x.astype(jnp.float32)
    xp = jnp.pad(xf, ((0, 0), (pad, 0), (0, 0)))
    u = None
    t = x.shape[1]
    for tap in range(k):
        off = pad - (k - 1 - tap) * dilation
        term = (
            jax.lax.dynamic_slice_in_dim(xp, off, t, axis=1)
            * p["dw_kernel"][tap, 0, :]
        )
        u = term if u is None else u + term
    u = u + p["dw_bias"]

    def bn(z, scale, bias):
        mu = jnp.mean(z, axis=(0, 1))
        var = jnp.mean(jnp.square(z), axis=(0, 1)) - mu * mu
        zhat = (z - mu) * jax.lax.rsqrt(var + eps)
        return zhat * scale + bias, mu, var

    s0, mu0, var0 = bn(u, p["bn0_scale"], p["bn0_bias"])
    v = jnp.einsum("btc,cd->btd", s0, p["pw1_kernel"]) + p["pw1_bias"]
    s1, mu1, var1 = bn(v, p["bn1_scale"], p["bn1_bias"])
    r = jax.nn.relu(s1)
    w = jnp.einsum("btc,cd->btd", r, p["pw2_kernel"]) + p["pw2_bias"]
    s2, mu2, var2 = bn(w, p["bn2_scale"], p["bn2_bias"])
    y = jax.nn.relu(s2 + xf)
    stats = dict(mu0=mu0, var0=var0, mu1=mu1, var1=var1,
                 mu2=mu2, var2=var2)
    return y, stats


@pytest.mark.parametrize("dilation", [1, 2, 4])
def test_forward_and_stats_parity(dilation):
    rng = np.random.default_rng(0)
    p = make_params(rng)
    x = jnp.asarray(rng.standard_normal((4, 24, C)), jnp.float32)
    y_ref, stats_ref = ref_block(x, p, dilation=dilation)
    y, stats = fused_tcn_block_train(x, p, K, dilation, 1e-5, 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-2, atol=2e-2)
    for key in stats_ref:
        np.testing.assert_allclose(
            np.asarray(stats[key]), np.asarray(stats_ref[key]),
            rtol=2e-2, atol=2e-2, err_msg=key,
        )


def test_gradient_parity():
    rng = np.random.default_rng(1)
    p = make_params(rng)
    x = jnp.asarray(rng.standard_normal((4, 24, C)), jnp.float32)

    def loss_ref(x, p):
        y, _ = ref_block(x, p, dilation=2)
        return jnp.sum(y * jnp.cos(0.1 * y))

    def loss_fused(x, p):
        y, _ = fused_tcn_block_train(x, p, K, 2, 1e-5, 2)
        return jnp.sum(y * jnp.cos(0.1 * y))

    (dx_ref, dp_ref) = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    (dx, dp) = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=5e-2, atol=5e-2)
    for key in dp_ref:
        np.testing.assert_allclose(
            np.asarray(dp[key]), np.asarray(dp_ref[key]),
            rtol=5e-2, atol=5e-2, err_msg=key,
        )


def test_model_level_fused_path():
    """Whole MDTC model with backbone.fused_train: identical variable
    tree to the unfused model, loss/grads close (f32), running stats
    updated, and a full Trainer step runs."""
    from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline
    from wekws_tpu.models import init_model
    from wekws_tpu.parallel import make_mesh, shard_batch
    from wekws_tpu.train import Trainer

    conf = {
        "input_dim": 40, "output_dim": 1, "hidden_dim": 16,
        "preprocessing": {"type": "linear"},
        "backbone": {"type": "mdtc", "num_stack": 2, "stack_size": 2,
                     "kernel_size": 3, "hidden_dim": 16, "causal": True},
    }
    dconf = {
        "feats_type": "fbank",
        "fbank_conf": {"num_mel_bins": 40, "frame_shift": 10,
                       "frame_length": 25, "dither": 0.0},
    }
    fused_conf = dict(conf)
    fused_conf["backbone"] = dict(conf["backbone"], fused_train=True)

    model = init_model(conf)
    fused = init_model(fused_conf)
    rng = np.random.default_rng(3)
    b, s = 8, 8000
    batch = {
        "waves": (rng.standard_normal((b, s)) * 1000).astype(np.float32),
        "wave_lengths": np.full((b,), s, np.int32),
        "target": (np.arange(b) % 2 - 1).astype(np.int32),
        "target_lengths": np.ones((b,), np.int32),
    }
    pipe = DeviceFeaturePipeline.from_conf(dconf, training=True)
    cvp = DeviceFeaturePipeline.from_conf(dconf, training=False)
    feats, lengths = cvp(jnp.asarray(batch["waves"]),
                         jnp.asarray(batch["wave_lengths"]))

    v_ref = model.init(jax.random.PRNGKey(0), feats, lengths=lengths)
    v_fused = fused.init(jax.random.PRNGKey(0), feats, lengths=lengths)
    # identical trees AND identical init values (same param paths ->
    # same RNG draws)
    ref_leaves = jax.tree_util.tree_leaves_with_path(v_ref)
    fused_leaves = jax.tree_util.tree_leaves_with_path(v_fused)
    assert [p for p, _ in ref_leaves] == [p for p, _ in fused_leaves]
    for (path, a), (_, bb) in zip(ref_leaves, fused_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   err_msg=str(path))

    # train-mode apply: fused runs its kernels, matches the unfused
    # forward closely (f32) and updates batch_stats
    def run(m, v):
        (logits, _), updates = m.apply(
            v, feats, lengths=lengths, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        return logits, updates["batch_stats"]

    lr_ref, bs_ref = run(model, v_ref)
    lr_fused, bs_fused = run(fused, v_fused)
    np.testing.assert_allclose(np.asarray(lr_fused), np.asarray(lr_ref),
                               rtol=2e-3, atol=2e-3)
    for (path, a), (_, bb) in zip(
        jax.tree_util.tree_leaves_with_path(bs_ref),
        jax.tree_util.tree_leaves_with_path(bs_fused),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=1e-3, atol=1e-3,
            err_msg=str(path),
        )

    # full Trainer step end to end on the fused model
    mesh = make_mesh()
    trainer = Trainer(fused, pipe, cvp, "max_pooling",
                      learning_rate=1e-3, min_duration=2)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, mesh)
    db = shard_batch(batch, mesh)
    key = jax.random.key(2, impl="rbg")
    state, metrics = trainer.train_step(state, db, key, 1e-3)
    assert np.isfinite(float(metrics["loss"]))
