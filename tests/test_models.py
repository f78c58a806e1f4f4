"""Model zoo tests: shapes, streaming equivalence, factory parity.

The load-bearing property is *streaming equivalence*: a chunked forward
pass that round-trips the cache must be numerically identical to the
full-utterance forward (the reference implies this property in its
__main__ smoke tests, e.g. /root/reference/wekws/model/mdtc.py:279-295;
we make it a real test).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wekws_tpu.models import (
    FSMN,
    GRU,
    MDTC,
    TCN,
    KWSModel,
    init_model,
)
from wekws_tpu.models.cache import cache_shape, concat_cache, split_cache


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def make_backbone(kind):
    if kind == "tcn":
        return TCN(num_layers=4, channel=64, kernel_size=8, ds=False)
    if kind == "ds_tcn":
        return TCN(num_layers=4, channel=64, kernel_size=8, ds=True)
    if kind == "mdtc":
        return MDTC(
            stack_num=3, stack_size=4, in_channels=64, res_channels=64,
            kernel_size=5,
        )
    if kind == "fsmn":
        return FSMN(
            input_affine_dim=140, fsmn_layers=4, linear_dim=250, proj_dim=128,
            lorder=10, rorder=2, lstride=1, rstride=1,
            output_affine_dim=140, output_dim=8,
        )
    if kind == "gru":
        return GRU(hidden_dim=64, num_layers=2)
    raise ValueError(kind)


BACKBONES = ["tcn", "ds_tcn", "mdtc", "fsmn", "gru"]


class TestBackbones:
    @pytest.mark.parametrize("kind", BACKBONES)
    def test_forward_shapes(self, kind):
        model = make_backbone(kind)
        x = rand(0, 2, 40, 64 if kind != "fsmn" else 400)
        if kind == "fsmn":
            x = rand(0, 2, 40, 400)
        variables = model.init(jax.random.PRNGKey(1), x)
        y, cache = model.apply(variables, x)
        assert y.shape[0] == 2 and y.shape[1] == 40
        # default (None) cache equals the zero init_cache
        y2, _ = model.apply(variables, x, model.init_cache(2))
        np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-6)

    @pytest.mark.parametrize("kind", BACKBONES)
    def test_streaming_equivalence(self, kind):
        model = make_backbone(kind)
        b, t, d = 2, 60, (400 if kind == "fsmn" else 64)
        x = rand(2, b, t, d) * 0.5
        variables = model.init(jax.random.PRNGKey(3), x)

        full, _ = model.apply(variables, x)

        chunk = 12
        cache = model.init_cache(b)
        outs = []
        for s in range(0, t, chunk):
            y, cache = model.apply(variables, x[:, s : s + chunk, :], cache)
            outs.append(y)
        streamed = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(streamed), atol=1e-4, rtol=1e-4
        )

    @pytest.mark.parametrize("kind", ["tcn", "mdtc", "fsmn"])
    def test_cache_pack_roundtrip(self, kind):
        model = make_backbone(kind)
        cache = model.init_cache(3)
        packed = concat_cache(cache)
        paddings = [c.shape[1] for c in cache]
        unpacked = split_cache(packed, paddings)
        assert len(unpacked) == len(cache)
        for a, b_ in zip(cache, unpacked):
            assert a.shape == b_.shape
        frames, dim = cache_shape(cache)
        assert frames == sum(paddings)

    def test_tcn_receptive_field(self):
        tcn = TCN(num_layers=4, channel=64, kernel_size=8)
        # sum of (k-1)*2^i = 7 * (1+2+4+8) = 105
        assert tcn.padding == 105

    def test_mdtc_receptive_field(self):
        mdtc = MDTC(
            stack_num=4, stack_size=4, in_channels=64, res_channels=64,
            kernel_size=5,
        )
        # preprocessor 4 + 4 stacks * 4*(1+2+4+8) = 4 + 240
        assert mdtc.padding == 4 + 4 * 4 * 15

    def test_mdtc_remat_is_numerically_identical(self):
        """remat=True recomputes block internals in the backward but
        must give bit-identical outputs and matching gradients."""
        kw = dict(
            stack_num=2, stack_size=2, in_channels=16, res_channels=16,
            kernel_size=5,
        )
        x = rand(7, 2, 40, 16)
        base = MDTC(**kw)
        variables = base.init(jax.random.PRNGKey(8), x, train=True)
        rem = MDTC(**kw, remat=True)

        def loss(model, v):
            def f(params):
                (y, _), _ = model.apply(
                    {"params": params,
                     "batch_stats": v["batch_stats"]},
                    x, train=True, mutable=["batch_stats"],
                )
                return jnp.sum(y ** 2)

            return jax.value_and_grad(f)(v["params"])

        l0, g0 = loss(base, variables)
        l1, g1 = loss(rem, variables)
        # remat changes XLA's fusion/scheduling, so float32 round-off
        # can differ in the last ulps; semantics must match
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b_ in zip(
            jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-3, rtol=1e-4
            )

    def test_gru_matches_reference_equations(self):
        """One GRU step equals the torch gate equations computed by hand."""
        model = GRU(hidden_dim=8, num_layers=1)
        x = rand(5, 1, 3, 8)
        variables = model.init(jax.random.PRNGKey(6), x)
        p = variables["params"]["layer_0"]
        w_ih = np.asarray(p["ih"]["kernel"])  # (D, 3H)
        b_ih = np.asarray(p["ih"]["bias"])
        w_hh = np.asarray(p["hh_kernel"])  # (H, 3H)
        b_hh = np.asarray(p["hh_bias"])
        xs = np.asarray(x)[0]
        h = np.zeros(8, np.float32)
        want = []
        for tstep in range(3):
            gi = xs[tstep] @ w_ih + b_ih
            gh = h @ w_hh + b_hh
            xr, xz, xn = np.split(gi, 3)
            hr, hz, hn = np.split(gh, 3)
            r = 1 / (1 + np.exp(-(xr + hr)))
            z = 1 / (1 + np.exp(-(xz + hz)))
            n = np.tanh(xn + r * hn)
            h = (1 - z) * n + z * h
            want.append(h.copy())
        got, _ = model.apply(variables, x)
        np.testing.assert_allclose(
            np.asarray(got)[0], np.stack(want), atol=1e-5
        )


def model_configs():
    return {
        "ds_tcn_sigmoid": {
            "input_dim": 40, "output_dim": 1, "hidden_dim": 64,
            "preprocessing": {"type": "linear"},
            "backbone": {"type": "tcn", "ds": True, "num_layers": 4,
                         "kernel_size": 8, "dropout": 0.1},
        },
        "mdtc_global": {
            "input_dim": 40, "output_dim": 12, "hidden_dim": 64,
            "preprocessing": {"type": "linear"},
            "backbone": {"type": "mdtc", "num_stack": 4, "stack_size": 4,
                         "kernel_size": 5, "hidden_dim": 64, "causal": True},
            "classifier": {"type": "global", "dropout": 0.1},
        },
        "fsmn_ctc": {
            "input_dim": 400, "output_dim": 9, "hidden_dim": 128,
            "preprocessing": {"type": "none"},
            "backbone": {"type": "fsmn", "input_affine_dim": 140,
                         "num_layers": 4, "linear_dim": 250, "proj_dim": 128,
                         "left_order": 10, "right_order": 2,
                         "left_stride": 1, "right_stride": 1,
                         "output_affine_dim": 140},
            "classifier": {"type": "identity", "dropout": 0.1},
            "activation": {"type": "identity"},
        },
        "gru_sigmoid": {
            "input_dim": 40, "output_dim": 2, "hidden_dim": 128,
            "preprocessing": {"type": "linear"},
            "backbone": {"type": "gru", "num_layers": 2},
        },
    }


class TestKWSModel:
    @pytest.mark.parametrize("name", list(model_configs().keys()))
    def test_factory_forward(self, name):
        cfg = model_configs()[name]
        model = init_model(cfg)
        x = rand(7, 2, 50, cfg["input_dim"])
        lengths = jnp.asarray([50, 30])
        variables = model.init(jax.random.PRNGKey(8), x)
        out, cache = model.apply(variables, x, lengths=lengths)
        assert out.shape[0] == 2
        if name == "ds_tcn_sigmoid":
            assert out.shape == (2, 50, 1)
            assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
        elif name == "mdtc_global":
            assert out.shape == (2, 12)
        elif name == "fsmn_ctc":
            assert out.shape == (2, 50, 9)
        elif name == "gru_sigmoid":
            assert out.shape == (2, 50, 2)

    def test_sigmoid_model_streams(self):
        cfg = model_configs()["ds_tcn_sigmoid"]
        model = init_model(cfg)
        x = rand(9, 1, 40, 40)
        variables = model.init(jax.random.PRNGKey(10), x)
        full, _ = model.apply(variables, x)
        cache = model.init_cache(1)
        outs = []
        for s in range(0, 40, 10):
            y, cache = model.apply(variables, x[:, s : s + 10, :], cache)
            outs.append(y)
        np.testing.assert_allclose(
            np.asarray(full),
            np.asarray(jnp.concatenate(outs, axis=1)),
            atol=1e-5,
        )

    def test_param_count_ballpark(self):
        """DS-TCN hey-snips config is a ~20-30k parameter model."""
        cfg = model_configs()["ds_tcn_sigmoid"]
        model = init_model(cfg)
        x = rand(11, 1, 20, 40)
        variables = model.init(jax.random.PRNGKey(12), x)
        n = sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(variables["params"])
        )
        assert 15_000 < n < 40_000, n

    def test_train_mode_runs_with_dropout_and_bn(self):
        cfg = model_configs()["mdtc_global"]
        model = init_model(cfg)
        x = rand(13, 4, 30, 40)
        variables = model.init(jax.random.PRNGKey(14), x)
        out, _ = model.apply(
            variables,
            x,
            lengths=jnp.asarray([30, 30, 20, 10]),
            train=True,
            rngs={"dropout": jax.random.PRNGKey(15)},
            mutable=["batch_stats"],
        )


class TestFsmnKaldiIO:
    def test_roundtrip_and_forward_parity(self):
        from wekws_tpu.models.fsmn_kaldi import fsmn_from_kaldi, fsmn_to_kaldi

        model = FSMN(
            input_affine_dim=20, fsmn_layers=2, linear_dim=32, proj_dim=16,
            lorder=4, rorder=2, lstride=1, rstride=1,
            output_affine_dim=20, output_dim=7,
        )
        x = rand(20, 2, 30, 24)
        variables = model.init(jax.random.PRNGKey(21), x)
        text = fsmn_to_kaldi(model, jax.device_get(variables["params"]))
        assert text.startswith("<Nnet>") and "<Fsmn>" in text

        restored = fsmn_from_kaldi(model, text)
        want, _ = model.apply(variables, x)
        got, _ = model.apply({"params": restored}, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
        )


def test_cmvn_tiled_for_context_expansion():
    """40-dim stats auto-tile to a 200-dim spliced input (Kaldi Splice
    semantics, utils/cmvn.py:48-93)."""
    mean = np.arange(40, dtype=np.float32)
    istd = np.ones(40, np.float32) * 0.5
    cfg = {
        "input_dim": 200, "output_dim": 3, "hidden_dim": 16,
        "preprocessing": {"type": "none"},
        "backbone": {"type": "fsmn", "input_affine_dim": 16,
                     "num_layers": 1, "linear_dim": 32, "proj_dim": 16,
                     "left_order": 3, "right_order": 1,
                     "left_stride": 1, "right_stride": 1,
                     "output_affine_dim": 16},
        "classifier": {"type": "identity", "dropout": 0.0},
        "activation": {"type": "identity"},
        "cmvn": {"mean": mean, "istd": istd, "norm_var": True},
    }
    model = init_model(cfg)
    assert model.global_cmvn.mean.shape == (200,)
    x = rand(30, 1, 12, 200)
    variables = model.init(jax.random.PRNGKey(31), x)
    out, _ = model.apply(variables, x)
    assert out.shape == (1, 12, 3)


class TestMixedPrecision:
    """model config `dtype: bfloat16` — bf16 conv compute, f32 params,
    f32 outputs (see models/mdtc.py header)."""

    CONF = {
        "input_dim": 40, "output_dim": 2, "hidden_dim": 32,
        "preprocessing": {"type": "linear"},
        "backbone": {"type": "mdtc", "num_stack": 2, "stack_size": 2,
                     "kernel_size": 5, "hidden_dim": 32, "causal": True},
    }

    def test_bf16_close_to_f32_and_f32_artifacts(self):
        from wekws_tpu.models import init_model

        conf = dict(self.CONF, dtype="bfloat16")
        model = init_model(conf)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 50, 40))
        v = model.init(jax.random.PRNGKey(1), x)
        out, _ = model.apply(v, x)
        assert out.dtype == jnp.float32
        assert all(
            leaf.dtype == jnp.float32
            for leaf in jax.tree_util.tree_leaves(v["params"])
        )
        f32_model = init_model(self.CONF)
        want, _ = f32_model.apply(v, x)  # same param tree
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), atol=2e-2
        )

    def test_bf16_streaming_equivalence(self):
        from wekws_tpu.models import init_model

        conf = dict(self.CONF, dtype="bfloat16")
        model = init_model(conf)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 40, 40))
        v = model.init(jax.random.PRNGKey(3), x)
        full, _ = model.apply(v, x)
        cache = model.init_cache(2)
        outs = []
        for s in range(0, 40, 8):
            y, cache = model.apply(v, x[:, s : s + 8], cache=cache)
            outs.append(y)
        streamed = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(
            np.asarray(streamed), np.asarray(full), atol=2e-2
        )

    def test_bf16_train_step_finite(self):
        import optax

        from wekws_tpu.models import init_model

        conf = dict(self.CONF, dtype="bfloat16")
        model = init_model(conf)
        x = jax.random.normal(jax.random.PRNGKey(4), (4, 30, 40))
        v = model.init(jax.random.PRNGKey(5), x)

        def loss_fn(params):
            (out, _), upd = model.apply(
                {"params": params,
                 "batch_stats": v.get("batch_stats", {})},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(6)},
            )
            return jnp.mean(out ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(v["params"])
        assert jnp.isfinite(loss)
        assert jnp.isfinite(optax.global_norm(grads))
        assert all(
            g.dtype == jnp.float32
            for g in jax.tree_util.tree_leaves(grads)
        )

    def test_bf16_fsmn(self):
        """dtype: bfloat16 applies to the FSMN backbone too (review
        finding: it was silently ignored for fsmn/gru)."""
        from wekws_tpu.models import init_model

        conf = {
            "input_dim": 20, "output_dim": 8, "hidden_dim": 40,
            "preprocessing": {"type": "none"},
            "backbone": {"type": "fsmn", "input_affine_dim": 24,
                         "num_layers": 2, "linear_dim": 40,
                         "proj_dim": 16, "left_order": 4,
                         "right_order": 1, "left_stride": 1,
                         "right_stride": 1, "output_affine_dim": 24},
            "classifier": {"type": "identity", "dropout": 0.0},
            "activation": {"type": "identity"},
            "dtype": "bfloat16",
        }
        model = init_model(conf)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 30, 20))
        v = model.init(jax.random.PRNGKey(1), x)
        out, _ = model.apply(v, x)
        assert out.dtype == jnp.float32
        f32_conf = {k: val for k, val in conf.items() if k != "dtype"}
        want, _ = init_model(f32_conf).apply(v, x)
        # raw logits ~ +-7; bf16 through the whole chain (no f32 BN
        # re-anchoring like MDTC) drifts ~1% relative
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), atol=0.12
        )
        # streaming equivalence preserved under bf16
        cache = model.init_cache(2)
        outs = []
        for s in range(0, 30, 10):
            y, cache = model.apply(v, x[:, s : s + 10], cache=cache)
            outs.append(y)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate(outs, axis=1)),
            np.asarray(out), atol=5e-2,
        )


class TestGhostBatchNorm:
    def test_matches_bn_with_one_group(self):
        import jax
        import jax.numpy as jnp
        import flax.linen as nn

        from wekws_tpu.models.layers import GhostBatchNorm

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((8, 12, 6)), jnp.float32)
        gbn = GhostBatchNorm(num_groups=1)
        bn = nn.BatchNorm(use_running_average=False, momentum=0.9,
                          epsilon=1e-5)
        vg = gbn.init(jax.random.PRNGKey(0), x, use_running_average=False)
        vb = bn.init(jax.random.PRNGKey(0), x)
        yg, sg = gbn.apply(vg, x, use_running_average=False,
                           mutable=["batch_stats"])
        yb, sb = bn.apply(vb, x, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(yg), np.asarray(yb), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(sg["batch_stats"]["mean"]),
            np.asarray(sb["batch_stats"]["mean"]), atol=1e-6,
        )

    def test_groups_normalize_independently(self):
        import jax
        import jax.numpy as jnp

        from wekws_tpu.models.layers import GhostBatchNorm

        rng = np.random.default_rng(1)
        # two groups with wildly different scales: ghost BN normalizes
        # each to ~unit variance, global BN would not
        a = rng.standard_normal((4, 10, 3)) * 0.1
        b = rng.standard_normal((4, 10, 3)) * 10.0
        x = jnp.asarray(np.concatenate([a, b]), jnp.float32)
        gbn = GhostBatchNorm(num_groups=2)
        v = gbn.init(jax.random.PRNGKey(0), x, use_running_average=False)
        y, _ = gbn.apply(v, x, use_running_average=False,
                         mutable=["batch_stats"])
        y = np.asarray(y)
        assert abs(y[:4].std() - 1.0) < 0.05
        assert abs(y[4:].std() - 1.0) < 0.05

    def test_eval_uses_running_stats_and_indivisible_fallback(self):
        import jax
        import jax.numpy as jnp

        from wekws_tpu.models.layers import GhostBatchNorm

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((6, 5, 4)), jnp.float32)
        gbn = GhostBatchNorm(num_groups=4)  # 6 % 4 != 0 -> global stats
        v = gbn.init(jax.random.PRNGKey(0), x, use_running_average=False)
        y, s = gbn.apply(v, x, use_running_average=False,
                         mutable=["batch_stats"])
        assert bool(jnp.isfinite(y).all())
        ye = gbn.apply(
            {"params": v["params"],
             "batch_stats": s["batch_stats"]},
            x, use_running_average=True,
        )
        assert bool(jnp.isfinite(ye).all())

    def test_mdtc_with_ghost_bn_trains_and_streams(self):
        import jax
        import jax.numpy as jnp

        from wekws_tpu.models import init_model

        conf = {
            "input_dim": 10, "output_dim": 1, "hidden_dim": 8,
            "preprocessing": {"type": "linear"},
            "backbone": {"type": "mdtc", "num_stack": 1, "stack_size": 2,
                         "kernel_size": 3, "hidden_dim": 8,
                         "causal": True, "ghost_bn": 2},
        }
        model = init_model(conf)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((4, 20, 10)),
            jnp.float32,
        )
        v = model.init(jax.random.PRNGKey(0), x)
        # train step updates ghost batch_stats
        (y, _), updates = model.apply(
            v, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert bool(jnp.isfinite(y).all())
        # eval: chunked-with-cache == full (running stats, cache API
        # unchanged by the knob)
        v2 = {"params": v["params"],
              "batch_stats": updates["batch_stats"]}
        full, _ = model.apply(v2, x)
        cache = model.init_cache(4)
        outs = []
        for s in range(0, 20, 5):
            yc, cache = model.apply(v2, x[:, s:s + 5], cache)
            outs.append(yc)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate(outs, axis=1)), np.asarray(full),
            atol=1e-5,
        )


class TestExactBatchNorm:
    def test_matches_flax_bn_fwd_bwd_stats(self):
        import jax
        import jax.numpy as jnp
        import flax.linen as nn

        from wekws_tpu.models.layers import ExactBatchNorm

        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.standard_normal((8, 12, 6)) * 2 + 1, jnp.float32
        )
        co = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
        params = {
            "scale": jnp.asarray(rng.standard_normal(6) + 1, jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(6), jnp.float32),
        }
        ebn = ExactBatchNorm()
        bn = nn.BatchNorm(use_running_average=False, momentum=0.9,
                          epsilon=1e-5)
        stats0 = ebn.init(
            jax.random.PRNGKey(0), x, use_running_average=False
        )["batch_stats"]

        ye, se = ebn.apply(
            {"params": params, "batch_stats": stats0}, x,
            use_running_average=False, mutable=["batch_stats"],
        )
        yb, sb = bn.apply(
            {"params": params, "batch_stats": stats0}, x,
            mutable=["batch_stats"],
        )
        np.testing.assert_allclose(np.asarray(ye), np.asarray(yb),
                                   atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(se["batch_stats"]["var"]),
            np.asarray(sb["batch_stats"]["var"]), rtol=1e-4,
        )

        def fe(p, x):
            y, _ = ebn.apply(
                {"params": p, "batch_stats": stats0}, x,
                use_running_average=False, mutable=["batch_stats"],
            )
            return jnp.sum(y * co)

        def fb(p, x):
            y, _ = bn.apply(
                {"params": p, "batch_stats": stats0}, x,
                mutable=["batch_stats"],
            )
            return jnp.sum(y * co)

        ge = jax.grad(fe, argnums=(0, 1))(params, x)
        gb = jax.grad(fb, argnums=(0, 1))(params, x)
        np.testing.assert_allclose(np.asarray(ge[1]), np.asarray(gb[1]),
                                   atol=1e-4, rtol=1e-4)
        for k in ("scale", "bias"):
            np.testing.assert_allclose(
                np.asarray(ge[0][k]), np.asarray(gb[0][k]),
                atol=1e-4, rtol=1e-4,
            )
        # eval mode uses the updated running stats identically
        ye2 = ebn.apply(
            {"params": params, "batch_stats": se["batch_stats"]}, x,
            use_running_average=True,
        )
        yb2 = nn.BatchNorm(
            use_running_average=True, momentum=0.9, epsilon=1e-5
        ).apply({"params": params, "batch_stats": sb["batch_stats"]}, x)
        np.testing.assert_allclose(np.asarray(ye2), np.asarray(yb2),
                                   atol=1e-5)

    def test_model_grads_match_with_exact_bn(self):
        import jax
        import jax.numpy as jnp

        from wekws_tpu.models import init_model, layers

        conf = {
            "input_dim": 10, "output_dim": 1, "hidden_dim": 8,
            "preprocessing": {"type": "linear"},
            "backbone": {"type": "mdtc", "num_stack": 1, "stack_size": 2,
                         "kernel_size": 3, "hidden_dim": 8, "causal": True},
        }
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((4, 20, 10)),
            jnp.float32,
        )

        def grads(exact):
            old = layers.BATCH_NORM_EXACT
            layers.BATCH_NORM_EXACT = exact
            try:
                model = init_model(conf)
                v = model.init(jax.random.PRNGKey(0), x)

                def loss(p):
                    (y, _), _ = model.apply(
                        {"params": p, "batch_stats": v["batch_stats"]},
                        x, train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.PRNGKey(1)},
                    )
                    return jnp.sum(y ** 2)

                return jax.grad(loss)(v["params"])
            finally:
                layers.BATCH_NORM_EXACT = old

        ga = grads(False)
        gb = grads(True)
        flat_a = jax.tree_util.tree_leaves(ga)
        flat_b = jax.tree_util.tree_leaves(gb)
        for a, b_ in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-3
            )

    def test_bf16_input_promotes_to_f32_like_flax(self):
        import jax
        import jax.numpy as jnp
        import flax.linen as nn

        from wekws_tpu.models.layers import ExactBatchNorm

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((4, 10, 6)), jnp.bfloat16)
        params = {"scale": jnp.ones(6), "bias": jnp.zeros(6)}
        ebn = ExactBatchNorm()
        stats0 = ebn.init(
            jax.random.PRNGKey(0), x, use_running_average=False
        )["batch_stats"]
        ye, se = ebn.apply(
            {"params": params, "batch_stats": stats0}, x,
            use_running_average=False, mutable=["batch_stats"],
        )
        yb, _ = nn.BatchNorm(
            use_running_average=False, momentum=0.9, epsilon=1e-5
        ).apply({"params": params, "batch_stats": stats0}, x,
                mutable=["batch_stats"])
        # f32 output (the mixed-precision contract: BN promotes, convs
        # re-cast down) and agreement with flax on bf16 inputs
        assert ye.dtype == jnp.float32
        assert yb.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(ye), np.asarray(yb), atol=2e-2
        )
        # dx cotangent keeps the input dtype
        g = jax.grad(lambda xx: ebn.apply(
            {"params": params, "batch_stats": stats0}, xx,
            use_running_average=False, mutable=["batch_stats"],
        )[0].sum())(x)
        assert g.dtype == jnp.bfloat16
