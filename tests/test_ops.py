"""Pallas fused-MDTC kernel parity vs the flax backbone (interpret
mode on CPU; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from wekws_tpu.models.mdtc import MDTC
from wekws_tpu.ops import extract_mdtc_weights, fused_mdtc_forward


@pytest.mark.parametrize("stack_num,stack_size,c", [(2, 3, 64), (4, 4, 32)])
def test_fused_matches_flax(stack_num, stack_size, c):
    model = MDTC(
        stack_num=stack_num, stack_size=stack_size,
        in_channels=c, res_channels=c, kernel_size=5,
    )
    b, t = 2, 48
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, c)) * 0.5
    variables = model.init(jax.random.PRNGKey(1), x)
    # nudge batch_stats so folding is non-trivial
    stats = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        / max(a.size, 1),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    want, _ = model.apply(variables, x)
    want = np.asarray(want)

    weights = extract_mdtc_weights(
        model, variables["params"], variables["batch_stats"]
    )
    dw_w, dw_b, pw1_w, pw1_b, pw2_w, pw2_b, dilations = weights
    with pltpu.force_tpu_interpret_mode():
        got = fused_mdtc_forward(
            x, dw_w, dw_b, pw1_w, pw1_b, pw2_w, pw2_b,
            dilations, 5, stack_size,
        )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_fused_stream_matches_full():
    from wekws_tpu.ops import fused_mdtc_stream, init_stream_cache

    model = MDTC(
        stack_num=2, stack_size=3, in_channels=64, res_channels=64,
        kernel_size=5,
    )
    b, t, c = 2, 48, 64
    x = jax.random.normal(jax.random.PRNGKey(2), (b, t, c)) * 0.5
    variables = model.init(jax.random.PRNGKey(3), x)
    w = extract_mdtc_weights(
        model, variables["params"], variables["batch_stats"]
    )
    dw_w, dw_b, pw1_w, pw1_b, pw2_w, pw2_b, dil = w
    pad_max = 4 * max(dil)
    with pltpu.force_tpu_interpret_mode():
        full = fused_mdtc_forward(
            x, dw_w, dw_b, pw1_w, pw1_b, pw2_w, pw2_b, dil, 5, 3
        )
        cache = init_stream_cache(len(dil), b, pad_max, c)
        outs = []
        for s in range(0, t, 12):
            y, cache = fused_mdtc_stream(
                x[:, s : s + 12, :], cache,
                dw_w, dw_b, pw1_w, pw1_b, pw2_w, pw2_b, dil, 5, 3,
            )
            outs.append(y)
    streamed = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(full), atol=1e-5, rtol=1e-4
    )


def test_fused_serving_forward_matches_model():
    from wekws_tpu.models import init_model
    from wekws_tpu.ops.serving import build_fused_forward

    cfg = {
        "input_dim": 40, "output_dim": 2, "hidden_dim": 32,
        "preprocessing": {"type": "linear"},
        "backbone": {"type": "mdtc", "num_stack": 2, "stack_size": 3,
                     "kernel_size": 5, "hidden_dim": 32, "causal": True},
    }
    model = init_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 40))
    variables = model.init(jax.random.PRNGKey(1), x)
    lengths = jnp.asarray([40, 25])
    want, _ = model.apply(variables, x, lengths=lengths)

    fused = build_fused_forward(model, variables)
    assert fused is not None
    with pltpu.force_tpu_interpret_mode():
        got = fused(x, lengths)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-3
    )


def test_fused_serving_rejects_unsupported():
    from wekws_tpu.models import init_model
    from wekws_tpu.ops.serving import build_fused_forward

    cfg = {
        "input_dim": 40, "output_dim": 2, "hidden_dim": 32,
        "preprocessing": {"type": "linear"},
        "backbone": {"type": "gru", "num_layers": 1},
    }
    model = init_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 10, 40))
    variables = model.init(jax.random.PRNGKey(1), x)
    assert build_fused_forward(model, variables) is None


FSMN_CONF = dict(
    input_affine_dim=24, fsmn_layers=3, linear_dim=40, proj_dim=16,
    lorder=5, rorder=2, lstride=1, rstride=1, output_affine_dim=24,
    output_dim=8,
)


@pytest.mark.parametrize("rorder,lstride", [(2, 1), (0, 1), (2, 2)])
def test_fused_fsmn_matches_flax(rorder, lstride):
    from wekws_tpu.models.fsmn import FSMN
    from wekws_tpu.ops.fused_fsmn import fused_fsmn_forward

    conf = dict(FSMN_CONF, rorder=rorder, lstride=lstride)
    model = FSMN(**conf)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 30, 20))
    variables = model.init(jax.random.PRNGKey(1), x)
    want, _ = model.apply(variables, x)
    with pltpu.force_tpu_interpret_mode():
        got, _ = fused_fsmn_forward(model, variables["params"], x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-3
    )


def test_fused_fsmn_stream_matches_full():
    from wekws_tpu.models.fsmn import FSMN
    from wekws_tpu.ops.fused_fsmn import fused_fsmn_forward

    model = FSMN(**FSMN_CONF)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 20))
    variables = model.init(jax.random.PRNGKey(3), x)
    with pltpu.force_tpu_interpret_mode():
        full, _ = fused_fsmn_forward(model, variables["params"], x)
        cache = None
        outs = []
        for s in range(0, 32, 8):
            y, cache = fused_fsmn_forward(
                model, variables["params"], x[:, s : s + 8], cache
            )
            outs.append(y)
    streamed = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(full), atol=2e-4, rtol=1e-3
    )


def test_fused_serving_forward_matches_model_fsmn():
    from wekws_tpu.models import init_model
    from wekws_tpu.ops.serving import build_fused_forward, build_fused_stream

    cfg = {
        "input_dim": 20, "output_dim": 8, "hidden_dim": 40,
        "preprocessing": {"type": "none"},
        "backbone": {"type": "fsmn", "input_affine_dim": 24,
                     "num_layers": 3, "linear_dim": 40, "proj_dim": 16,
                     "left_order": 5, "right_order": 2, "left_stride": 1,
                     "right_stride": 1, "output_affine_dim": 24},
        "classifier": {"type": "identity", "dropout": 0.0},
        "activation": {"type": "identity"},
    }
    model = init_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 20))
    variables = model.init(jax.random.PRNGKey(1), x)
    lengths = jnp.asarray([32, 32])
    want, _ = model.apply(variables, x, lengths=lengths)

    fused = build_fused_forward(model, variables)
    assert fused is not None
    with pltpu.force_tpu_interpret_mode():
        got = fused(x, lengths)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-3
    )

    # streaming step chunks == full
    built = build_fused_stream(model, variables)
    assert built is not None
    step, init_cache = built
    with pltpu.force_tpu_interpret_mode():
        cache = init_cache(2)
        outs = []
        for s in range(0, 32, 8):
            y, cache = step(x[:, s : s + 8], cache)
            outs.append(y)
    streamed = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(want), atol=5e-4, rtol=1e-3
    )


def test_fused_serving_forward_matches_model_ds_tcn():
    """Fused DS-TCN (hey_snips flagship backbone) serving path: fused
    forward and chunked streaming both match model.apply."""
    from wekws_tpu.models import init_model
    from wekws_tpu.ops.serving import build_fused_forward, build_fused_stream

    cfg = {
        "input_dim": 40, "output_dim": 2, "hidden_dim": 32,
        "preprocessing": {"type": "linear"},
        "backbone": {"type": "tcn", "ds": True, "num_layers": 3,
                     "kernel_size": 8, "dropout": 0.0},
    }
    model = init_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 40))
    variables = model.init(jax.random.PRNGKey(1), x)
    # perturb batch_stats so BN folding is really tested
    stats = jax.tree_util.tree_map(
        lambda a: a + 0.03 * jnp.arange(a.size, dtype=a.dtype)
        .reshape(a.shape) / max(a.size, 1),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    lengths = jnp.asarray([40, 40])
    want, _ = model.apply(variables, x, lengths=lengths)

    fused = build_fused_forward(model, variables)
    assert fused is not None
    with pltpu.force_tpu_interpret_mode():
        got = fused(x, lengths)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-3
    )

    built = build_fused_stream(model, variables)
    assert built is not None
    step, init_cache = built
    with pltpu.force_tpu_interpret_mode():
        cache = init_cache(2)
        outs = []
        for s in range(0, 40, 8):
            y, cache = step(x[:, s : s + 8], cache)
            outs.append(y)
    streamed = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(want), atol=5e-4, rtol=1e-3
    )


def test_fused_serving_full_conv_tcn_falls_back():
    from wekws_tpu.models import init_model
    from wekws_tpu.ops.serving import build_fused_forward

    cfg = {
        "input_dim": 40, "output_dim": 2, "hidden_dim": 32,
        "preprocessing": {"type": "linear"},
        "backbone": {"type": "tcn", "ds": False, "num_layers": 2,
                     "kernel_size": 4, "dropout": 0.0},
    }
    model = init_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 10, 40))
    variables = model.init(jax.random.PRNGKey(1), x)
    assert build_fused_forward(model, variables) is None


# ---------------- fused frontend (ops/fused_frontend.py) ----------------


@pytest.mark.parametrize(
    "ft,extra",
    [("fbank", {}), ("mfcc", {"num_ceps": 13})],
)
def test_fused_frontend_matches_xla(ft, extra):
    """Fused Pallas fbank/MFCC == the XLA feature path (dither off).

    Dither (in-kernel TPU PRNG) is validated on real hardware —
    ``pltpu.prng_random_bits`` yields zeros under interpret mode —
    see PERF.md for the on-chip distribution check."""
    from wekws_tpu.frontend.features import FeatureExtractor
    from wekws_tpu.frontend.kaldi import FrontendConfig

    rng = np.random.default_rng(0)
    waves = jnp.asarray(
        (rng.standard_normal((4, 20800)) * 1000).astype(np.float32)
    )
    cfg = FrontendConfig(
        feature_type=ft, num_mel_bins=40, dither=0.0, **extra
    )
    fe = FeatureExtractor(cfg)
    ref, _ = fe(waves)
    fe_fused = FeatureExtractor(cfg, use_fused=True)
    with pltpu.force_tpu_interpret_mode():
        fused, lens = fe_fused(waves, lengths=jnp.full((4,), 20800))
    assert fused.shape == ref.shape
    # both paths are bf16_3x (HIGH) matmul chains, but with different
    # accumulation orders; 5e-3 abs on ~1e2-magnitude features is the
    # shared error envelope (~1e-5 relative)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=5e-3, rtol=1e-4
    )
    assert int(lens[0]) == ref.shape[1]


def test_fused_frontend_fallbacks():
    """Ineligible shapes return None from fused_fbank and the
    extractor silently falls back to the XLA path."""
    from wekws_tpu.frontend.features import FeatureExtractor
    from wekws_tpu.frontend.kaldi import FrontendConfig
    from wekws_tpu.ops.fused_frontend import fused_fbank

    cfg = FrontendConfig(feature_type="fbank", num_mel_bins=40, dither=0.0)
    fe = FeatureExtractor(cfg, use_fused=True)
    # shorter than one frame -> kernel ineligible
    with pltpu.force_tpu_interpret_mode():
        assert (
            fused_fbank(
                jnp.zeros((2, 100)), fe._analysis, fe._mel_t, None,
                frame_length=cfg.frame_length,
                frame_shift=cfg.frame_shift,
            )
            is None
        )
        feats, _ = fe(jnp.zeros((2, 100), jnp.float32))
    assert feats.shape[1] == 0  # XLA fallback's empty-frame contract
    # non-TPU backend without forced interpret mode -> silent fallback
    assert (
        fused_fbank(
            jnp.zeros((2, 32000)), fe._analysis, fe._mel_t, None,
            frame_length=cfg.frame_length, frame_shift=cfg.frame_shift,
        )
        is None
    )
    feats, _ = fe(jnp.zeros((2, 32000), jnp.float32))
    assert feats.shape == (2, 198, 40)  # XLA path ran


class TestDepthwiseBackward:
    """The selected depthwise conv (custom VJP: flipped-conv dx +
    kernel-only sub-vjp dw) must match grouped-conv autodiff gradients
    for every (dilation, left_pad, dtype) the models use."""

    @pytest.mark.parametrize("d,lp", [(1, 0), (2, 7), (4, 28), (8, 56)])
    def test_grad_matches_autodiff(self, d, lp):
        import jax.numpy as jnp

        from wekws_tpu.models import layers

        rng = np.random.default_rng(d * 100 + lp)
        k, c, b = 8, 16, 4
        t = 40
        x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, 1, c)), jnp.float32)
        t_out = t + lp - (k - 1) * d
        assert t_out > 0
        co = jnp.asarray(rng.standard_normal((b, t_out, c)), jnp.float32)

        def loss(f):
            return lambda x, w: jnp.sum(f(x, w, d, lp) * co)

        ga = jax.grad(loss(layers.depthwise_conv1d), argnums=(0, 1))(x, w)
        gb = jax.grad(
            loss(layers.depthwise_conv1d_grouped), argnums=(0, 1)
        )(x, w)
        np.testing.assert_allclose(ga[0], gb[0], atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(ga[1], gb[1], atol=1e-4, rtol=1e-5)

    def test_bf16_grad_dtypes(self):
        import jax.numpy as jnp

        from wekws_tpu.models import layers

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 24, 8)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((5, 1, 8)), jnp.bfloat16)
        g = jax.grad(
            lambda x, w: jnp.sum(
                layers.depthwise_conv1d(x, w, 2, 8).astype(jnp.float32)
            ),
            argnums=(0, 1),
        )(x, w)
        assert g[0].dtype == jnp.bfloat16
        assert g[1].dtype == jnp.bfloat16
        assert bool(jnp.isfinite(g[0].astype(jnp.float32)).all())
