"""Shared NN layers tuned for TPU/XLA lowering.

``DepthwiseConv1d``: a drop-in replacement for
``nn.Conv(features, (k,), kernel_dilation=(d,), feature_group_count=features,
padding='VALID')`` that computes the depthwise convolution as ``k`` shifted
fused multiply-adds instead of a grouped convolution.

Why: XLA lowers grouped 1-D convolutions on TPU to a poorly-tiled path that
is dispatch/memory-bound (~0.65 ms per call for (B=512, T~200, C=64) —
PERF.md round-1 profile; 17 such calls dominate the MDTC train step).  The
same operation written as ``y[t] = sum_j w[j] * x[t + j*d]`` is pure
elementwise VPU work that XLA fuses with the surrounding BN/ReLU into a
single loop over the input buffer.

Parameter names and shapes are identical to the flax grouped-conv module
(kernel ``(k, 1, C)``, bias ``(C,)``), so checkpoints, exports and the C++
runtime graph format are unaffected.

Reference semantics being matched (studied, not copied):
/root/reference/wekws/model/mdtc.py:23-59 and tcn.py:64-102 use
``nn.Conv1d(..., groups=in_channels)`` — a cross-correlation with taps at
``t + j*dilation``, exactly the formula below.
"""

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def depthwise_conv1d_shifted(
    x: jnp.ndarray, kernel: jnp.ndarray, dilation: int, left_pad: int = 0
) -> jnp.ndarray:
    """Shifted-FMA formulation: ``y[t] = sum_j w[j] * x[t + j*d]``."""
    if left_pad:
        x = jnp.pad(x, ((0, 0), (left_pad, 0), (0, 0)))
    k = kernel.shape[0]
    w = kernel[:, 0, :]
    t_out = x.shape[1] - (k - 1) * dilation
    y = None
    for j in range(k):
        tap = (
            jax.lax.dynamic_slice_in_dim(x, j * dilation, t_out, axis=1)
            * w[j]
        )
        y = tap if y is None else y + tap
    return y


def depthwise_conv1d_grouped(
    x: jnp.ndarray, kernel: jnp.ndarray, dilation: int, left_pad: int = 0
) -> jnp.ndarray:
    """Grouped-convolution lowering (lax.conv feature_group_count=C).

    ``left_pad`` frames of zeros are applied inside the convolution
    (implicit padding) — the streaming-train equivalence `zeros cache ==
    left zero padding` with no concatenate/copy materialized.
    """
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        (1,),
        [(left_pad, 0)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=kernel.shape[-1],
    )


class DepthwiseConv1d(nn.Module):
    """Depthwise (per-channel) dilated 1-D convolution, VALID padding.

    Input ``(B, T_in, C)`` -> output ``(B, T_in - (k-1)*d, C)``.
    """

    features: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = True
    left_pad: int = 0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, 1, self.features),
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = depthwise_conv1d(x, kernel, self.dilation, self.left_pad)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,)
            )
            y = y + bias.astype(y.dtype)
        return y




def _dx_flipped_conv(g, kernel, dilation, left_pad, t_in):
    """dx as a REGULAR grouped conv of g with the flipped kernel (full
    correlation) — same op class as the forward, instead of the
    conv-transpose XLA autodiff emits."""
    span = (kernel.shape[0] - 1) * dilation
    dxp = jax.lax.conv_general_dilated(
        g,
        jnp.flip(kernel, axis=0),
        (1,),
        [(span, span)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=kernel.shape[-1],
    )
    return dxp[:, left_pad:, :] if left_pad else dxp


def _dw_sub_vjp(x, kernel, dilation, left_pad, g):
    """dw via XLA's own weight-grad conv (vjp wrt kernel only — the dx
    conv-transpose is never built)."""
    _, vjp = jax.vjp(
        lambda kk: depthwise_conv1d_grouped(x, kk, dilation, left_pad),
        kernel,
    )
    (dw,) = vjp(g)
    return dw


def _make_variant(name, dx_mode, dw_mode):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
    def conv(x, kernel, dilation, left_pad=0):
        return depthwise_conv1d_grouped(x, kernel, dilation, left_pad)

    def fwd(x, kernel, dilation, left_pad):
        return conv(x, kernel, dilation, left_pad), (x, kernel)

    def bwd(dilation, left_pad, res, g):
        x, kernel = res
        if dx_mode == "flip_conv":
            dx = _dx_flipped_conv(g, kernel, dilation, left_pad, x.shape[1])
        else:  # shifted
            k = kernel.shape[0]
            w = kernel[:, 0, :]
            span = (k - 1) * dilation
            t_inp = x.shape[1] + left_pad
            gp = jnp.pad(g, ((0, 0), (span, span), (0, 0)))
            dxp = None
            for j in range(k):
                tap = (
                    jax.lax.dynamic_slice_in_dim(
                        gp, span - j * dilation, t_inp, axis=1
                    )
                    * w[j]
                )
                dxp = tap if dxp is None else dxp + tap
            dx = dxp[:, left_pad:, :] if left_pad else dxp
        if dw_mode == "sub_vjp":
            dw = _dw_sub_vjp(x, kernel, dilation, left_pad, g)
        else:  # slice reductions
            k = kernel.shape[0]
            xp = (
                jnp.pad(x, ((0, 0), (left_pad, 0), (0, 0)))
                if left_pad else x
            )
            t_out = g.shape[1]
            g32 = g.astype(jnp.float32)
            taps = []
            for j in range(k):
                xj = jax.lax.dynamic_slice_in_dim(
                    xp, j * dilation, t_out, axis=1
                )
                taps.append(
                    jnp.sum(g32 * xj.astype(jnp.float32), axis=(0, 1))
                )
            dw = jnp.stack(taps)[:, None, :].astype(kernel.dtype)
        return dx.astype(x.dtype), dw

    conv.defvjp(fwd, bwd)
    conv.__name__ = name
    return conv


# experiment variants (tools/bench_dw_backward.py)
depthwise_conv1d_v_flip_subvjp = _make_variant(
    "v_flip_subvjp", "flip_conv", "sub_vjp")
depthwise_conv1d_v_flip_slices = _make_variant(
    "v_flip_slices", "flip_conv", "slices")
depthwise_conv1d_v_shift_subvjp = _make_variant(
    "v_shift_subvjp", "shifted", "sub_vjp")
# fully dense backward (dx shifted-FMA, dw slice reductions) — measured
# SLOWER than the flip_subvjp default at every batch size (PERF.md r3)
# but kept addressable for the A/B tool
depthwise_conv1d_cvjp = _make_variant("cvjp", "shifted", "slices")


class GhostBatchNorm(nn.Module):
    """BatchNorm with per-group ("ghost") training statistics.

    Prototype for the fused-training-kernel direction (PERF.md r2
    roofline: a whole-backbone Pallas training kernel needs per-tile
    BN statistics; exact global-batch BN forces an HBM round-trip per
    layer).  Training: the batch is split into ``num_groups`` equal
    groups, each normalized by its own (group, channel) statistics;
    running stats accumulate the group-averaged moments.  Eval is
    identical to nn.BatchNorm.  Variable names/shapes match
    nn.BatchNorm exactly (params scale/bias, batch_stats mean/var), so
    checkpoints, the torch importer, export and the C++ runtime are
    unaffected by the knob.

    Enable per-model with ``backbone.ghost_bn: G`` (0 = standard BN).
    Semantics differ from the reference's global-batch BN — gate any
    default flip on a convergence run (examples/synthetic).
    """

    num_groups: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None  # output dtype (None = x.dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + self.epsilon) * scale
            return (
                (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
                + bias.astype(x.dtype)
            )

        b = x.shape[0]
        g = self.num_groups if b % self.num_groups == 0 else 1
        xg = x.reshape((g, b // g) + x.shape[1:]).astype(jnp.float32)
        axes = tuple(range(1, xg.ndim - 1))  # per-group batch+spatial
        gmean = jnp.mean(xg, axis=axes, keepdims=True)  # (g,1,..,C)
        gvar = jnp.mean(jnp.square(xg - gmean), axis=axes, keepdims=True)
        y = (xg - gmean) * jax.lax.rsqrt(gvar + self.epsilon)
        y = y.reshape(x.shape).astype(x.dtype)
        if not self.is_initializing():
            new_mean = jnp.mean(gmean, axis=0).reshape((c,))
            new_var = jnp.mean(gvar, axis=0).reshape((c,))
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * new_mean
            ra_var.value = m * ra_var.value + (1.0 - m) * new_var
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bn_train_apply(x, scale, bias, eps, mean, var):
    """Training-mode BN apply with precomputed batch stats and a
    hand-written backward.

    XLA autodiff of the batch-statistics path loses its reduce/
    broadcast fusion above B~768 (PERF.md r3: 3.27x grad scaling at 2x
    batch vs 1.79x for the eval path).  The textbook BN backward is
    two reductions + one elementwise pass:

      dbeta  = sum(dy);  dgamma = sum(dy * xhat)
      dx = gamma*inv/N * (N*dy - dbeta - xhat*dgamma)

    Exact same math as autodiff (mean/var treated as functions of x),
    just written as explicit reductions.
    """
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x.astype(jnp.float32) - mean) * inv
    return xhat * scale + bias


def _bn_train_fwd(x, scale, bias, eps, mean, var):
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x.astype(jnp.float32) - mean) * inv
    y = xhat * scale + bias
    # Residual is x ITSELF (usually bf16), not the f32 xhat: x is
    # already materialized in HBM as the producing conv's output, so
    # the forward writes NO extra residual, and the backward reads
    # half the bytes (2 B vs 4 B per element), recomputing
    # xhat = (x - mean) * inv inside its fused reduction — the same
    # cast/multiply the forward did, so gradients stay bit-identical.
    # Measured: B=1024 full MDTC step 17.0 -> 14.8 ms (PERF.md r4).
    return y, (x, mean, inv, scale)


def _bn_train_bwd(eps, res, dy):
    x, mean, inv, scale = res
    axes = tuple(range(dy.ndim - 1))  # all but channel
    n = 1
    for a in axes:
        n *= dy.shape[a]
    dy32 = dy.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * inv
    dbeta = jnp.sum(dy32, axis=axes)
    dgamma = jnp.sum(dy32 * xhat, axis=axes)
    g = (scale * inv) / n
    dx = (g * (n * dy32 - dbeta - xhat * dgamma)).astype(x.dtype)
    # cotangents for (x, scale, bias, mean, var): mean/var were
    # computed FROM x, and their contribution is already folded into
    # the dx formula above, so they get symbolic zeros
    return (dx, dgamma.astype(scale.dtype), dbeta.astype(scale.dtype),
            jnp.zeros_like(inv), jnp.zeros_like(inv))


_bn_train_apply.defvjp(_bn_train_fwd, _bn_train_bwd)


class ExactBatchNorm(nn.Module):
    """nn.BatchNorm drop-in (same variable names/semantics) with the
    hand-written training backward above.  Gradients are identical to
    autodiff (pinned in tests); only the HLO the backward lowers to
    changes.  Selected via the module-level BATCH_NORM_EXACT flag.

    ``dtype``: output/activation dtype (None = promote to f32 like
    flax).  Statistics are ALWAYS computed and accumulated in f32; a
    bf16 ``dtype`` only narrows the activations BN hands to the next
    conv (which casts to bf16 anyway) and the residual adds — a
    measured ~28% backward win at B=1024 (PERF.md) that must be
    convergence-gated per model via ``backbone.bn_dtype``."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if use_running_average:
            # promote like flax nn.BatchNorm: bf16 x against f32
            # params/stats -> f32 output (batch statistics and the
            # activations BN feeds stay f32; convs re-cast down)
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            y = (x.astype(jnp.float32) - ra_mean.value) * inv + bias
            return y.astype(self.dtype) if self.dtype else y
        axes = tuple(range(x.ndim - 1))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=axes)
        var = jnp.mean(jnp.square(x32), axis=axes) - jnp.square(mean)
        y = _bn_train_apply(x, scale, bias, self.epsilon, mean, var)
        if self.dtype:
            y = y.astype(self.dtype)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return y


# Training BN implementation selector.  ExactBatchNorm is the default:
# same math as nn.BatchNorm (gradient parity pinned in
# tests/test_models.py) but its hand-written backward restores the
# reduce/broadcast fusion XLA loses above B~768 — measured
# 138.2k -> 147.3k audio-s/s at B=512 and 90.4k -> 120.7k at B=1024
# (PERF.md round 3).  Set False to fall back to flax nn.BatchNorm.
BATCH_NORM_EXACT = True


def batch_norm(train: bool, ghost_bn: int = 0, name: str = "bn",
               dtype: Optional[jnp.dtype] = None):
    """BN factory used by the backbones: standard nn.BatchNorm,
    ExactBatchNorm (hand-written backward) when BATCH_NORM_EXACT is
    set, or GhostBatchNorm when ``ghost_bn`` > 1 (config knob).
    ``dtype``: BN output dtype override (backbone.bn_dtype; None =
    promote to f32 like flax)."""
    if ghost_bn and ghost_bn > 1:
        gbn = GhostBatchNorm(num_groups=ghost_bn, name=name, dtype=dtype)
        return lambda x: gbn(x, use_running_average=not train)
    if BATCH_NORM_EXACT:
        ebn = ExactBatchNorm(name=name, dtype=dtype)
        return lambda x: ebn(x, use_running_average=not train)
    bn = nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=dtype, name=name,
    )
    return bn


# Selected implementation (module-level so experiments can swap it).
#
# History (1x TPU v5e, full MDTC train step, bf16):
# * round 2: grouped-conv autodiff 14.4 ms vs shifted-FMA autodiff
#   22.7 ms @ B=512 (the shifted form's backward lowers to per-tap
#   scatter-adds that block fusion) -> grouped was selected.
# * round 3 (PERF.md 'Depthwise backward' table): custom-VJP variants
#   measured against grouped autodiff at B=512/1024.  dx as a REGULAR
#   flipped grouped conv + dw via a kernel-only sub-vjp wins at both
#   sizes (9.13 vs 9.38 ms @ 512, 25.64 vs 25.41 @ 1024 — tie there);
#   fully dense slice/reduction backwards are SLOWER (12.35/33.85 ms),
#   so the conv-transpose was never the B>=768 cliff.
depthwise_conv1d = depthwise_conv1d_v_flip_subvjp
