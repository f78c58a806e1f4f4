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


# Selected implementation (module-level so experiments can swap it).
#
# Measured on 1x TPU v5e, full MDTC train step at B=512 (PERF.md round 2):
# grouped 14.4 ms vs shifted 22.7 ms.  In isolation the shifted form is
# marginally faster (0.024 vs 0.026 ms fwd), but its backward lowers to
# per-tap scatter-adds into the padded input buffer, which block XLA's
# fusion of the surrounding BN/ReLU backward ops; the grouped form's
# conv-transpose backward fuses cleanly.  ``depthwise_conv1d_shifted``
# is retained (unused in the model path) as the documented measured
# alternative for future lowering experiments; the Pallas serving
# kernels (ops/fused_mdtc.py) implement the same shifted-FMA form
# independently inside the kernel body.
depthwise_conv1d = depthwise_conv1d_grouped
