"""Feed-forward Sequential Memory Network (FSMN) backbone.

Behavioral equivalent of the reference FSMN
(/root/reference/wekws/model/fsmn.py:173-495) in TPU-first form.  Each
layer is LinearTransform (no-bias Dense) -> FSMNBlock -> AffineTransform
(Dense) -> ReLU; the whole network is
in_linear1 -> in_linear2 -> ReLU -> N layers -> out_linear1 ->
out_linear2 (fsmn.py:448-495).

The FSMNBlock applies depthwise memory taps over left (lorder taps,
stride/dilation lstride — includes the current frame) and right (rorder
lookahead taps, dilation rstride) context and adds them to the identity
path (fsmn.py:214-253).  Like the reference, a nonzero ``rorder``
introduces ``rorder * rstride`` frames of algorithmic latency: output
frame t corresponds to input frame ``t - rorder*rstride`` (this is what
makes the block streamable with a purely left-sided cache).

Cache layout: per-layer (B, P, D) with
``P = (lorder - 1) * lstride + rorder * rstride``, zeros at start.  The
reference's 4-D ``(B, D, P, num_layers)`` export layout is a transpose
of this pytree (see models/cache.py helpers).

The depthwise taps are expressed as valid 1-D grouped convolutions in
feature-last layout so XLA fuses them with the surrounding Dense
matmuls; no Conv2d contortions needed on TPU.
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


class FSMNBlock(nn.Module):
    dim: int
    lorder: int
    rorder: int
    lstride: int = 1
    rstride: int = 1
    dtype: Optional[jnp.dtype] = None  # compute dtype (see mdtc.py)

    @property
    def padding(self) -> int:
        return (self.lorder - 1) * self.lstride + self.rorder * self.rstride

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, cache: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        t = x.shape[1]
        pad = self.padding
        y = jnp.concatenate([cache, x], axis=1)  # (B, P + T, D)
        new_cache = y[:, -pad:, :] if pad > 0 else y[:, :0, :]

        rspan = self.rorder * self.rstride
        left_in = y[:, : y.shape[1] - rspan, :] if rspan > 0 else y
        y_left = nn.Conv(
            self.dim,
            (self.lorder,),
            kernel_dilation=(self.lstride,),
            feature_group_count=self.dim,
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="conv_left",
        )(left_in)  # (B, T, D)
        # identity path: input frames aligned with the (delayed) output
        start = (self.lorder - 1) * self.lstride
        out = y[:, start : start + t, :].astype(y_left.dtype) + y_left

        if self.rorder > 0:
            # lookahead taps start one rstride past the current frame
            right_in = y[:, y.shape[1] - (t + rspan) + self.rstride :, :]
            y_right = nn.Conv(
                self.dim,
                (self.rorder,),
                kernel_dilation=(self.rstride,),
                feature_group_count=self.dim,
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                name="conv_right",
            )(right_in)  # (B, T, D)
            out = out + y_right
        return out, new_cache


class FSMN(nn.Module):
    input_affine_dim: int
    fsmn_layers: int
    linear_dim: int
    proj_dim: int
    lorder: int
    rorder: int
    lstride: int
    rstride: int
    output_affine_dim: int
    output_dim: int
    dtype: Optional[jnp.dtype] = None

    @property
    def layer_padding(self) -> int:
        return (self.lorder - 1) * self.lstride + self.rorder * self.rstride

    @property
    def padding(self) -> int:
        return self.layer_padding * self.fsmn_layers

    def init_cache(self, batch_size: int, dtype=jnp.float32):
        return tuple(
            jnp.zeros((batch_size, self.layer_padding, self.proj_dim), dtype)
            for _ in range(self.fsmn_layers)
        )

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, cache=None, train: bool = False
    ) -> Tuple[jnp.ndarray, tuple]:
        if cache is None:
            cache = self.init_cache(x.shape[0], x.dtype)
        x = nn.Dense(self.input_affine_dim, dtype=self.dtype,
                     name="in_linear1")(x)
        x = nn.Dense(self.linear_dim, dtype=self.dtype,
                     name="in_linear2")(x)
        x = nn.relu(x)
        new_caches = []
        for i in range(self.fsmn_layers):
            x = nn.Dense(self.proj_dim, use_bias=False, dtype=self.dtype,
                         name=f"layer_{i}_proj")(x)
            x, c = FSMNBlock(
                self.proj_dim,
                self.lorder,
                self.rorder,
                self.lstride,
                self.rstride,
                dtype=self.dtype,
                name=f"layer_{i}_fsmn",
            )(x, cache[i], train)
            new_caches.append(c)
            x = nn.Dense(self.linear_dim, dtype=self.dtype,
                         name=f"layer_{i}_affine")(x)
            x = nn.relu(x)
        x = nn.Dense(self.output_affine_dim, dtype=self.dtype,
                     name="out_linear1")(x)
        x = nn.Dense(self.output_dim, dtype=self.dtype,
                     name="out_linear2")(x)
        return x.astype(jnp.float32), tuple(new_caches)
