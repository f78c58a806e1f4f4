"""Temporal convolutional network (TCN / DS-TCN) backbone.

Streaming causal dilated 1-D conv stack with residual connections,
behaviorally equivalent to the reference's TCN
(/root/reference/wekws/model/tcn.py:23-170) but laid out TPU-first:

* feature-last (B, T, D) everywhere — the channel dim sits in the
  128-wide lane axis, so the pointwise convs and 1x1s run as MXU
  matmuls and the depthwise convs vectorize on the VPU;
* causal left-context is an explicit per-block cache tensor
  (B, pad_i, D).  Training uses a zero cache (== zero left padding);
  streaming chunks concatenate ``[cache, x]`` along time and keep the
  last ``pad_i`` input frames as the next cache.  The pytree-of-arrays
  cache replaces the reference's single concatenated (B, D, ΣC) tensor
  with offset bookkeeping;
* dilation of block i is ``2**i``; block i's cache holds
  ``(kernel_size - 1) * 2**i`` frames.

Block structure (dropout after activations, residual add, no final
activation — matching tcn.py:55-61):
  CnnBlock:   Conv1d(k, dil) -> BN -> ReLU -> Dropout;  y + x
  DsCnnBlock: DWConv1d(k, dil) -> BN -> ReLU -> Conv1x1 -> BN -> ReLU
              -> Dropout;  y + x
"""

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from wekws_tpu.models.layers import DepthwiseConv1d, batch_norm


class CnnBlock(nn.Module):
    channel: int
    kernel_size: int
    dilation: int
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None  # conv compute dtype (see mdtc.py)
    ghost_bn: int = 0
    bn_dtype: Optional[jnp.dtype] = None

    @property
    def padding(self) -> int:
        return (self.kernel_size - 1) * self.dilation

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, cache: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if cache is None:
            # whole-utterance path: zero left context as implicit conv
            # padding (see mdtc.TCNBlock for the rationale)
            y, new_cache = x, None
        else:
            y = jnp.concatenate([cache, x], axis=1)
            new_cache = y[:, -self.padding:, :]
        y = nn.Conv(
            self.channel,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=[(self.padding, 0)] if cache is None else "VALID",
            dtype=self.dtype,
            name="conv",
        )(y)
        y = batch_norm(train, self.ghost_bn, name="bn", dtype=self.bn_dtype)(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y + x.astype(y.dtype), new_cache


class DsCnnBlock(nn.Module):
    """Depthwise-separable variant."""

    channel: int
    kernel_size: int
    dilation: int
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None
    ghost_bn: int = 0
    bn_dtype: Optional[jnp.dtype] = None

    @property
    def padding(self) -> int:
        return (self.kernel_size - 1) * self.dilation

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, cache: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if cache is None:
            y, new_cache = x, None
        else:
            y = jnp.concatenate([cache, x], axis=1)
            new_cache = y[:, -self.padding:, :]
        y = DepthwiseConv1d(
            self.channel,
            self.kernel_size,
            self.dilation,
            left_pad=self.padding if cache is None else 0,
            dtype=self.dtype,
            name="dw_conv",
        )(y)
        y = batch_norm(train, self.ghost_bn, name="dw_bn", dtype=self.bn_dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channel, (1,), padding="VALID",
                    dtype=self.dtype, name="pw_conv")(y)
        y = batch_norm(train, self.ghost_bn, name="pw_bn", dtype=self.bn_dtype)(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y + x.astype(y.dtype), new_cache


class TCN(nn.Module):
    num_layers: int
    channel: int
    kernel_size: int
    dropout: float = 0.1
    ds: bool = False
    dtype: Optional[jnp.dtype] = None
    ghost_bn: int = 0
    bn_dtype: Optional[jnp.dtype] = None

    @property
    def paddings(self) -> Sequence[int]:
        return tuple(
            (self.kernel_size - 1) * (2 ** i) for i in range(self.num_layers)
        )

    @property
    def padding(self) -> int:
        """Total receptive-field left context (== cache frames)."""
        return sum(self.paddings)

    def init_cache(self, batch_size: int, dtype=jnp.float32):
        return tuple(
            jnp.zeros((batch_size, p, self.channel), dtype)
            for p in self.paddings
        )

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, cache=None, train: bool = False
    ) -> Tuple[jnp.ndarray, tuple]:
        block_cls = DsCnnBlock if self.ds else CnnBlock
        if cache is None:
            # whole-utterance path: implicit zero padding inside convs
            cache = (None,) * self.num_layers
        new_caches = []
        for i in range(self.num_layers):
            block = block_cls(
                self.channel,
                self.kernel_size,
                2 ** i,
                self.dropout,
                dtype=self.dtype,
                ghost_bn=self.ghost_bn,
                bn_dtype=self.bn_dtype,
                name=f"block_{i}",
            )
            x, c = block(x, cache[i], train)
            new_caches.append(c)
        return x.astype(jnp.float32), tuple(new_caches)
