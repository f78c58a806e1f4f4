"""Multi-scale Depthwise Temporal Convolution (MDTC) backbone.

Behavioral equivalent of the reference MDTC
(/root/reference/wekws/model/mdtc.py:23-276), TPU-first layout
(feature-last, pytree cache — see tcn.py for the rationale):

* ``TCNBlock``: DS dilated conv (depthwise -> BN -> pointwise), then
  BN -> ReLU -> 1x1 conv -> BN, residual add when channels match,
  final ReLU (mdtc.py:108-121);
* ``TCNStack``: blocks with dilations ``2^0 .. 2^(stack_size-1)``;
* ``MDTC``: a dilation-1 preprocessor block (+ReLU), then ``num_stack``
  stacks whose outputs are **summed** — multi-scale feature aggregation
  (mdtc.py:270-274).  Only causal mode is supported, like the
  reference (mdtc.py:224).

Cache is a flat tuple over all blocks in network order:
[preprocessor, stack0.block0, stack0.block1, ..., stackN.blockM].
"""

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from wekws_tpu.models.layers import DepthwiseConv1d, batch_norm

# Mixed precision: convolution compute in ``dtype`` (bfloat16 on TPU)
# with float32 parameters.  BatchNorm (layers.ExactBatchNorm by
# default) always computes and accumulates batch statistics in f32
# (bf16's 8-bit mantissa cannot sum ~1e5 elements) and, per flax's
# promotion rules, emits f32 activations; the gated ``bn_dtype``
# config additionally narrows the emitted activations to bf16
# (statistics still f32 — convergence-gated, used by bench.py).  The
# per-block pattern is
# conv(bf16) -> BN(f32 stats) -> relu -> conv(bf16) -> ...


class DSDilatedConv1d(nn.Module):
    """Dilated depthwise-separable conv: DW conv -> BN -> pointwise."""

    in_channels: int
    out_channels: int
    kernel_size: int
    dilation: int = 1
    left_pad: int = 0
    dtype: Optional[jnp.dtype] = None
    ghost_bn: int = 0
    bn_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = DepthwiseConv1d(
            self.in_channels,
            self.kernel_size,
            self.dilation,
            left_pad=self.left_pad,
            dtype=self.dtype,
            name="dw_conv",
        )(x)
        x = batch_norm(train, self.ghost_bn, name="bn", dtype=self.bn_dtype)(x)
        x = nn.Conv(self.out_channels, (1,), padding="VALID",
                    dtype=self.dtype, name="pw_conv")(x)
        return x


class TCNBlock(nn.Module):
    in_channels: int
    res_channels: int
    kernel_size: int
    dilation: int
    dtype: Optional[jnp.dtype] = None
    ghost_bn: int = 0
    bn_dtype: Optional[jnp.dtype] = None
    # Fused Pallas training path (ops/fused_mdtc_train.py): the whole
    # block (dw conv -> 3x exact-BN -> 2x pointwise -> relu -> res)
    # as a few VMEM-resident kernel passes instead of ~10 XLA fusions.
    # Applies to the whole-utterance training forward only; eval,
    # streaming-cache and mismatched-channel calls use the XLA path.
    # Parameter tree is IDENTICAL either way (shim param holders).
    fused_train: bool = False

    @property
    def padding(self) -> int:
        return (self.kernel_size - 1) * self.dilation

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, cache: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if (
            self.fused_train and train and cache is None
            and self.in_channels == self.res_channels
            and not self.ghost_bn
        ):
            from wekws_tpu.ops.fused_mdtc_train import fused_block_apply

            return fused_block_apply(self, x, train), None
        # cache=None (whole-utterance training/scoring): the zero left
        # context becomes implicit conv padding — no concatenate, no
        # cache-slice copies in the step graph (a measured 3.9 ms/step
        # copy storm at B=512 across the 17 blocks, PERF.md round 2).
        if cache is None:
            y, new_cache = x, None
        else:
            y = jnp.concatenate([cache, x], axis=1)
            new_cache = y[:, -self.padding:, :]
        y = DSDilatedConv1d(
            self.in_channels,
            self.res_channels,
            self.kernel_size,
            self.dilation,
            left_pad=self.padding if cache is None else 0,
            dtype=self.dtype,
            ghost_bn=self.ghost_bn,
            bn_dtype=self.bn_dtype,
            name="conv1",
        )(y, train)
        y = batch_norm(train, self.ghost_bn, name="bn1", dtype=self.bn_dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.res_channels, (1,), padding="VALID",
                    dtype=self.dtype, name="conv2")(y)
        y = batch_norm(train, self.ghost_bn, name="bn2", dtype=self.bn_dtype)(y)
        if self.in_channels == self.res_channels:
            y = y + x.astype(y.dtype)
        return nn.relu(y), new_cache


class MDTC(nn.Module):
    stack_num: int
    stack_size: int
    in_channels: int
    res_channels: int
    kernel_size: int
    causal: bool = True
    dtype: Optional[jnp.dtype] = None
    # Rematerialize each block in the backward pass: only block
    # INPUTS are saved as residuals; the dw-conv/BN/relu/pointwise
    # internals are recomputed from them during grad.  Trades ~2x
    # block-forward compute (VPU/MXU, cheap here) for most of the
    # backward's activation HBM traffic (the measured bottleneck,
    # PERF.md roofline).  Numerically identical to remat=False.
    remat: bool = False
    # Ghost BatchNorm groups (0 = exact global-batch BN, the reference
    # semantics).  See layers.GhostBatchNorm; gate on a convergence run.
    ghost_bn: int = 0
    bn_dtype: Optional[jnp.dtype] = None
    # backbone.fused_train: route whole-utterance training forwards
    # through the fused Pallas block kernels (exact BN semantics,
    # parity pinned in tests/test_fused_train.py)
    fused_train: bool = False

    def setup(self):
        assert self.kernel_size % 2 == 1
        assert self.causal, "only causal MDTC is supported"

    @property
    def block_specs(self) -> Sequence[Tuple[int, int]]:
        """(in_channels, dilation) of every block, network order."""
        specs = [(self.in_channels, 1)]  # preprocessor
        for _ in range(self.stack_num):
            for i in range(self.stack_size):
                specs.append((self.res_channels, 2 ** i))
        return tuple(specs)

    @property
    def paddings(self) -> Sequence[int]:
        return tuple(
            (self.kernel_size - 1) * d for _, d in self.block_specs
        )

    @property
    def padding(self) -> int:
        """Receptive field (mdtc.py:233-240)."""
        return sum(self.paddings)

    def init_cache(self, batch_size: int, dtype=jnp.float32):
        return tuple(
            jnp.zeros((batch_size, (self.kernel_size - 1) * d, c), dtype)
            for c, d in self.block_specs
        )

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, cache=None, train: bool = False
    ) -> Tuple[jnp.ndarray, tuple]:
        if cache is None:
            # whole-utterance path: zero left context via implicit conv
            # padding inside each block (no cache tensors materialized)
            cache = (None,) * len(self.block_specs)
        block_cls = TCNBlock
        if self.remat:
            import jax

            block_cls = nn.remat(
                TCNBlock,
                policy=jax.checkpoint_policies.nothing_saveable,
                static_argnums=(3,),  # train flag
            )
        new_caches = []
        y, c = block_cls(
            self.in_channels, self.res_channels, self.kernel_size, 1,
            dtype=self.dtype, ghost_bn=self.ghost_bn,
            bn_dtype=self.bn_dtype, fused_train=self.fused_train,
            name="preprocessor",
        )(x, cache[0], train)
        y = nn.relu(y)
        new_caches.append(c)
        outputs = None
        idx = 1
        for s in range(self.stack_num):
            for i in range(self.stack_size):
                y, c = block_cls(
                    self.res_channels,
                    self.res_channels,
                    self.kernel_size,
                    2 ** i,
                    dtype=self.dtype,
                    ghost_bn=self.ghost_bn,
                    bn_dtype=self.bn_dtype,
                    fused_train=self.fused_train,
                    name=f"stack_{s}_block_{i}",
                )(y, cache[idx], train)
                new_caches.append(c)
                idx += 1
            # multi-scale aggregation: sum each stack's output
            outputs = y if outputs is None else outputs + y
        return outputs.astype(jnp.float32), tuple(new_caches)
