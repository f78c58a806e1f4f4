"""Pallas TPU kernel: whole-backbone fused TCN forward (ds variant).

Third fused serving backbone (after ops/fused_mdtc.py and
ops/fused_fsmn.py): the DS-TCN is the hey_snips / hi_xiaowen
max-pooling flagship (reference tcn.py:64-170).  Per layer, with BN
folded into the convs (inference artifact semantics, identical to the
export path graph.py:_lower_tcn):

    a = dw_conv(x_padded) + b_dw      # (K, C) taps, dilation 2^i
    h = relu(a)
    p = h @ W_pw + b_pw               # MXU (BT*T, C) x (C, C)
    y = relu(p) + x                   # residual AFTER the relu

The whole layer chain runs VMEM-resident per batch tile; streaming
cache layout matches the flax pytree (per layer the last
``(K-1)*2^i`` input frames), stacked (L, B, pad_max, C).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_ref, cache_in_ref, dw_w_ref, dw_b_ref, pw_w_ref, pw_b_ref,
    out_ref, cache_out_ref, act_ref,
    *, dilations: Tuple[int, ...], kernel_size: int, pad_max: int,
):
    bt, t, c = x_ref.shape
    k = kernel_size
    act_ref[:, pl.ds(pad_max, t), :] = x_ref[...]
    for layer, dil in enumerate(dilations):
        act_ref[:, 0:pad_max, :] = cache_in_ref[layer]
        cache_out_ref[layer] = act_ref[:, pl.ds(t, pad_max), :]
        x_in = act_ref[:, pl.ds(pad_max, t), :]
        a = jnp.zeros((bt, t, c), jnp.float32)
        for tap in range(k):
            offset = pad_max - (k - 1 - tap) * dil
            a = a + act_ref[:, pl.ds(offset, t), :] * dw_w_ref[layer, tap, :]
        h = jnp.maximum(a + dw_b_ref[layer, :], 0.0)
        p = (
            jnp.dot(
                h.reshape(bt * t, c), pw_w_ref[layer],
                preferred_element_type=jnp.float32,
            )
            + pw_b_ref[layer, :]
        ).reshape(bt, t, c)
        y = jnp.maximum(p, 0.0) + x_in
        act_ref[:, pl.ds(pad_max, t), :] = y
    out_ref[...] = act_ref[:, pl.ds(pad_max, t), :]


@functools.partial(
    jax.jit, static_argnames=("dilations", "kernel_size", "block_batch")
)
def fused_ds_tcn(
    x: jnp.ndarray,
    cache: jnp.ndarray,
    dw_w: jnp.ndarray,
    dw_b: jnp.ndarray,
    pw_w: jnp.ndarray,
    pw_b: jnp.ndarray,
    dilations: Tuple[int, ...],
    kernel_size: int,
    block_batch: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (B, T, C); cache: (L, B, pad_max, C) (zeros at start; only
    the last (K-1)*dil_l rows are read per layer).  Returns
    (y (B, T, C), new_cache); chunked calls == one full-utterance
    call."""
    b, t, c = x.shape
    n_layers = len(dilations)
    pad_max = (kernel_size - 1) * max(dilations)
    bt = min(block_batch, b)
    rem = (-b) % bt
    if rem:
        x = jnp.pad(x, ((0, rem), (0, 0), (0, 0)))
        cache = jnp.pad(cache, ((0, 0), (0, rem), (0, 0), (0, 0)))
    bp = x.shape[0]
    kernel = functools.partial(
        _kernel,
        dilations=tuple(int(d) for d in dilations),
        kernel_size=kernel_size,
        pad_max=pad_max,
    )
    out, new_cache = pl.pallas_call(
        kernel,
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec((bt, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, bt, pad_max, c), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, bt, pad_max, c), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, t, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, bp, pad_max, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bt, pad_max + t, c), jnp.float32),
        ],
    )(x, cache, dw_w, dw_b, pw_w, pw_b)
    return out[:b], new_cache[:, :b]


from wekws_tpu.ops.fused_common import (  # noqa: E402
    fold_bn as _fold_bn,
    init_ring_cache as init_tcn_cache,
)


def extract_ds_tcn_weights(tcn_module, params, batch_stats):
    """Flax DS-TCN variables -> folded weight stacks + dilations.

    Only the ds variant fuses (the full-conv CnnBlock's (K, C, C)
    kernels belong on the XLA path: k C x C matmuls per layer fuse
    fine there)."""
    assert tcn_module.ds, "fused path covers the ds variant"
    dw_w, dw_b, pw_w, pw_b = [], [], [], []
    for i in range(tcn_module.num_layers):
        blk = params[f"block_{i}"]
        blk_stats = batch_stats[f"block_{i}"]
        w, bias = _fold_bn(
            blk["dw_conv"]["kernel"][:, 0, :],
            blk["dw_conv"]["bias"],
            blk["dw_bn"], blk_stats["dw_bn"],
        )
        dw_w.append(w)
        dw_b.append(bias)
        w, bias = _fold_bn(
            blk["pw_conv"]["kernel"][0],
            blk["pw_conv"]["bias"],
            blk["pw_bn"], blk_stats["pw_bn"],
        )
        pw_w.append(w)
        pw_b.append(bias)
    stack = lambda xs: jnp.asarray(np.stack(xs))  # noqa: E731
    dilations = tuple(2 ** i for i in range(tcn_module.num_layers))
    return (
        stack(dw_w), stack(dw_b), stack(pw_w), stack(pw_b), dilations
    )
