"""Pallas TPU kernel: whole-backbone fused MDTC forward.

XLA executes the MDTC backbone as ~50 separate kernels (17 dilated
depthwise convs + 34 pointwise matmuls + elementwise), bouncing every
intermediate through HBM.  This kernel runs the ENTIRE backbone for a
tile of batch rows in one VMEM-resident program: per layer a K-tap
shifted multiply-accumulate (VPU) for the causal depthwise conv and two
(BT*T, C) x (C, C) MXU matmuls, with the multi-scale stack summation
accumulated in place.  Activations and all folded weights (~0.5 MB)
stay in VMEM for the whole forward; batch tiling (``block_batch``)
keeps the MXU matmuls large.

Weights are the BatchNorm-folded inference weights — the same tensors
the export path produces (wekws_tpu/export/graph.py _lower_mdtc_block),
extracted by ``extract_mdtc_weights``.  Used for the inference/scoring
path; training keeps the XLA autodiff path.

Layer math (reference mdtc.py:62-121, BN folded):
    a = dw_conv(x_padded)            # (K,C) taps, dilation d, +bias
    b = relu(a @ W1 + b1)            # DSDilated pointwise (+bn1)
    c = b @ W2 + b2                  # conv2 1x1 (+bn2)
    y = relu(c + x)                  # residual (channels always match)
Stack outputs (every ``stack_size``-th layer after the preprocessor)
are summed for the multi-scale aggregation (mdtc.py:270-274).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_ref, dw_w_ref, dw_b_ref, pw1_w_ref, pw1_b_ref, pw2_w_ref, pw2_b_ref,
    out_ref, act_ref, acc_ref,
    *, dilations: Tuple[int, ...], kernel_size: int, stack_size: int,
    pad_max: int, cache_in_ref=None, cache_out_ref=None,
):
    bt, t, c = x_ref.shape
    k = kernel_size

    # activation buffer per row: [left margin | activation]
    act_ref[:, pl.ds(pad_max, t), :] = x_ref[...]
    if cache_in_ref is None:
        act_ref[:, 0:pad_max, :] = jnp.zeros((bt, pad_max, c), jnp.float32)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    for layer, dil in enumerate(dilations):
        if cache_in_ref is not None:
            # streaming: left margin = carried input context; new cache
            # = the pad_max input rows ending at the chunk boundary
            act_ref[:, 0:pad_max, :] = cache_in_ref[layer]
            cache_out_ref[layer] = act_ref[:, pl.ds(t, pad_max), :]
        x_in = act_ref[:, pl.ds(pad_max, t), :]
        # depthwise causal conv: K shifted FMAs on the VPU
        a = jnp.zeros((bt, t, c), jnp.float32)
        for tap in range(k):
            offset = pad_max - (k - 1 - tap) * dil
            a = a + act_ref[:, pl.ds(offset, t), :] * dw_w_ref[layer, tap, :]
        a = a + dw_b_ref[layer, :]
        # two pointwise (C x C) matmuls on the MXU over (BT*T, C)
        a2 = a.reshape(bt * t, c)
        b = jnp.maximum(
            jnp.dot(a2, pw1_w_ref[layer], preferred_element_type=jnp.float32)
            + pw1_b_ref[layer, :],
            0.0,
        )
        y = (
            jnp.dot(b, pw2_w_ref[layer], preferred_element_type=jnp.float32)
            + pw2_b_ref[layer, :]
        ).reshape(bt, t, c)
        y = jnp.maximum(y + x_in, 0.0)
        # (preprocessor's extra relu is idempotent after the residual relu)
        act_ref[:, pl.ds(pad_max, t), :] = y
        # multi-scale: sum each stack's final output
        if layer > 0 and (layer % stack_size) == 0:
            acc_ref[...] += y
    out_ref[...] = acc_ref[...]


@functools.partial(
    jax.jit,
    static_argnames=("dilations", "kernel_size", "stack_size", "block_batch"),
)
def fused_mdtc_forward(
    x: jnp.ndarray,
    dw_w: jnp.ndarray,
    dw_b: jnp.ndarray,
    pw1_w: jnp.ndarray,
    pw1_b: jnp.ndarray,
    pw2_w: jnp.ndarray,
    pw2_b: jnp.ndarray,
    dilations: Tuple[int, ...],
    kernel_size: int,
    stack_size: int,
    block_batch: int = 8,
) -> jnp.ndarray:
    """x: (B, T, C); weight stacks: (L, K, C), (L, C), (L, C, C) x2.

    ``dilations`` lists every layer including the dilation-1
    preprocessor; layers 1.. are the stacks.  Returns (B, T, C)."""
    b, t, c = x.shape
    bt = min(block_batch, b)
    rem = (-b) % bt
    if rem:
        x = jnp.pad(x, ((0, rem), (0, 0), (0, 0)))
    bp = x.shape[0]
    pad_max = (kernel_size - 1) * max(dilations)
    kernel = functools.partial(
        _kernel,
        dilations=tuple(int(d) for d in dilations),
        kernel_size=kernel_size,
        stack_size=stack_size,
        pad_max=pad_max,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec((bt, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, t, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, t, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bt, pad_max + t, c), jnp.float32),
            pltpu.VMEM((bt, t, c), jnp.float32),
        ],
    )(x, dw_w, dw_b, pw1_w, pw1_b, pw2_w, pw2_b)
    return out[:b]


@functools.partial(
    jax.jit,
    static_argnames=("dilations", "kernel_size", "stack_size"),
)
def fused_mdtc_stream(
    x: jnp.ndarray,
    cache: jnp.ndarray,
    dw_w: jnp.ndarray,
    dw_b: jnp.ndarray,
    pw1_w: jnp.ndarray,
    pw1_b: jnp.ndarray,
    pw2_w: jnp.ndarray,
    pw2_b: jnp.ndarray,
    dilations: Tuple[int, ...],
    kernel_size: int,
    stack_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming fused forward: one chunk with carried context.

    cache: (L, B, pad_max, C) — per layer the last ``pad_max`` input
    frames seen by that layer (zeros at stream start; only the last
    ``(K-1)*dil_l`` are read).  Returns (y, new_cache); chunked calls
    equal ``fused_mdtc_forward`` on the concatenated input."""
    b, t, c = x.shape
    n_layers = len(dilations)
    pad_max = (kernel_size - 1) * max(dilations)
    kernel = functools.partial(
        _kernel_stream,
        dilations=tuple(int(d) for d in dilations),
        kernel_size=kernel_size,
        stack_size=stack_size,
        pad_max=pad_max,
    )
    out, new_cache = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, b, pad_max, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, pad_max + t, c), jnp.float32),
            pltpu.VMEM((b, t, c), jnp.float32),
        ],
    )(x, cache, dw_w, dw_b, pw1_w, pw1_b, pw2_w, pw2_b)
    return out, new_cache


def _kernel_stream(
    x_ref, cache_in_ref, dw_w_ref, dw_b_ref, pw1_w_ref, pw1_b_ref,
    pw2_w_ref, pw2_b_ref, out_ref, cache_out_ref, act_ref, acc_ref,
    *, dilations, kernel_size, stack_size, pad_max,
):
    _kernel(
        x_ref, dw_w_ref, dw_b_ref, pw1_w_ref, pw1_b_ref, pw2_w_ref,
        pw2_b_ref, out_ref, act_ref, acc_ref,
        dilations=dilations, kernel_size=kernel_size,
        stack_size=stack_size, pad_max=pad_max,
        cache_in_ref=cache_in_ref, cache_out_ref=cache_out_ref,
    )


from wekws_tpu.ops.fused_common import (  # noqa: E402
    fold_bn as _fold_bn,
    init_ring_cache as init_stream_cache,
)


def extract_mdtc_weights(mdtc_module, params, batch_stats):
    """Flax MDTC variables -> folded weight stacks for the kernel.

    Returns (dw_w, dw_b, pw1_w, pw1_b, pw2_w, pw2_b, dilations).
    Requires in_channels == res_channels (the factory always builds
    MDTC that way, kws_model.py:146-157)."""
    assert mdtc_module.in_channels == mdtc_module.res_channels
    names = ["preprocessor"] + [
        f"stack_{s}_block_{i}"
        for s in range(mdtc_module.stack_num)
        for i in range(mdtc_module.stack_size)
    ]
    dilations = [1] + [
        2 ** i
        for _ in range(mdtc_module.stack_num)
        for i in range(mdtc_module.stack_size)
    ]
    dw_w, dw_b, pw1_w, pw1_b, pw2_w, pw2_b = [], [], [], [], [], []
    for name in names:
        p = params[name]
        s = batch_stats[name]
        w, bias = _fold_bn(
            p["conv1"]["dw_conv"]["kernel"][:, 0, :],
            p["conv1"]["dw_conv"]["bias"],
            p["conv1"]["bn"], s["conv1"]["bn"],
        )
        dw_w.append(w)
        dw_b.append(bias)
        w, bias = _fold_bn(
            p["conv1"]["pw_conv"]["kernel"][0],
            p["conv1"]["pw_conv"]["bias"],
            p["bn1"], s["bn1"],
        )
        pw1_w.append(w)
        pw1_b.append(bias)
        w, bias = _fold_bn(
            p["conv2"]["kernel"][0], p["conv2"]["bias"], p["bn2"], s["bn2"],
        )
        pw2_w.append(w)
        pw2_b.append(bias)
    stack = lambda xs: jnp.asarray(np.stack(xs))  # noqa: E731
    return (
        stack(dw_w), stack(dw_b), stack(pw1_w), stack(pw1_b),
        stack(pw2_w), stack(pw2_b), tuple(dilations),
    )
