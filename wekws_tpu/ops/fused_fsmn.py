"""Pallas TPU kernel: whole-backbone fused FSMN forward.

Same design as ops/fused_mdtc.py for the second-most-served backbone:
XLA executes an N-layer FSMN as ~4N kernels (2 matmuls + 2 grouped
convs per layer) bouncing intermediates through HBM; here the ENTIRE
layer chain runs VMEM-resident for a tile of batch rows — per layer a
(B*T, linear) x (linear, proj) MXU matmul, ``lorder + rorder`` shifted
multiply-accumulates on the VPU (the memory taps,
reference fsmn.py:214-253 semantics via models/fsmn.py), and a
(B*T, proj) x (proj, linear) MXU matmul + ReLU.  The in/out linear
pairs stay outside (4 one-time matmuls XLA fuses fine).

Streaming cache layout matches the flax module: per layer the last
``P = (lorder-1)*lstride + rorder*rstride`` PROJECTED frames, stacked
to (L, B, P, proj_dim); chunked calls equal the whole-utterance
forward (the same property tests as the flax path).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_ref, cache_in_ref, proj_w_ref, wl_ref, wr_ref, aff_w_ref, aff_b_ref,
    out_ref, cache_out_ref, ext_ref, cur_ref,
    *, lorder: int, rorder: int, lstride: int, rstride: int,
    n_layers: int,
):
    b, t, ld = x_ref.shape
    pd = proj_w_ref.shape[2]
    pad = (lorder - 1) * lstride + rorder * rstride
    start = (lorder - 1) * lstride

    cur_ref[...] = x_ref[...]
    for layer in range(n_layers):
        # projection (no bias): MXU
        p = jnp.dot(
            cur_ref[...].reshape(b * t, ld),
            proj_w_ref[layer],
            preferred_element_type=jnp.float32,
        ).reshape(b, t, pd)
        ext_ref[:, 0:pad, :] = cache_in_ref[layer]
        ext_ref[:, pl.ds(pad, t), :] = p
        cache_out_ref[layer] = ext_ref[:, pl.ds(t, pad), :]
        # identity path aligned with the rorder-delayed output
        o = ext_ref[:, pl.ds(start, t), :]
        for tap in range(lorder):
            o = o + ext_ref[:, pl.ds(tap * lstride, t), :] * wl_ref[layer, tap]
        for tap in range(rorder):
            off = start + rstride + tap * rstride
            o = o + ext_ref[:, pl.ds(off, t), :] * wr_ref[layer, tap]
        # affine + ReLU: MXU
        y = jnp.maximum(
            jnp.dot(
                o.reshape(b * t, pd),
                aff_w_ref[layer],
                preferred_element_type=jnp.float32,
            )
            + aff_b_ref[layer],
            0.0,
        )
        cur_ref[...] = y.reshape(b, t, ld)
    out_ref[...] = cur_ref[...]


@functools.partial(
    jax.jit,
    static_argnames=("lorder", "rorder", "lstride", "rstride", "block_batch"),
)
def fused_fsmn_layers(
    x: jnp.ndarray,
    cache: jnp.ndarray,
    proj_w: jnp.ndarray,
    wl: jnp.ndarray,
    wr: jnp.ndarray,
    aff_w: jnp.ndarray,
    aff_b: jnp.ndarray,
    lorder: int,
    rorder: int,
    lstride: int = 1,
    rstride: int = 1,
    block_batch: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the full FSMN layer chain fused.

    Args:
        x: (B, T, linear_dim) — output of in_linear2+ReLU.
        cache: (L, B, P, proj_dim) carried context (zeros at start).
        proj_w: (L, linear_dim, proj_dim); wl: (L, lorder, proj_dim);
        wr: (L, max(rorder,1), proj_dim) (ignored when rorder == 0);
        aff_w: (L, proj_dim, linear_dim); aff_b: (L, linear_dim).
    Returns:
        (y (B, T, linear_dim), new_cache (L, B, P, proj_dim)).
    """
    b, t, ld = x.shape
    n_layers, _, pad, pd = cache.shape
    bt = min(block_batch, b)
    rem = (-b) % bt
    if rem:
        x = jnp.pad(x, ((0, rem), (0, 0), (0, 0)))
        cache = jnp.pad(cache, ((0, 0), (0, rem), (0, 0), (0, 0)))
    bp = x.shape[0]
    kernel = functools.partial(
        _kernel,
        lorder=lorder, rorder=rorder, lstride=lstride, rstride=rstride,
        n_layers=n_layers,
    )
    out, new_cache = pl.pallas_call(
        kernel,
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec((bt, t, ld), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, bt, pad, pd), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, t, ld), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, bt, pad, pd), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, t, ld), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, bp, pad, pd), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bt, pad + t, pd), jnp.float32),
            pltpu.VMEM((bt, t, ld), jnp.float32),
        ],
    )(x, cache, proj_w, wl, wr, aff_w, aff_b)
    return out[:b], new_cache[:, :b]


def init_fsmn_cache(
    n_layers: int, batch: int, pad: int, proj_dim: int
) -> jnp.ndarray:
    return jnp.zeros((n_layers, batch, pad, proj_dim), jnp.float32)


def extract_fsmn_weights(fsmn_module, params):
    """Flax FSMN variables -> stacked kernel weights + in/out linears.

    Returns (in1_w, in1_b, in2_w, in2_b, proj_w, wl, wr, aff_w, aff_b,
    out1_w, out1_b, out2_w, out2_b)."""
    n = fsmn_module.fsmn_layers
    proj_w, wl, wr, aff_w, aff_b = [], [], [], [], []
    for i in range(n):
        proj_w.append(params[f"layer_{i}_proj"]["kernel"])
        fb = params[f"layer_{i}_fsmn"]
        wl.append(fb["conv_left"]["kernel"][:, 0, :])
        if fsmn_module.rorder > 0:
            wr.append(fb["conv_right"]["kernel"][:, 0, :])
        else:
            wr.append(np.zeros((1, fsmn_module.proj_dim), np.float32))
        aff_w.append(params[f"layer_{i}_affine"]["kernel"])
        aff_b.append(params[f"layer_{i}_affine"]["bias"])
    stack = lambda xs: jnp.asarray(np.stack(xs))  # noqa: E731
    return (
        jnp.asarray(params["in_linear1"]["kernel"]),
        jnp.asarray(params["in_linear1"]["bias"]),
        jnp.asarray(params["in_linear2"]["kernel"]),
        jnp.asarray(params["in_linear2"]["bias"]),
        stack(proj_w), stack(wl), stack(wr), stack(aff_w), stack(aff_b),
        jnp.asarray(params["out_linear1"]["kernel"]),
        jnp.asarray(params["out_linear1"]["bias"]),
        jnp.asarray(params["out_linear2"]["kernel"]),
        jnp.asarray(params["out_linear2"]["bias"]),
    )


def fused_fsmn_forward(
    model_fsmn,
    params,
    x: jnp.ndarray,
    cache: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full FSMN forward (in/out linears in XLA, layer chain fused).

    x: (B, T, idim) features.  Returns (logits (B, T, odim),
    new_cache (L, B, P, proj_dim))."""
    (in1_w, in1_b, in2_w, in2_b, proj_w, wl, wr, aff_w, aff_b,
     out1_w, out1_b, out2_w, out2_b) = extract_fsmn_weights(
        model_fsmn, params
    )
    if cache is None:
        cache = init_fsmn_cache(
            model_fsmn.fsmn_layers, x.shape[0],
            model_fsmn.layer_padding, model_fsmn.proj_dim,
        )
    h = jnp.maximum((x @ in1_w + in1_b) @ in2_w + in2_b, 0.0)
    h, new_cache = fused_fsmn_layers(
        h, cache, proj_w, wl, wr, aff_w, aff_b,
        model_fsmn.lorder, model_fsmn.rorder,
        model_fsmn.lstride, model_fsmn.rstride,
    )
    y = (h @ out1_w + out1_b) @ out2_w + out2_b
    return y, new_cache
