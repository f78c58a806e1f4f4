"""Pallas TPU kernels: fused TCNBlock TRAINING step with EXACT BatchNorm.

The r3/r4 profiles localize the training step's cost to HBM-level
passes over the (B, T, C) activations: XLA schedules the block's ~10
ops as separate fusions and, above B~768, spills their working sets
(PERF.md r4 'VMEM pressure').  This module executes one whole TCNBlock
(reference math: /root/reference/wekws/model/mdtc.py:62-121)

    u  = dwconv_d(x)            # depthwise, k taps, dilation d, causal
    s0 = bn0(u)                 # exact global-batch statistics
    v  = s0 @ W1 + b1           # pointwise
    r  = relu(bn1(v))
    w  = r @ W2 + b2            # pointwise
    y  = relu(bn2(w) + x)       # residual

as a short sequence of Pallas kernels, each one pass over the batch
tiles with all per-tile intermediates VMEM-resident.  Exact BN forces
one global reduction barrier per BN layer; the barriers are separate
``pallas_call``s with cross-tile accumulation in VMEM scratch:

  forward   F1 read x        -> (su, suu)            bn0 stats
            F2 read x        -> (sv, svv)            bn1 stats (recompute u)
            F3 read x        -> write r, w; (sw,sww) bn2 stats
            F4 read w, x     -> write y
  backward  B1 read dy,w,x   -> (sg2, sg2w)          bn2 grad sums (+dgamma2/dbeta2)
            B2 read dy,w,x,r -> dW2, db2, (sds1, sds1v)   bn1 grad sums
            B3 read dy,w,x,r -> dW1, db1, (sds0, sds0u)   bn0 grad sums
            B4 read dy,w,x,r -> dWd, dbd, write dx

Backward recomputation is cheap by construction: ``u`` (and everything
derived from stored ``r``/``w``) is re-derived from ``x`` with the
k-tap depthwise FMA (VPU) — no matmul recompute; v-hat is recovered
algebraically from r where it matters (ds1 is zero exactly where
relu clipped, so (r - beta1)/gamma1 stands in for v-hat).

Gradients are mathematically the textbook exact-BN backward per layer
(the same formulas as layers.ExactBatchNorm), composed through the
block; parity with jax.grad of the unfused block is pinned in
tests/test_fused_train.py.

Sums are accumulated in f32; matmuls run on the MXU in bf16 inputs /
f32 accumulation except the stat-bearing reductions which stay f32.
"""

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


def _dw(x_pad_ref, dw_w, dw_b, t, k, dilation, pad):
    """Depthwise causal conv via k shifted FMAs over the padded tile.

    x_pad_ref: (bt, pad + t, C) VMEM ref (zeros in [0, pad)).
    Returns (bt, t, C) f32.
    """
    u = None
    for tap in range(k):
        off = pad - (k - 1 - tap) * dilation
        seg = x_pad_ref[:, pl.ds(off, t), :].astype(jnp.float32)
        term = seg * dw_w[tap]
        u = term if u is None else u + term
    return u + dw_b


def _fill_pad(x_ref, x_pad_ref, pad, t):
    x_pad_ref[:, 0:pad, :] = jnp.zeros(
        (x_ref.shape[0], pad, x_ref.shape[2]), x_pad_ref.dtype
    )
    x_pad_ref[:, pl.ds(pad, t), :] = x_ref[...].astype(x_pad_ref.dtype)


def _acc_begin(i, *refs):
    @pl.when(i == 0)
    def _():
        for ref in refs:
            ref[...] = jnp.zeros_like(ref)


def _acc_flush(i, pairs):
    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        for out_ref, acc_ref in pairs:
            out_ref[...] = acc_ref[...]


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------


def _f1_kernel(x_ref, dw_w_ref, dw_b_ref, su_ref, suu_ref,
               x_pad, acc_su, acc_suu, *, k, dilation, pad, t):
    i = pl.program_id(0)
    _acc_begin(i, acc_su, acc_suu)
    _fill_pad(x_ref, x_pad, pad, t)
    u = _dw(x_pad, dw_w_ref[...], dw_b_ref[...], t, k, dilation, pad)
    acc_su[...] += jnp.sum(u, axis=(0, 1)).reshape(1, -1)
    acc_suu[...] += jnp.sum(u * u, axis=(0, 1)).reshape(1, -1)
    _acc_flush(i, [(su_ref, acc_su), (suu_ref, acc_suu)])


def _f2_kernel(x_ref, dw_w_ref, dw_b_ref, a0_ref, c0_ref, w1_ref, b1_ref,
               sv_ref, svv_ref, x_pad, acc_sv, acc_svv,
               *, k, dilation, pad, t, mdt):
    i = pl.program_id(0)
    _acc_begin(i, acc_sv, acc_svv)
    _fill_pad(x_ref, x_pad, pad, t)
    u = _dw(x_pad, dw_w_ref[...], dw_b_ref[...], t, k, dilation, pad)
    s0 = u * a0_ref[...] + c0_ref[...]          # folded bn0 (exact)
    bt = x_ref.shape[0]
    c = x_ref.shape[2]
    v = jnp.dot(
        s0.reshape(bt * t, c).astype(mdt),
        w1_ref[...].astype(mdt),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...]
    acc_sv[...] += jnp.sum(v, axis=0).reshape(1, -1)
    acc_svv[...] += jnp.sum(v * v, axis=0).reshape(1, -1)
    _acc_flush(i, [(sv_ref, acc_sv), (svv_ref, acc_svv)])


def _f3_kernel(x_ref, dw_w_ref, dw_b_ref, a0_ref, c0_ref, w1_ref, b1_ref,
               a1_ref, c1_ref, w2_ref, b2_ref,
               r_ref, w_out_ref, sw_ref, sww_ref,
               x_pad, acc_sw, acc_sww, *, k, dilation, pad, t, mdt):
    i = pl.program_id(0)
    _acc_begin(i, acc_sw, acc_sww)
    _fill_pad(x_ref, x_pad, pad, t)
    u = _dw(x_pad, dw_w_ref[...], dw_b_ref[...], t, k, dilation, pad)
    s0 = u * a0_ref[...] + c0_ref[...]
    bt = x_ref.shape[0]
    c = x_ref.shape[2]
    v = jnp.dot(
        s0.reshape(bt * t, c).astype(mdt),
        w1_ref[...].astype(mdt),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...]
    s1 = v * a1_ref[...] + c1_ref[...]          # folded bn1
    r = jnp.maximum(s1, 0.0)
    w = jnp.dot(
        r.astype(mdt),
        w2_ref[...].astype(mdt),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...]
    r_ref[...] = r.reshape(bt, t, c).astype(r_ref.dtype)
    w_out_ref[...] = w.reshape(bt, t, c).astype(w_out_ref.dtype)
    acc_sw[...] += jnp.sum(w, axis=0).reshape(1, -1)
    acc_sww[...] += jnp.sum(w * w, axis=0).reshape(1, -1)
    _acc_flush(i, [(sw_ref, acc_sw), (sww_ref, acc_sww)])


def _f4_kernel(w_ref, x_ref, a2_ref, c2_ref, y_ref):
    s2 = w_ref[...].astype(jnp.float32) * a2_ref[...] + c2_ref[...]
    y_ref[...] = jnp.maximum(
        s2 + x_ref[...].astype(jnp.float32), 0.0
    ).astype(y_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _g2_of(dy_ref, w_ref, x_ref, a2_ref, c2_ref):
    """g2 = dy * relu'(s2 + x) (grad at the bn2 output, f32)."""
    s2 = w_ref[...].astype(jnp.float32) * a2_ref[...] + c2_ref[...]
    pre = s2 + x_ref[...].astype(jnp.float32)
    return dy_ref[...].astype(jnp.float32) * (pre > 0.0)


def _b1_kernel(dy_ref, w_ref, x_ref, a2_ref, c2_ref, mu2_ref, inv2_ref,
               sg_ref, sgw_ref, acc_sg, acc_sgw):
    i = pl.program_id(0)
    _acc_begin(i, acc_sg, acc_sgw)
    g2 = _g2_of(dy_ref, w_ref, x_ref, a2_ref, c2_ref)
    what = (w_ref[...].astype(jnp.float32) - mu2_ref[...]) * inv2_ref[...]
    acc_sg[...] += jnp.sum(g2, axis=(0, 1)).reshape(1, -1)
    acc_sgw[...] += jnp.sum(g2 * what, axis=(0, 1)).reshape(1, -1)
    _acc_flush(i, [(sg_ref, acc_sg), (sgw_ref, acc_sgw)])


def _dw_grad_of(g2, what, coef_ref, sg_ref, sgw_ref, n):
    """Exact-BN backward at bn2: dw = coef/N * (N*g2 - sg - what*sgw)."""
    return coef_ref[...] / n * (
        n * g2 - sg_ref[...] - what * sgw_ref[...]
    )


def _b2_kernel(dy_ref, w_ref, x_ref, r_ref,
               a2_ref, c2_ref, mu2_ref, inv2_ref, coef2_ref,
               sg_ref, sgw_ref, w2_ref, beta1_ref, gamma1_ref,
               dw2_ref, db2_ref, sds1_ref, sds1v_ref,
               acc_dw2, acc_db2, acc_sds1, acc_sds1v, *, n, mdt):
    i = pl.program_id(0)
    _acc_begin(i, acc_dw2, acc_db2, acc_sds1, acc_sds1v)
    g2 = _g2_of(dy_ref, w_ref, x_ref, a2_ref, c2_ref)
    wf = w_ref[...].astype(jnp.float32)
    what = (wf - mu2_ref[...]) * inv2_ref[...]
    dwg = _dw_grad_of(g2, what, coef2_ref, sg_ref, sgw_ref, n)
    bt, t, c = dy_ref.shape
    dwg2 = dwg.reshape(bt * t, c)
    r2 = r_ref[...].astype(jnp.float32).reshape(bt * t, c)
    acc_dw2[...] += jnp.dot(
        r2.T.astype(mdt), dwg2.astype(mdt),
        preferred_element_type=jnp.float32,
    )
    acc_db2[...] += jnp.sum(dwg2, axis=0).reshape(1, -1)
    dr = jnp.dot(
        dwg2.astype(mdt),
        w2_ref[...].T.astype(mdt),
        preferred_element_type=jnp.float32,
    )
    ds1 = dr * (r2 > 0.0)
    # v-hat where ds1 != 0: r = s1 = gamma1*vhat + beta1 there
    vhat = (r2 - beta1_ref[...]) / gamma1_ref[...]
    acc_sds1[...] += jnp.sum(ds1, axis=0).reshape(1, -1)
    acc_sds1v[...] += jnp.sum(ds1 * vhat, axis=0).reshape(1, -1)
    _acc_flush(i, [(dw2_ref, acc_dw2), (db2_ref, acc_db2),
                   (sds1_ref, acc_sds1), (sds1v_ref, acc_sds1v)])


def _b3_kernel(dy_ref, w_ref, x_ref, r_ref, dw_w_ref, dw_b_ref,
               a0_ref, c0_ref, mu0_ref, inv0_ref,
               a2_ref, c2_ref, mu2_ref, inv2_ref, coef2_ref,
               sg_ref, sgw_ref, w2_ref, b1_ref, mu1_ref, inv1_ref,
               coef1_ref, sds1_ref, sds1v_ref, w1_ref,
               dw1_ref, db1_ref, sds0_ref, sds0u_ref,
               x_pad, acc_dw1, acc_db1, acc_sds0, acc_sds0u,
               *, k, dilation, pad, t, n, mdt):
    i = pl.program_id(0)
    _acc_begin(i, acc_dw1, acc_db1, acc_sds0, acc_sds0u)
    g2 = _g2_of(dy_ref, w_ref, x_ref, a2_ref, c2_ref)
    wf = w_ref[...].astype(jnp.float32)
    what = (wf - mu2_ref[...]) * inv2_ref[...]
    dwg = _dw_grad_of(g2, what, coef2_ref, sg_ref, sgw_ref, n)
    bt, _, c = dy_ref.shape
    dwg2 = dwg.reshape(bt * t, c)
    r2 = r_ref[...].astype(jnp.float32).reshape(bt * t, c)
    dr = jnp.dot(
        dwg2.astype(mdt), w2_ref[...].T.astype(mdt),
        preferred_element_type=jnp.float32,
    )
    ds1 = dr * (r2 > 0.0)
    # recompute u, s0, v: the bn1 dx formula needs v-hat at EVERY
    # position (the broadcasted -sum terms), not just where relu
    # passed — r only recovers it where s1 > 0
    _fill_pad(x_ref, x_pad, pad, t)
    u = _dw(x_pad, dw_w_ref[...], dw_b_ref[...], t, k, dilation, pad)
    s0 = (u * a0_ref[...] + c0_ref[...]).reshape(bt * t, c)
    uhat = ((u - mu0_ref[...]) * inv0_ref[...]).reshape(bt * t, c)
    v = jnp.dot(
        s0.astype(mdt), w1_ref[...].astype(mdt),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...]
    vhat = (v - mu1_ref[...]) * inv1_ref[...]
    # exact-BN backward at bn1
    dv = coef1_ref[...] / n * (
        n * ds1 - sds1_ref[...] - vhat * sds1v_ref[...]
    )
    acc_dw1[...] += jnp.dot(
        s0.T.astype(mdt), dv.astype(mdt),
        preferred_element_type=jnp.float32,
    )
    acc_db1[...] += jnp.sum(dv, axis=0).reshape(1, -1)
    ds0 = jnp.dot(
        dv.astype(mdt), w1_ref[...].T.astype(mdt),
        preferred_element_type=jnp.float32,
    )
    acc_sds0[...] += jnp.sum(ds0, axis=0).reshape(1, -1)
    acc_sds0u[...] += jnp.sum(ds0 * uhat, axis=0).reshape(1, -1)
    _acc_flush(i, [(dw1_ref, acc_dw1), (db1_ref, acc_db1),
                   (sds0_ref, acc_sds0), (sds0u_ref, acc_sds0u)])


def _b4_kernel(dy_ref, w_ref, x_ref, r_ref, dw_w_ref, dw_b_ref,
               a0_ref, c0_ref, mu0_ref, inv0_ref,
               a2_ref, c2_ref, mu2_ref, inv2_ref, coef2_ref,
               sg_ref, sgw_ref, w2_ref, w1_ref, b1_ref, mu1_ref, inv1_ref,
               coef1_ref, sds1_ref, sds1v_ref,
               coef0_ref, sds0_ref, sds0u_ref,
               dx_ref, dwd_ref, dbd_ref,
               x_pad, du_pad, acc_dwd, acc_dbd,
               *, k, dilation, pad, t, n, mdt):
    i = pl.program_id(0)
    _acc_begin(i, acc_dwd, acc_dbd)
    g2 = _g2_of(dy_ref, w_ref, x_ref, a2_ref, c2_ref)
    wf = w_ref[...].astype(jnp.float32)
    what = (wf - mu2_ref[...]) * inv2_ref[...]
    dwg = _dw_grad_of(g2, what, coef2_ref, sg_ref, sgw_ref, n)
    bt, _, c = dy_ref.shape
    dwg2 = dwg.reshape(bt * t, c)
    r2 = r_ref[...].astype(jnp.float32).reshape(bt * t, c)
    dr = jnp.dot(
        dwg2.astype(mdt), w2_ref[...].T.astype(mdt),
        preferred_element_type=jnp.float32,
    )
    ds1 = dr * (r2 > 0.0)
    _fill_pad(x_ref, x_pad, pad, t)
    u = _dw(x_pad, dw_w_ref[...], dw_b_ref[...], t, k, dilation, pad)
    s0 = (u * a0_ref[...] + c0_ref[...]).reshape(bt * t, c)
    uhat = ((u - mu0_ref[...]) * inv0_ref[...]).reshape(bt * t, c)
    v = jnp.dot(
        s0.astype(mdt), w1_ref[...].astype(mdt),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...]
    vhat = (v - mu1_ref[...]) * inv1_ref[...]
    dv = coef1_ref[...] / n * (
        n * ds1 - sds1_ref[...] - vhat * sds1v_ref[...]
    )
    ds0 = jnp.dot(
        dv.astype(mdt), w1_ref[...].T.astype(mdt),
        preferred_element_type=jnp.float32,
    )
    du = (coef0_ref[...] / n * (
        n * ds0 - sds0_ref[...] - uhat * sds0u_ref[...]
    )).reshape(bt, t, c)
    # depthwise weight/bias grads: per-tap reduction against the
    # padded input
    for tap in range(k):
        off = pad - (k - 1 - tap) * dilation
        seg = x_pad[:, pl.ds(off, t), :].astype(jnp.float32)
        acc_dwd[tap, :] += jnp.sum(du * seg, axis=(0, 1))
    acc_dbd[...] += jnp.sum(du, axis=(0, 1)).reshape(1, -1)
    # dx: full correlation of du with the flipped taps (the transpose
    # of the causal conv), plus the residual-path g2.  Buffer layout:
    # du in [0, t), zeros in [t, t+pad) — forward u[t] += w[tap] *
    # x[t - (k-1-tap)*d]  =>  dx[t] += w[tap] * du[t + (k-1-tap)*d].
    du_pad[:, 0:t, :] = du
    du_pad[:, pl.ds(t, pad), :] = jnp.zeros((bt, pad, c), jnp.float32)
    dx = g2
    for tap in range(k):
        start = (k - 1 - tap) * dilation
        dx = dx + du_pad[:, pl.ds(start, t), :] * dw_w_ref[tap, :]
    dx_ref[...] = dx.astype(dx_ref.dtype)
    _acc_flush(i, [(dwd_ref, acc_dwd), (dbd_ref, acc_dbd)])


# ---------------------------------------------------------------------------
# pallas_call orchestration
# ---------------------------------------------------------------------------


def _row_spec(block_b, t, c):
    return pl.BlockSpec((block_b, t, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _rep_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _pick_block(b: int, cap: int = 16) -> int:
    """Batch-tile rows per grid step.  The cap is set by the 16 MB
    scoped-VMEM stack limit on v5e: the padded-input scratch plus the
    kernel's f32 temporaries cost ~300 KB/row at the flagship
    (T=198, C=64) shape, so 64 rows already OOMs the Mosaic compile
    (measured: 19.05M > 16M at bt=64, 38.32M at bt=128).  The chosen
    caps: 16 rows forward (this default) and 8 backward — the
    backward's 4 row-block inputs + ~8 f32 temporaries halve the
    budget again (see _block_bwd callers)."""
    blk = min(b, cap)
    while b % blk:
        blk -= 1
    return blk


def _row(v):
    return v.reshape(1, -1).astype(jnp.float32)


def _block_fwd_passes(x, p, *, k, dilation, eps, block_b,
                      mdt=jnp.float32):
    """Runs F1..F4; returns (y, saved) with saved = everything the
    backward needs (plus the batch stats for running-average updates)."""
    b, t, c = x.shape
    pad = (k - 1) * dilation
    n = float(b * t)
    grid = (b // block_b,)
    interp = _interpret()

    r_store = jnp.bfloat16 if mdt == jnp.bfloat16 else jnp.float32
    stat_out = [jax.ShapeDtypeStruct((1, c), jnp.float32)] * 2
    stat_spec = [_rep_spec((1, c))] * 2
    pad_scratch = pltpu.VMEM((block_b, pad + t, c), jnp.float32)
    acc_c = pltpu.VMEM((1, c), jnp.float32)

    dw_w = p["dw_kernel"][:, 0, :].astype(jnp.float32)   # (k, C)
    dw_b = _row(p["dw_bias"])

    su, suu = pl.pallas_call(
        functools.partial(_f1_kernel, k=k, dilation=dilation, pad=pad, t=t),
        grid=grid,
        in_specs=[_row_spec(block_b, t, c), _rep_spec((k, c)),
                  _rep_spec((1, c))],
        out_specs=tuple(stat_spec),
        out_shape=tuple(stat_out),
        scratch_shapes=[pad_scratch, acc_c, acc_c],
        interpret=interp,
    )(x, dw_w, dw_b)

    mu0 = su / n
    var0 = jnp.maximum(suu / n - mu0 * mu0, 0.0)
    inv0 = jax.lax.rsqrt(var0 + eps)
    a0 = _row(p["bn0_scale"]) * inv0
    c0 = _row(p["bn0_bias"]) - _row(p["bn0_scale"]) * inv0 * mu0

    w1 = p["pw1_kernel"].astype(jnp.float32)             # (C, C)
    b1 = _row(p["pw1_bias"])
    sv, svv = pl.pallas_call(
        functools.partial(_f2_kernel, k=k, dilation=dilation, pad=pad,
                          t=t, mdt=mdt),
        grid=grid,
        in_specs=[_row_spec(block_b, t, c), _rep_spec((k, c)),
                  _rep_spec((1, c)), _rep_spec((1, c)), _rep_spec((1, c)),
                  _rep_spec((c, c)), _rep_spec((1, c))],
        out_specs=tuple(stat_spec),
        out_shape=tuple(stat_out),
        scratch_shapes=[pad_scratch, acc_c, acc_c],
        interpret=interp,
    )(x, dw_w, dw_b, a0, c0, w1, b1)

    mu1 = sv / n
    var1 = jnp.maximum(svv / n - mu1 * mu1, 0.0)
    inv1 = jax.lax.rsqrt(var1 + eps)
    a1 = _row(p["bn1_scale"]) * inv1
    c1 = _row(p["bn1_bias"]) - _row(p["bn1_scale"]) * inv1 * mu1

    w2 = p["pw2_kernel"].astype(jnp.float32)
    b2 = _row(p["pw2_bias"])
    r, w, sw, sww = pl.pallas_call(
        functools.partial(_f3_kernel, k=k, dilation=dilation, pad=pad,
                          t=t, mdt=mdt),
        grid=grid,
        in_specs=[_row_spec(block_b, t, c), _rep_spec((k, c)),
                  _rep_spec((1, c)), _rep_spec((1, c)), _rep_spec((1, c)),
                  _rep_spec((c, c)), _rep_spec((1, c)),
                  _rep_spec((1, c)), _rep_spec((1, c)),
                  _rep_spec((c, c)), _rep_spec((1, c))],
        out_specs=(_row_spec(block_b, t, c), _row_spec(block_b, t, c),
                   *stat_spec),
        out_shape=(jax.ShapeDtypeStruct((b, t, c), r_store),
                   jax.ShapeDtypeStruct((b, t, c), jnp.float32),
                   *stat_out),
        scratch_shapes=[pad_scratch, acc_c, acc_c],
        interpret=interp,
    )(x, dw_w, dw_b, a0, c0, w1, b1, a1, c1, w2, b2)

    mu2 = sw / n
    var2 = jnp.maximum(sww / n - mu2 * mu2, 0.0)
    inv2 = jax.lax.rsqrt(var2 + eps)
    a2 = _row(p["bn2_scale"]) * inv2
    c2 = _row(p["bn2_bias"]) - _row(p["bn2_scale"]) * inv2 * mu2

    y = pl.pallas_call(
        _f4_kernel,
        grid=grid,
        in_specs=[_row_spec(block_b, t, c), _row_spec(block_b, t, c),
                  _rep_spec((1, c)), _rep_spec((1, c))],
        out_specs=_row_spec(block_b, t, c),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interp,
    )(w, x, a2, c2)

    saved = dict(
        x=x, r=r, w=w,
        mu0=mu0, inv0=inv0, mu1=mu1, inv1=inv1, mu2=mu2, inv2=inv2,
        a0=a0, c0=c0, a2=a2, c2=c2, b1=b1,
    )
    stats = dict(mu0=mu0[0], var0=var0[0], mu1=mu1[0], var1=var1[0],
                 mu2=mu2[0], var2=var2[0])
    return y, saved, stats


def _block_bwd_passes(p, saved, dy, *, k, dilation, eps, block_b,
                      mdt=jnp.float32):
    b, t, c = dy.shape
    pad = (k - 1) * dilation
    n = float(b * t)
    grid = (b // block_b,)
    interp = _interpret()
    x, r, w = saved["x"], saved["r"], saved["w"]
    a2, c2 = saved["a2"], saved["c2"]
    mu0, inv0 = saved["mu0"], saved["inv0"]
    mu2, inv2 = saved["mu2"], saved["inv2"]
    mu1, inv1 = saved["mu1"], saved["inv1"]
    a0, c0 = saved["a0"], saved["c0"]
    b1 = saved["b1"]

    dw_w = p["dw_kernel"][:, 0, :].astype(jnp.float32)
    dw_b = _row(p["dw_bias"])
    w1 = p["pw1_kernel"].astype(jnp.float32)
    w2 = p["pw2_kernel"].astype(jnp.float32)
    beta1 = _row(p["bn1_bias"])
    gamma1 = _row(p["bn1_scale"])
    coef2 = _row(p["bn2_scale"]) * inv2
    coef1 = _row(p["bn1_scale"]) * inv1
    coef0 = _row(p["bn0_scale"]) * inv0

    stat_spec = _rep_spec((1, c))
    stat_out = jax.ShapeDtypeStruct((1, c), jnp.float32)
    acc_c = pltpu.VMEM((1, c), jnp.float32)
    acc_cc = pltpu.VMEM((c, c), jnp.float32)
    pad_scratch = pltpu.VMEM((block_b, pad + t, c), jnp.float32)

    sg, sgw = pl.pallas_call(
        _b1_kernel,
        grid=grid,
        in_specs=[_row_spec(block_b, t, c)] * 3
        + [stat_spec] * 4,
        out_specs=(stat_spec, stat_spec),
        out_shape=(stat_out, stat_out),
        scratch_shapes=[acc_c, acc_c],
        interpret=interp,
    )(dy, w, x, a2, c2, mu2, inv2)

    dw2, db2, sds1, sds1v = pl.pallas_call(
        functools.partial(_b2_kernel, n=n, mdt=mdt),
        grid=grid,
        in_specs=[_row_spec(block_b, t, c)] * 4
        + [stat_spec] * 5
        + [stat_spec, stat_spec, _rep_spec((c, c)), stat_spec, stat_spec],
        out_specs=(_rep_spec((c, c)), stat_spec, stat_spec, stat_spec),
        out_shape=(jax.ShapeDtypeStruct((c, c), jnp.float32),
                   stat_out, stat_out, stat_out),
        scratch_shapes=[acc_cc, acc_c, acc_c, acc_c],
        interpret=interp,
    )(dy, w, x, r, a2, c2, mu2, inv2, coef2, sg, sgw, w2, beta1, gamma1)

    dw1, db1, sds0, sds0u = pl.pallas_call(
        functools.partial(_b3_kernel, k=k, dilation=dilation, pad=pad,
                          t=t, n=n, mdt=mdt),
        grid=grid,
        in_specs=[_row_spec(block_b, t, c)] * 4          # dy w x r
        + [_rep_spec((k, c)), stat_spec]                 # dw_w dw_b
        + [stat_spec] * 4                                # a0 c0 mu0 inv0
        + [stat_spec] * 5                                # a2 c2 mu2 inv2 coef2
        + [stat_spec, stat_spec]                         # sg sgw
        + [_rep_spec((c, c))]                            # w2
        + [stat_spec, stat_spec, stat_spec]              # b1 mu1 inv1
        + [stat_spec, stat_spec, stat_spec]              # coef1 sds1 sds1v
        + [_rep_spec((c, c))],                           # w1
        out_specs=(_rep_spec((c, c)), stat_spec, stat_spec, stat_spec),
        out_shape=(jax.ShapeDtypeStruct((c, c), jnp.float32),
                   stat_out, stat_out, stat_out),
        scratch_shapes=[pad_scratch, acc_cc, acc_c, acc_c, acc_c],
        interpret=interp,
    )(dy, w, x, r, dw_w, dw_b, a0, c0, mu0, inv0,
      a2, c2, mu2, inv2, coef2, sg, sgw, w2, b1, mu1, inv1,
      coef1, sds1, sds1v, w1)

    dx, dwd, dbd = pl.pallas_call(
        functools.partial(_b4_kernel, k=k, dilation=dilation, pad=pad,
                          t=t, n=n, mdt=mdt),
        grid=grid,
        in_specs=[_row_spec(block_b, t, c)] * 4          # dy w x r
        + [_rep_spec((k, c)), stat_spec]                 # dw_w dw_b
        + [stat_spec] * 4                                # a0 c0 mu0 inv0
        + [stat_spec] * 5                                # a2 c2 mu2 inv2 coef2
        + [stat_spec, stat_spec]                         # sg sgw
        + [_rep_spec((c, c)), _rep_spec((c, c))]         # w2 w1
        + [stat_spec, stat_spec, stat_spec]              # b1 mu1 inv1
        + [stat_spec, stat_spec, stat_spec]              # coef1 sds1 sds1v
        + [stat_spec, stat_spec, stat_spec],             # coef0 sds0 sds0u
        out_specs=(_row_spec(block_b, t, c), _rep_spec((k, c)), stat_spec),
        out_shape=(jax.ShapeDtypeStruct((b, t, c), dy.dtype),
                   jax.ShapeDtypeStruct((k, c), jnp.float32),
                   stat_out),
        scratch_shapes=[pad_scratch,
                        pltpu.VMEM((block_b, pad + t, c), jnp.float32),
                        pltpu.VMEM((k, c), jnp.float32), acc_c],
        interpret=interp,
    )(dy, w, x, r, dw_w, dw_b, a0, c0, mu0, inv0,
      a2, c2, mu2, inv2, coef2, sg, sgw, w2, w1, b1, mu1, inv1,
      coef1, sds1, sds1v, coef0, sds0, sds0u)

    # dgamma/dbeta for the three BNs from the same sums
    grads = {
        "dw_kernel": dwd[:, None, :].astype(p["dw_kernel"].dtype),
        "dw_bias": dbd[0].astype(p["dw_bias"].dtype),
        "pw1_kernel": dw1.astype(p["pw1_kernel"].dtype),
        "pw1_bias": db1[0].astype(p["pw1_bias"].dtype),
        "pw2_kernel": dw2.astype(p["pw2_kernel"].dtype),
        "pw2_bias": db2[0].astype(p["pw2_bias"].dtype),
        "bn2_scale": sgw[0], "bn2_bias": sg[0],
        "bn1_scale": sds1v[0], "bn1_bias": sds1[0],
        "bn0_scale": sds0u[0], "bn0_bias": sds0[0],
    }
    return dx, grads


# ---------------------------------------------------------------------------
# public op: custom-VJP fused block
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_tcn_block_train(
    x: jnp.ndarray,
    params: Dict[str, jnp.ndarray],
    kernel_size: int,
    dilation: int,
    eps: float = 1e-5,
    block_b: int = 0,
    precision: str = "float32",
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Fused training forward of one TCNBlock (exact batch-stats BN).

    Returns ``(y, stats)`` with stats = {mu0,var0,mu1,var1,mu2,var2}
    (f32, (C,)) for the caller's running-average updates (which are
    stop-gradient, as in flax BN).

    ``params`` keys: dw_kernel (k,1,C), dw_bias (C,), pw1_kernel (C,C),
    pw1_bias, bn0_scale/bn0_bias, bn1_*, bn2_*, pw2_kernel (C,C),
    pw2_bias.  Residual add requires in_channels == res_channels (the
    MDTC configuration; the flax block falls back to XLA otherwise).
    """
    y, _, stats = _block_fwd_passes(
        x, params, k=kernel_size, dilation=dilation, eps=eps,
        block_b=block_b or _pick_block(x.shape[0]),
        mdt=_mdt(precision),
    )
    return y, stats


def _mdt(precision: str):
    return jnp.bfloat16 if precision == "bfloat16" else jnp.float32


def _fused_fwd(x, params, kernel_size, dilation, eps, block_b,
               precision):
    blk = block_b or _pick_block(x.shape[0])
    y, saved, stats = _block_fwd_passes(
        x, params, k=kernel_size, dilation=dilation, eps=eps, block_b=blk,
        mdt=_mdt(precision),
    )
    return (y, stats), (params, saved)


def _fused_bwd(kernel_size, dilation, eps, block_b, precision,
               res, cts):
    dy, _ = cts  # running-stat updates are stop-gradient
    params, saved = res
    # backward kernels carry 4 row-block inputs + ~8 f32 temporaries
    # per row, so their VMEM-safe tile is half the forward's
    blk = block_b or _pick_block(dy.shape[0], cap=8)
    dx, grads = _block_bwd_passes(
        params, saved, dy, k=kernel_size, dilation=dilation, eps=eps,
        block_b=blk, mdt=_mdt(precision),
    )
    dparams = {k: grads[k].astype(params[k].dtype) for k in params}
    return dx, dparams


fused_tcn_block_train.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# flax integration: parameter shims with the exact TCNBlock tree
# ---------------------------------------------------------------------------

import flax.linen as nn  # noqa: E402


class _ConvParams(nn.Module):
    """Param holder matching a conv submodule's {kernel, bias} leaves
    (same names, shapes and initializers, so checkpoints and init RNG
    draws are identical to the unfused modules)."""

    kernel_shape: Tuple[int, ...]
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.kernel_shape
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )
        return kernel, bias


class _BNParams(nn.Module):
    """Param/stat holder matching ExactBatchNorm's variables."""

    features: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self, mu=None, var=None):
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,)
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        if mu is not None and not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mu
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return scale, bias


class _DSParams(nn.Module):
    """conv1 (DSDilatedConv1d) subtree: dw_conv + bn + pw_conv."""

    channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, stats=None):
        c, k = self.channels, self.kernel_size
        dw_k, dw_b = _ConvParams(
            (k, 1, c), c, name="dw_conv")()
        bn_s, bn_b = _BNParams(c, name="bn")(
            *(stats if stats is not None else (None, None))
        )
        pw_k, pw_b = _ConvParams((1, c, c), c, name="pw_conv")()
        return dw_k, dw_b, bn_s, bn_b, pw_k, pw_b


def fused_block_apply(block, x, train):
    """Run one TCNBlock training forward through the fused kernels.

    ``block`` is the flax TCNBlock (used only as the module scope);
    parameter declarations go through shim modules with the exact
    names/shapes/inits of the unfused submodules, so the variable tree
    (and checkpoints) are identical whichever path runs.
    """
    c = block.res_channels
    k = block.kernel_size
    precision = (
        "bfloat16" if block.dtype == jnp.bfloat16 else "float32"
    )

    # declare params first (and collect stats hooks to update after)
    ds = _DSParams(c, k, name="conv1")
    bn1 = _BNParams(c, name="bn1")
    bn2 = _BNParams(c, name="bn2")
    conv2 = _ConvParams((1, c, c), c, name="conv2")

    # first pass: read params without stat updates
    dw_k, dw_b, bn0_s, bn0_b, pw1_k, pw1_b = ds()
    bn1_s, bn1_b = bn1()
    bn2_s, bn2_b = bn2()
    pw2_k, pw2_b = conv2()
    params = {
        "dw_kernel": dw_k, "dw_bias": dw_b,
        "bn0_scale": bn0_s, "bn0_bias": bn0_b,
        "pw1_kernel": pw1_k[0], "pw1_bias": pw1_b,
        "bn1_scale": bn1_s, "bn1_bias": bn1_b,
        "pw2_kernel": pw2_k[0], "pw2_bias": pw2_b,
        "bn2_scale": bn2_s, "bn2_bias": bn2_b,
    }
    y, stats = fused_tcn_block_train(
        x, params, k, block.dilation, 1e-5, 0, precision
    )
    # running-average updates (stop-gradient, like flax BN)
    ds(stats=(jax.lax.stop_gradient(stats["mu0"]),
              jax.lax.stop_gradient(stats["var0"])))
    bn1(jax.lax.stop_gradient(stats["mu1"]),
        jax.lax.stop_gradient(stats["var1"]))
    bn2(jax.lax.stop_gradient(stats["mu2"]),
        jax.lax.stop_gradient(stats["var2"]))
    return y.astype(x.dtype)
