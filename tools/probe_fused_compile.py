"""Per-kernel compile timing for ops/fused_mdtc_train.py on the real
backend — localizes which pallas_call stalls Mosaic.

Usage: python tools/probe_fused_compile.py [B] [stage...]
  stages: f1 f2 f3 f4 fwd bwd (default: f1 f2 f3 f4)
"""

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wekws_tpu.ops import fused_mdtc_train as fm


def timed(name, fn, *args):
    t0 = time.perf_counter()
    out = jax.jit(fn).lower(*args).compile()
    print(f"{name}: compile {time.perf_counter() - t0:.1f}s", flush=True)
    return out


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    stages = sys.argv[2:] or ["f1", "f2", "f3", "f4"]
    t, c, k, dilation = 198, 64, 5, 4
    pad = (k - 1) * dilation
    block_b = int(os.environ.get("PROBE_BLOCK", 0)) or fm._pick_block(b)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.bfloat16)
    p = {
        "dw_kernel": jnp.asarray(rng.standard_normal((k, 1, c)) * 0.1),
        "dw_bias": jnp.zeros((c,)),
        "bn0_scale": jnp.ones((c,)), "bn0_bias": jnp.zeros((c,)),
        "pw1_kernel": jnp.asarray(rng.standard_normal((c, c)) * 0.1),
        "pw1_bias": jnp.zeros((c,)),
        "bn1_scale": jnp.ones((c,)), "bn1_bias": jnp.zeros((c,)),
        "pw2_kernel": jnp.asarray(rng.standard_normal((c, c)) * 0.1),
        "pw2_bias": jnp.zeros((c,)),
        "bn2_scale": jnp.ones((c,)), "bn2_bias": jnp.zeros((c,)),
    }
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (b // block_b,)
    stat_out = [jax.ShapeDtypeStruct((1, c), jnp.float32)] * 2
    stat_spec = [fm._rep_spec((1, c))] * 2
    pad_scratch = pltpu.VMEM((block_b, pad + t, c), jnp.float32)
    acc_c = pltpu.VMEM((1, c), jnp.float32)
    dw_w = p["dw_kernel"][:, 0, :].astype(jnp.float32)
    dw_b = fm._row(p["dw_bias"])
    mdt = jnp.bfloat16

    if "f1" in stages:
        f1 = pl.pallas_call(
            functools.partial(fm._f1_kernel, k=k, dilation=dilation,
                              pad=pad, t=t),
            grid=grid,
            in_specs=[fm._row_spec(block_b, t, c), fm._rep_spec((k, c)),
                      fm._rep_spec((1, c))],
            out_specs=tuple(stat_spec),
            out_shape=tuple(stat_out),
            scratch_shapes=[pad_scratch, acc_c, acc_c],
        )
        timed("F1", f1, x, dw_w, dw_b)

    a0 = fm._row(p["bn0_scale"])
    c0 = fm._row(p["bn0_bias"])
    w1 = p["pw1_kernel"].astype(jnp.float32)
    b1 = fm._row(p["pw1_bias"])
    if "f2" in stages:
        f2 = pl.pallas_call(
            functools.partial(fm._f2_kernel, k=k, dilation=dilation,
                              pad=pad, t=t, mdt=mdt),
            grid=grid,
            in_specs=[fm._row_spec(block_b, t, c), fm._rep_spec((k, c)),
                      fm._rep_spec((1, c)), fm._rep_spec((1, c)),
                      fm._rep_spec((1, c)),
                      fm._rep_spec((c, c)), fm._rep_spec((1, c))],
            out_specs=tuple(stat_spec),
            out_shape=tuple(stat_out),
            scratch_shapes=[pad_scratch, acc_c, acc_c],
        )
        timed("F2", f2, x, dw_w, dw_b, a0, c0, w1, b1)

    if "f3" in stages:
        a1, c1 = a0, c0
        w2, b2 = w1, b1
        r_store = jnp.bfloat16
        f3 = pl.pallas_call(
            functools.partial(fm._f3_kernel, k=k, dilation=dilation,
                              pad=pad, t=t, mdt=mdt),
            grid=grid,
            in_specs=[fm._row_spec(block_b, t, c), fm._rep_spec((k, c)),
                      fm._rep_spec((1, c)), fm._rep_spec((1, c)),
                      fm._rep_spec((1, c)),
                      fm._rep_spec((c, c)), fm._rep_spec((1, c)),
                      fm._rep_spec((1, c)), fm._rep_spec((1, c)),
                      fm._rep_spec((c, c)), fm._rep_spec((1, c))],
            out_specs=(fm._row_spec(block_b, t, c),
                       fm._row_spec(block_b, t, c), *stat_spec),
            out_shape=(jax.ShapeDtypeStruct((b, t, c), r_store),
                       jax.ShapeDtypeStruct((b, t, c), jnp.float32),
                       *stat_out),
            scratch_shapes=[pad_scratch, acc_c, acc_c],
        )
        timed("F3", f3, x, dw_w, dw_b, a0, c0, w1, b1, a1, c1, w2, b2)

    if "f4" in stages:
        w_arr = jnp.asarray(
            rng.standard_normal((b, t, c)), jnp.float32)
        f4 = pl.pallas_call(
            fm._f4_kernel,
            grid=grid,
            in_specs=[fm._row_spec(block_b, t, c),
                      fm._row_spec(block_b, t, c),
                      fm._rep_spec((1, c)), fm._rep_spec((1, c))],
            out_specs=fm._row_spec(block_b, t, c),
            out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        )
        timed("F4", f4, w_arr, x, a0, c0)


if __name__ == "__main__":
    main()
