"""Single-block on-chip probe for ops/fused_mdtc_train.py.

Compiles ONE fused TCNBlock train fwd+bwd (Mosaic lowering, not
interpret mode) and times it against the XLA autodiff of the same
math, at the flagship shape.  Used to localize the full-step compile
OOM on the tunneled backend and to get per-block A/B numbers.

Usage: python tools/probe_fused_block.py [B] [n_blocks]
"""

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wekws_tpu.ops.fused_mdtc_train import fused_tcn_block_train


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    t, c, k, dilation = 198, 64, 5, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.bfloat16)
    params = {
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

    def loss_fused(params, x):
        y = x
        for i in range(n_blocks):
            y, _ = fused_tcn_block_train(
                y, params, k, dilation, 1e-5, 0, "bfloat16"
            )
        return jnp.sum(y.astype(jnp.float32) ** 2)

    # Each iteration updates params from the previous gradient (a tiny
    # SGD step): the remote backend dedups identical repeat
    # executions, so the loop must carry a data dependence to time
    # real steps.
    def sgd(params, x):
        g = jax.grad(loss_fused)(params, x)
        return jax.tree.map(lambda p, gg: p - 1e-9 * gg, params, g), g

    f = jax.jit(sgd)
    t0 = time.perf_counter()
    p_run, g = f(params, x)
    np.asarray(g["dw_bias"])
    print(f"fused compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        p_run, g = f(p_run, x)
    np.asarray(g["dw_bias"])  # real barrier: axon block_until_ready
    dt_f = (time.perf_counter() - t0) / iters  # is a no-op here
    print(f"fused step: {dt_f * 1e3:.3f} ms ({n_blocks} blocks)",
          flush=True)

    # XLA reference: same math via ExactBatchNorm's functional core
    from wekws_tpu.models.layers import _bn_train_apply

    def exact_bn(x, scale, bias):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=tuple(range(xf.ndim - 1)))
        var = jnp.mean(
            (xf - mean) ** 2, axis=tuple(range(xf.ndim - 1)))
        return _bn_train_apply(x, scale, bias, 1e-5, mean, var)

    def block_xla(params, x):
        xf = x.astype(jnp.float32)
        pad = (k - 1) * dilation
        xp = jnp.pad(xf, ((0, 0), (pad, 0), (0, 0)))
        u = sum(
            xp[:, pad - (k - 1 - tap) * dilation:][:, :t, :]
            * params["dw_kernel"][tap, 0]
            for tap in range(k)
        ) + params["dw_bias"]
        s0 = exact_bn(u, params["bn0_scale"], params["bn0_bias"])
        v = (s0.astype(jnp.bfloat16)
             @ params["pw1_kernel"].astype(jnp.bfloat16)).astype(
                 jnp.float32) + params["pw1_bias"]
        s1 = exact_bn(v, params["bn1_scale"], params["bn1_bias"])
        r = jax.nn.relu(s1)
        w = (r.astype(jnp.bfloat16)
             @ params["pw2_kernel"].astype(jnp.bfloat16)).astype(
                 jnp.float32) + params["pw2_bias"]
        s2 = exact_bn(w, params["bn2_scale"], params["bn2_bias"])
        return jax.nn.relu(s2 + xf).astype(x.dtype)

    def loss_xla(params, x):
        y = x
        for _ in range(n_blocks):
            y = block_xla(params, y)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def sgd_x(params, x):
        g = jax.grad(loss_xla)(params, x)
        return jax.tree.map(lambda p, gg: p - 1e-9 * gg, params, g), g

    fx = jax.jit(sgd_x)
    t0 = time.perf_counter()
    p_run, gx = fx(params, x)
    np.asarray(gx["dw_bias"])
    print(f"xla compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        p_run, gx = fx(p_run, x)
    np.asarray(gx["dw_bias"])
    dt_x = (time.perf_counter() - t0) / iters
    print(f"xla step:   {dt_x * 1e3:.3f} ms", flush=True)
    print(f"ratio fused/xla: {dt_f / dt_x:.3f}", flush=True)
    for name in ("dw_kernel", "pw1_kernel", "bn0_scale"):
        a, bb = np.asarray(g[name], np.float32), np.asarray(
            gx[name], np.float32)
        rel = np.max(np.abs(a - bb)) / (np.max(np.abs(bb)) + 1e-9)
        print(f"grad parity {name}: rel {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
