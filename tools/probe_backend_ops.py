"""Backend op-pathology probe: measures the primitive costs that the
r4 device-aug work found to vary by 2-3 orders of magnitude on the
tunneled axon runtime (PERF.md r4 'Device-side augmentation').

Run on any new backend/runtime before writing compute-path code:

    python tools/probe_backend_ops.py

Prints ms per op (20 chained iterations, host-fetch barrier).  Known
results on the round-4 rig (1x v5e via axon):

    fast:  elementwise (90 GB/s), M-big matmuls (2-15 TF/s),
           contract-dim1 dot_general, scalar rng (rbg)
    slow:  gather/take_along_axis (~0.1 GB/s), transpose (~6 GB/s),
           lane-dim dynamic_slice (~0.3 GB/s), small-M wide-N matmul
           (0.34 TF/s at K=128), K<~512 picks, threefry rng (9x rbg),
           jnp.fft (UNIMPLEMENTED — aborts at execute)
"""

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    i0 = jnp.asarray(0.0)

    def timeit(name, f, iters=20):
        g = jax.jit(f)
        try:
            out = g(i0)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:1]
        except Exception as e:
            print(f"{name:44s}: FAILED ({str(e)[:60]})", flush=True)
            return
        t0 = time.perf_counter()
        for i in range(iters):
            out = g(i0 + i)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:1]
        print(f"{name:44s}: {(time.perf_counter()-t0)/iters*1e3:8.2f} ms",
              flush=True)

    x = jnp.asarray(rng.standard_normal((512, 65536)).astype(np.float32))
    timeit("elementwise tanh (512,65536)",
           lambda i: jnp.sum(jnp.tanh(x + i)))

    for m, k, n in [(512, 128, 65536), (512, 512, 65536),
                    (131072, 256, 256), (512, 50, 65536)]:
        a = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
        timeit(f"matmul ({m},{k})@({k},{n})",
               lambda i, a=a, b=b: jnp.sum((a + i) @ b))

    x3 = jnp.asarray(
        rng.standard_normal((512, 256, 155)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))
    timeit("transpose (512,256,155)",
           lambda i: jnp.sum(jnp.transpose(x3 + i, (0, 2, 1)) ** 2))
    timeit("dot_general contract-dim1 (swap)",
           lambda i: jnp.sum(jax.lax.dot_general(
               x3 + i, w, (((1,), (0,)), ((), ()))) ** 2))

    idx = jnp.asarray(rng.integers(0, 65536, (512, 32768)), jnp.int32)
    timeit("take_along_axis (512,32768)",
           lambda i: jnp.sum(jnp.take_along_axis(x + i, idx, axis=1)))
    timeit("lane dynamic_slice (512,32768)",
           lambda i: jnp.sum(jax.lax.dynamic_slice(
               x + i, (jnp.int32(0), (i.astype(jnp.int32) % 100)),
               (512, 32768))))

    kt = jax.random.PRNGKey(0)
    kr = jax.random.key(1, impl="rbg")
    timeit("randint threefry (512,)",
           lambda i: jax.random.randint(
               jax.random.fold_in(kt, i.astype(jnp.int32)),
               (512,), 0, 50))
    timeit("randint rbg (512,)",
           lambda i: jax.random.randint(
               jax.random.fold_in(kr, i.astype(jnp.int32)),
               (512,), 0, 50))
    timeit("jnp.fft.rfft (8,4096)",
           lambda i: jnp.sum(jnp.abs(jnp.fft.rfft(
               x[:8, :4096] + i, 8192))))


if __name__ == "__main__":
    main()
