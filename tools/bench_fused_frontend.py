"""On-chip validation + microbenchmark of the fused Pallas frontend.

Run on real TPU hardware (NOT under interpret mode):

    python tools/bench_fused_frontend.py

Checks, in order:
1. Mosaic compile + parity vs the XLA feature path (dither off) on
   the flagship fbank config — both paths are bf16_3x (HIGH) matmul
   chains, so the tolerance is that precision's error envelope.
2. In-kernel dither distribution: on an all-zero wave the features are
   a deterministic function of the dither noise alone, so the per-bin
   log-mel mean/std of the fused path (TPU PRNG + Box-Muller) must
   match the XLA path (jax.random.normal) on thousands of frames, and
   two different seeds must give different features.
3. Feature-pipeline latency, XLA vs fused, B=512 x 2 s (the bench
   shape), queued iterations / single block.

IMPORTANT methodology (PERF.md round 2): iterations must round-robin
over a pool of DISTINCT pre-committed input buffers — the axon tunnel
elides repeated identical dispatches, making same-buffer timings
wildly optimistic.

Train-step impact is measured separately via
``BENCH_FUSED_FRONTEND=1 python bench.py`` (safe: state changes every
step, so no dispatch is ever identical).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args_list, iters=30):
    """Time ``fn(wave, key) -> feats`` over a queued loop.

    r4 timing-method audit (PERF.md): on the axon backend
    ``block_until_ready`` is a no-op for plain-jit arrays, and
    identical repeat executions are deduplicated — cycling a small
    buffer pool is NOT enough once the pool wraps.  The loop threads
    a scalar derived from each output into the next input (a real
    data dependence that perturbs the wave by ~1e-6, timing-neutral)
    and ends with a host fetch."""
    import jax
    import jax.numpy as jnp

    def chained(w, k, eps):
        out = fn(w + eps, k)
        lead = jax.tree_util.tree_leaves(out)[0]
        return out, 1e-6 * lead.astype(jnp.float32).reshape(-1)[0]

    cf = jax.jit(chained)
    eps = jnp.float32(0.0)
    for a in args_list[:2]:
        out, eps = cf(*a, eps)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:1]
    start = time.perf_counter()
    for i in range(iters):
        out, eps = cf(*args_list[i % len(args_list)], eps)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:1]
    return (time.perf_counter() - start) / iters


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import DATASET_CONF
    from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline

    print("devices:", jax.devices())
    b, s = 512, 32000
    rng = np.random.default_rng(0)
    pool = 8
    waves_list = [
        jnp.asarray((rng.standard_normal((b, s)) * 1000).astype(np.float32))
        for _ in range(pool)
    ]
    keys = [jax.random.key(i, impl="rbg") for i in range(pool)]
    waves = waves_list[0]

    pipe_x = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=True)
    conf_f = {**DATASET_CONF, "fused_frontend": True}
    pipe_f = DeviceFeaturePipeline.from_conf(conf_f, training=True)

    # Parity runs both paths at matmul precision 'high' — the 5e-3
    # gate is that precision's error envelope.  (The promoted
    # DATASET_CONF uses precision 'default' = bf16_3x since r3, which
    # widens the XLA path's envelope to ~5e-2 and says nothing about
    # the fused kernel.)  Latency below benches the promoted config.
    hi_conf = {
        **DATASET_CONF,
        "fbank_conf": {**DATASET_CONF["fbank_conf"], "precision": "high"},
    }
    fe_x = DeviceFeaturePipeline.from_conf(hi_conf, training=True).extractor
    fe_f = DeviceFeaturePipeline.from_conf(
        {**hi_conf, "fused_frontend": True}, training=True).extractor

    # --- 1. parity, dither off (rng=None disables dither) ---
    fx = jax.jit(lambda w: fe_x(w, None, None)[0])
    ff = jax.jit(lambda w: fe_f(w, None, None)[0])
    a = np.asarray(fx(waves))
    bb = np.asarray(ff(waves))
    diff = np.max(np.abs(a - bb))
    print(f"parity (dither off): max|fused - xla| = {diff:.3e}")
    assert diff < 5e-3, diff

    # --- 2. dither distribution on zero waves ---
    zeros = jnp.zeros((64, s), jnp.float32)
    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    gx = jax.jit(lambda w, k: fe_x(w, None, k)[0])
    gf = jax.jit(lambda w, k: fe_f(w, None, k)[0])
    dx = np.asarray(gx(zeros, k1)).reshape(-1, 40)
    df1 = np.asarray(gf(zeros, k1)).reshape(-1, 40)
    df2 = np.asarray(gf(zeros, k2)).reshape(-1, 40)
    mean_gap = np.max(np.abs(dx.mean(0) - df1.mean(0)))
    std_ratio = np.max(np.abs(dx.std(0) / df1.std(0) - 1.0))
    seed_delta = np.max(np.abs(df1 - df2))
    n = dx.shape[0]
    print(
        f"dither dist over {n} frames: max per-bin mean gap "
        f"{mean_gap:.4f} (std {dx.std(0).mean():.3f}), "
        f"max std ratio dev {std_ratio:.4f}, seed delta {seed_delta:.3f}"
    )
    assert mean_gap < 5 * dx.std(0).mean() / np.sqrt(n), mean_gap
    assert std_ratio < 0.1, std_ratio
    assert seed_delta > 0.1, "different seeds must give different dither"

    # --- 3. pipeline latency (training mode: dither + spec_aug) ---
    lengths = jnp.full((b,), s, jnp.int32)
    px = jax.jit(lambda w, k: pipe_x(w, lengths, k)[0])
    pf = jax.jit(lambda w, k: pipe_f(w, lengths, k)[0])
    wk = list(zip(waves_list, keys))
    tx = timed(px, wk)
    tf = timed(pf, wk)
    print(
        f"pipeline B={b} 2s: xla {tx * 1e3:.3f} ms, "
        f"fused {tf * 1e3:.3f} ms ({tx / tf:.2f}x)"
    )


if __name__ == "__main__":
    main()
