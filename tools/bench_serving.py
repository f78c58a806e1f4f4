"""Serving-latency benchmark: fused Pallas backbones vs the XLA path.

Measures the steady-state per-chunk latency of the streaming step
(the KeyWordSpotter hot loop) for the MDTC flagship and an FSMN
config, at typical serving batch sizes.  Queued timing (N calls, one
block) — see PERF.md round 2 on tunnel RTT.  Iterations round-robin a
pool of DISTINCT pre-committed input buffers: the tunnel elides
repeated identical dispatches (PERF.md round 2 methodology note), so
fixed-input timings are invalid.

Usage: python tools/bench_serving.py [--chunk 8] [--iters 50]
Prints one JSON line per (model, path, batch).
"""

import argparse
import json
import time


def queued_ms(fn, feats_pool, cache0, iters):
    """Time ``fn(feats, cache) -> (probs, cache)`` over a queued loop.

    The cache is threaded through the loop (real streaming behavior),
    which also defeats the axon backend's identical-execution dedup,
    and the loop ends with a host fetch of the last probs — on this
    backend ``jax.block_until_ready`` is a no-op for plain-jit arrays
    (PERF.md r4 'Timing-method audit'), so the earlier version of
    this helper timed only the enqueue."""
    import numpy as np

    cache = cache0
    for f in feats_pool[:2]:
        probs, cache = fn(f, cache)
    np.asarray(probs).reshape(-1)[:1]
    t0 = time.perf_counter()
    for i in range(iters):
        probs, cache = fn(feats_pool[i % len(feats_pool)], cache)
    np.asarray(probs).reshape(-1)[:1]
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 16])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wekws_tpu.models import init_model
    from wekws_tpu.ops.serving import build_fused_stream

    configs = {
        "mdtc": {
            "input_dim": 40, "output_dim": 1, "hidden_dim": 64,
            "preprocessing": {"type": "linear"},
            "backbone": {"type": "mdtc", "num_stack": 4, "stack_size": 4,
                         "kernel_size": 5, "hidden_dim": 64,
                         "causal": True},
        },
        "ds_tcn": {
            "input_dim": 40, "output_dim": 1, "hidden_dim": 64,
            "preprocessing": {"type": "linear"},
            "backbone": {"type": "tcn", "ds": True, "num_layers": 4,
                         "kernel_size": 8, "dropout": 0.0},
        },
        "fsmn": {
            "input_dim": 80, "output_dim": 8, "hidden_dim": 250,
            "preprocessing": {"type": "none"},
            "backbone": {"type": "fsmn", "input_affine_dim": 140,
                         "num_layers": 4, "linear_dim": 250,
                         "proj_dim": 128, "left_order": 10,
                         "right_order": 2, "left_stride": 1,
                         "right_stride": 1, "output_affine_dim": 140},
            "classifier": {"type": "identity", "dropout": 0.0},
            "activation": {"type": "identity"},
        },
    }
    for name, cfg in configs.items():
        model = init_model(cfg)
        x0 = jax.random.normal(
            jax.random.PRNGKey(0), (1, 20, cfg["input_dim"])
        )
        variables = model.init(jax.random.PRNGKey(1), x0)

        built = build_fused_stream(model, variables)
        assert built is not None, name
        step, init_cache = built

        @jax.jit
        def xla_step(feats, cache, model=model, variables=variables):
            return model.apply(variables, feats, cache=cache)

        for b in args.batches:
            pool = [
                jax.random.normal(
                    jax.random.PRNGKey(100 + i),
                    (b, args.chunk, cfg["input_dim"]),
                )
                for i in range(8)
            ]
            fused_ms = queued_ms(step, pool, init_cache(b), args.iters)
            xla_ms = queued_ms(
                xla_step, pool, model.init_cache(b), args.iters
            )
            print(json.dumps({
                "model": name, "batch": b, "chunk": args.chunk,
                "fused_ms": round(fused_ms, 3),
                "xla_ms": round(xla_ms, 3),
                "speedup": round(xla_ms / fused_ms, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
