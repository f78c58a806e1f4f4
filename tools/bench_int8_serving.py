"""Int8 serving on the TPU path (r4 verdict item 6).

A/Bs the batched streaming artifact executor (export/jax_runtime.py)
in float32 vs static-int8 on the real chip, plus a numerics spot
check against the np interpreter (the C++ runtime's executable spec):

    cd examples/synthetic_ctc && \
    PYTHONPATH=/root/repo:$PYTHONPATH python \
        /root/repo/tools/bench_int8_serving.py \
        --float_dir exp/fsmn_ctc/export --int8_dir exp/fsmn_ctc/export_int8

Prints one JSON line per configuration: per-chunk step p50/p95 (ms),
aggregate realtime factor at the given stream count, and the max
|int8 - np-int8| posterior deviation (the DET-level gate itself is
tests/test_jax_runtime.py::test_int8_det_gate_via_jax + the existing
np/C++ gates in tests/test_export.py).

Timing method per PERF.md r4: data-dependent chunk feed, host-fetch
barrier each step (per-call BLOCKED timing — what a serving client
sees).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_runtime(name, model_dir, streams, chunk_frames, iters, dim):
    import jax

    from wekws_tpu.export.jax_runtime import JaxGraphRuntime

    rt = JaxGraphRuntime(model_dir)
    rng = np.random.default_rng(0)
    state = rt.init_state(streams)
    feats = rng.standard_normal(
        (streams, chunk_frames, dim)).astype(np.float32)
    # warm/compile
    out, state = rt.forward(feats, state)
    np.asarray(out).reshape(-1)[:1]
    times = []
    for i in range(iters):
        # fresh pseudo-features each chunk (cheap roll keeps a data
        # dependence without regenerating)
        feats = np.roll(feats, 1, axis=1)
        feats[:, 0, 0] = i
        t0 = time.perf_counter()
        out, state = rt.forward(feats, state)
        np.asarray(out).reshape(-1)[:1]
        times.append((time.perf_counter() - t0) * 1e3)
    times = np.asarray(times)
    # frame_shift 10 ms per model frame; with frame_skip folded into
    # the artifact's features the wall-audio per chunk is larger, but
    # we report MODEL-frame realtime (conservative)
    audio_ms = streams * chunk_frames * 10.0
    print(json.dumps({
        "bench": "int8_serving",
        "runtime": name,
        "streams": streams,
        "chunk_frames": chunk_frames,
        "step_p50_ms": round(float(np.percentile(times, 50)), 2),
        "step_p95_ms": round(float(np.percentile(times, 95)), 2),
        "rt_factor_at_p50": round(
            audio_ms / float(np.percentile(times, 50)), 1),
    }), flush=True)
    return rt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--float_dir", required=True)
    ap.add_argument("--int8_dir", required=True)
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    from wekws_tpu.export import GraphRuntime
    from wekws_tpu.export.jax_runtime import JaxGraphRuntime

    # input dim: from meta if present, else the first weight that
    # consumes buffer 0 (dense/conv W rows; cmvn mean length)
    rt0 = GraphRuntime(args.float_dir)
    dim = rt0.meta.get("input_dim")
    if not dim:
        for entry in rt0.ops:
            if entry["inputs"][0] != 0:
                continue
            for key in ("mean", "W", "Wl"):
                if isinstance(entry.get(key), dict):
                    shape = entry[key].get("shape") or \
                        entry[key].get("int8", {}).get("shape")
                    dim = shape[-2] if key == "W" and len(shape) > 1 \
                        else shape[-1]
                    break
            if dim:
                break
    dim = int(dim)
    bench_runtime("jax_f32", args.float_dir, args.streams, args.chunk,
                  args.iters, dim)
    bench_runtime("jax_int8", args.int8_dir, args.streams, args.chunk,
                  args.iters, dim)

    # numerics spot check vs the np interpreter (same artifact)
    rng = np.random.default_rng(3)
    probe = rng.standard_normal((60, dim)).astype(np.float32)
    np_rt = GraphRuntime(args.int8_dir)
    jx_rt = JaxGraphRuntime(args.int8_dir)
    a, _ = np_rt.forward(probe)
    b, _ = jx_rt.forward(probe)
    print(json.dumps({
        "bench": "int8_parity_vs_np",
        "max_abs_dev": float(np.abs(a - np.asarray(b)).max()),
    }), flush=True)


if __name__ == "__main__":
    main()
