"""Decode-path scaling: host StreamDetector loop vs on-device decode.

The batched serving step is model_dispatch + decode; host-mode decode
is a Python prefix beam + FSM per stream per frame (argsort(V) per
frame dominates at production vocab sizes), device-mode decode rides
inside the jitted step. This bench isolates the decode cost at varying
(streams, vocab) so the crossover is measured rather than guessed —
the synthetic_ctc end-to-end CLI comparison (V=7) sits far on the
host-friendly side and is NOT representative of production CTC models
(hi_xiaowen FSMN: V=2599 pinyin tokens, SURVEY.md §6).

Posteriors are trained-like: blank-dominant with sparse token spikes
(so beams do real work and detections occasionally fire). Device
timing threads state (dispatches differ step to step — elision-safe,
PERF.md methodology note) and round-robins distinct posterior buffers.

Usage: python tools/bench_device_decode.py [--streams 64 256] [--vocab 8 1000 3000]
Prints one JSON line per (streams, vocab): host_ms / device_ms per
8-frame step and the implied per-chip stream capacity at realtime.
"""

import argparse
import json
import time

import numpy as np


def trained_like_posteriors(rng, b, t, v, kw_tokens):
    probs = np.full((b, t, v), 0.001 / max(v - 1, 1), np.float32)
    probs[:, :, 0] = 1.0
    # sparse spikes: keyword tokens sometimes, random tokens sometimes
    for i in range(b):
        for t0 in range(0, t, 16):
            if rng.random() < 0.4:
                tok = (
                    int(rng.choice(kw_tokens))
                    if rng.random() < 0.5
                    else int(rng.integers(1, v))
                )
                probs[i, t0 : t0 + 2, 0] = 0.05
                probs[i, t0 : t0 + 2, tok] = 0.9
    probs /= probs.sum(-1, keepdims=True)
    return probs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, nargs="+", default=[64, 256])
    ap.add_argument("--vocab", type=int, nargs="+", default=[8, 1000, 3000])
    ap.add_argument("--step_frames", type=int, default=8)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--unroll", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wekws_tpu.decode.device_stream import (
        init_stream_state,
        make_keyword_arrays,
        stream_detect_step,
    )
    from wekws_tpu.runtime.keyword_spotter import StreamDetector

    kws = {
        "kw_a": {"token_id": (1, 2, 3), "token_str": "1 2 3"},
        "kw_b": {"token_id": (4, 5), "token_str": "4 5"},
    }
    fsm = dict(threshold=0.3, min_frames=2, max_frames=250,
               interval_frames=50)
    sf = args.step_frames
    rng = np.random.default_rng(0)

    def measure(v, b):
        kw_tok, kw_len, mask, _names = make_keyword_arrays(kws, v)
        idxset = {0, 1, 2, 3, 4, 5}
        if True:
            probs = trained_like_posteriors(
                rng, b, sf * args.steps, v, [1, 2, 3, 4, 5]
            )

            # ---- host decode loop (what BatchKeywordSpotter does
            # per step in host mode)
            dets = []
            for _ in range(b):
                d = StreamDetector(
                    fsm["threshold"], fsm["min_frames"],
                    fsm["max_frames"], fsm["interval_frames"],
                    3, 20, 0.01, 1,
                )
                d.set_tables(kws, idxset)
                dets.append(d)
            t0 = time.perf_counter()
            fired_host = 0
            for s in range(args.steps):
                lo = s * sf
                idx = np.arange(lo, lo + sf, dtype=np.int64)
                for i in range(b):
                    r = dets[i].process(idx, probs[i, lo : lo + sf])
                    fired_host += 1 if (r and r.get("state") == 1) else 0
            host_ms = (time.perf_counter() - t0) / args.steps * 1e3

            # ---- device decode (state-threaded, distinct buffers)
            step = jax.jit(
                lambda st, p, t0v: stream_detect_step(
                    st, p, jnp.ones((b,), bool), jnp.zeros((b,), bool),
                    t0v, jnp.asarray(kw_tok), jnp.asarray(kw_len),
                    jnp.asarray(mask), downsampling=1,
                    unroll=args.unroll, **fsm,
                )
            )
            state = init_stream_state(b)
            bufs = [
                jax.device_put(jnp.asarray(probs[:, s * sf : (s + 1) * sf]))
                for s in range(args.steps)
            ]
            jax.block_until_ready(bufs)
            # warm: one FULL discarded pass — compile alone is not
            # enough, the tunnel only pipelines an executable's
            # dispatches after sustained use (a 4-step warm still left
            # the first timed loop ~7x slower per step; measured)
            st = state
            for s in range(args.steps):
                st, ev = step(st, bufs[s],
                              jnp.full((b,), s * sf, jnp.int32))
            jax.block_until_ready(ev["fired"])
            st = init_stream_state(b)
            evs = []
            t0 = time.perf_counter()
            for s in range(args.steps):
                st, ev = step(
                    st, bufs[s],
                    jnp.full((b,), s * sf, jnp.int32),
                )
                evs.append(ev["fired"])
            fired_dev = int(sum(jnp.sum(e) for e in evs))
            dev_ms = (time.perf_counter() - t0) / args.steps * 1e3

            audio_s_per_step = b * sf * 0.01
            return {
                "streams": b, "vocab": v, "step_frames": sf,
                "host_ms": round(host_ms, 3),
                "device_ms": round(dev_ms, 3),
                "host_rt_capacity": round(
                    audio_s_per_step / (host_ms / 1e3), 1),
                "device_rt_capacity": round(
                    audio_s_per_step / (dev_ms / 1e3), 1),
                "fired_host": fired_host, "fired_device": fired_dev,
            }

    # sacrificial first measurement: the first timed loop in a fresh
    # process is ~7-15x slower per step regardless of config or warm
    # passes (tunnel session establishment; measured by reordering
    # configs) — reproduce "mid-process" conditions for every
    # REPORTED number by discarding one full measurement up front.
    measure(args.vocab[0], args.streams[0])
    for v in args.vocab:
        for b in args.streams:
            print(json.dumps(measure(v, b)))


if __name__ == "__main__":
    main()
