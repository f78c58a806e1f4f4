"""End-to-end benchmark of the KWS serving daemon (bin/serve.py path).

Starts a KwsServer in-process (same engine the CLI builds), connects N
concurrent socket clients each feeding a wav in realtime-agnostic
chunks, and reports detections + aggregate realtime factor.

    python tools/bench_serving_daemon.py --maxpool \
        --config exp/mdtc/config.yaml --checkpoint exp/mdtc/avg_5.ckpt \
        --threshold 0.5 --wav_paths data/test/test_*.wav --streams 8
"""

import argparse
import asyncio
import threading
import time


def _paced_worker_proc(host, port, wav_paths, repeat, chunk_ms, q):
    """A batch of paced realtime clients: threads inside one worker
    PROCESS. Client threads in the SERVER process thrash its GIL
    (measured 300 ms send lag at 64 streams); one process per client
    drowns a small host in interpreters (433 s wall for a 13 s run on
    4 cores). Paced threads sleep most of each 300 ms interval, so a
    few worker processes with a handful of threads each keep both the
    server and the host honest.

    Pacing: chunk k is sent at t0 + (k+1)*chunk_s — the moment its
    audio would have finished being captured. Detection latency for
    an event ending at audio time A is
    recv_time - (t0 + (floor(A/chunk_s)+1)*chunk_s): time from
    'triggering audio available' to 'event on the client'. Events are
    received via wait_events while pacing, so the send cadence does
    not quantize the measurement."""
    import threading as th

    import numpy as np

    from wekws_tpu.data.audio import read_wav
    from wekws_tpu.serving import KwsClient

    chunk_s = chunk_ms / 1000.0
    out = {}

    def one(j):
        wave, sr = read_wav(wav_paths[j])
        pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()
        pcm = pcm * max(repeat, 1)
        chunk = 2 * int(sr * chunk_ms / 1000)
        c = KwsClient(host, port, timeout=600)
        # spread client phases across the chunk period — synchronized
        # phases (every client's chunk landing in the same instant)
        # are an unrealistic worst case that serializes into periodic
        # bursts at the engine
        time.sleep(chunk_s * (j % 16) / 16.0)
        lats, nevents, max_lag = [], 0, 0.0
        t0 = time.time()

        def take(evs, sink):
            nonlocal nevents
            now = time.time()
            for e in evs:
                nevents += 1
                at = e.get("time", e.get("end"))
                if at is None:
                    continue
                avail = t0 + (int(at / chunk_s) + 1) * chunk_s
                sink.append(now - avail)

        for k, off in enumerate(range(0, len(pcm), chunk)):
            target = t0 + (k + 1) * chunk_s
            while True:
                rem = target - time.time()
                if rem <= 0:
                    break
                take(c.wait_events(rem), lats)
            now = time.time()
            if now > target:
                max_lag = max(max_lag, now - target)
            c.send_audio(pcm[off : off + chunk])
            take(c.poll_events(), lats)
        # events read during finish() are stamped after the EOS drain
        # (the shared teardown, not steady-state serving) — tracked
        # but excluded from the latency distribution
        teardown = []
        take(c.finish(), teardown)
        out[j] = (lats, nevents, max_lag, len(pcm) / 2 / sr,
                  len(teardown))

    threads = [
        th.Thread(target=one, args=(j,)) for j in range(len(wav_paths))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # always put SOMETHING, even if every client errored — the parent
    # blocks on q.get() per worker and would deadlock otherwise
    q.put((
        sum((out[j][0] for j in out), []),
        sum(out[j][1] for j in out),
        max((out[j][2] for j in out), default=0.0),
        sum(out[j][3] for j in out),
        sum(out[j][4] for j in out),
        len(wav_paths) - len(out),  # clients that failed
    ))


def _client_proc(host, port, wav_path, repeat, chunk, q):
    """One client in its own PROCESS (no GIL sharing with the server):
    streams a wav, returns (n_events, first_two_events)."""
    import numpy as np

    from wekws_tpu.data.audio import read_wav
    from wekws_tpu.serving import KwsClient

    wave, _sr = read_wav(wav_path)
    pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()
    pcm = pcm * max(repeat, 1)
    c = KwsClient(host, port, timeout=600)
    t_start = time.time()
    events = []
    for off in range(0, len(pcm), chunk):
        c.send_audio(pcm[off : off + chunk])
        events += c.poll_events()
    events += c.finish()
    q.put((len(events), events[:2], t_start, time.time()))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--maxpool", action="store_true")
    parser.add_argument("--token_file", default=None)
    parser.add_argument("--lexicon_file", default=None)
    parser.add_argument("--keywords", default=None)
    parser.add_argument("--device_decode", action="store_true")
    parser.add_argument("--wav_paths", nargs="+", required=True)
    parser.add_argument("--streams", type=int, default=8)
    parser.add_argument("--step_frames", type=int, default=8)
    parser.add_argument("--repeat", type=int, default=1)
    parser.add_argument("--chunk_ms", type=int, default=300)
    parser.add_argument("--warmup", action="store_true",
                        help="run one untimed client pass first so the "
                             "jitted step + flush programs compile "
                             "outside the measured window")
    parser.add_argument("--client_procs", action="store_true",
                        help="run each client in its own process "
                             "(spawn) instead of a thread — removes "
                             "client-side GIL contention from the "
                             "measurement")
    parser.add_argument("--paced", action="store_true",
                        help="clients send in REALTIME (chunk k is "
                             "sent when its audio would have finished "
                             "being captured) and the report is "
                             "detection latency p50/p90/p99 instead "
                             "of aggregate throughput — the "
                             "production serving metric")
    args = parser.parse_args()

    import numpy as np

    from wekws_tpu.bin.serve import build_engine
    from wekws_tpu.data.audio import read_wav
    from wekws_tpu.serving import KwsClient, KwsServer

    ns = argparse.Namespace(
        **{
            **vars(args),
            "streams": args.streams,
            "step_frames": args.step_frames,
            "min_frames": 5,
            "max_frames": 250,
            "interval_frames": 50,
            "score_beam": 3,
            "path_beam": 20,
            "mesh_devices": 0,
        }
    )
    server = KwsServer(build_engine(ns), "127.0.0.1", 0)

    started = threading.Event()
    loop_holder = {}

    def run():
        async def amain():
            loop_holder["loop"] = asyncio.get_running_loop()
            await server.start()
            started.set()
            try:
                await server._server.serve_forever()
            except asyncio.CancelledError:
                pass

        asyncio.run(amain())

    t = threading.Thread(target=run, daemon=True)
    t.start()
    started.wait(30)

    pcms = []
    sr = 16000
    for i in range(args.streams):
        wave, sr = read_wav(args.wav_paths[i % len(args.wav_paths)])
        pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()
        pcms.append(pcm * max(args.repeat, 1))
    chunk = 2 * int(sr * args.chunk_ms / 1000)

    def client(i, out):
        c = KwsClient("127.0.0.1", server.port, timeout=600)
        events = []
        for off in range(0, len(pcms[i]), chunk):
            c.send_audio(pcms[i][off : off + chunk])
            events += c.poll_events()
        events += c.finish()
        out[i] = events

    if args.warmup:
        wout = {}
        client(0, wout)
        print(f"warmup: {len(wout[0])} events")
        # the XLA compile landed inside the warmup client's dispatches;
        # clear the counters so the printed averages reflect steady state
        server.engine.stats = {
            k: type(v)() for k, v in server.engine.stats.items()
        }

    if args.paced:
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        q = ctx.Queue()
        n_workers = min(3, args.streams)  # leave a core for the server
        shards = [
            [args.wav_paths[i % len(args.wav_paths)]
             for i in range(args.streams) if i % n_workers == w]
            for w in range(n_workers)
        ]
        procs = [
            ctx.Process(
                target=_paced_worker_proc,
                args=("127.0.0.1", server.port, shard,
                      args.repeat, args.chunk_ms, q),
            )
            for shard in shards
        ]
        t0 = time.perf_counter()
        for p in procs:
            p.start()
        results = [q.get() for _ in range(n_workers)]
        for p in procs:
            p.join()
        wall = time.perf_counter() - t0
        import numpy as _np

        lats = _np.array(sorted(sum((r[0] for r in results), [])))
        nevents = sum(r[1] for r in results)
        max_lag = max(r[2] for r in results)
        audio_s = sum(r[3] for r in results)
        n_teardown = sum(r[4] for r in results)
        n_failed = sum(r[5] for r in results)
        if n_failed:
            print(f"WARNING: {n_failed} clients failed")
        if len(lats):
            q = _np.quantile(lats, [0.5, 0.9, 0.99]) * 1e3
            print(
                f"paced: {args.streams} realtime streams, "
                f"{audio_s:.0f} audio-s in {wall:.1f}s wall, "
                f"{nevents} events; steady-state detection latency "
                f"p50 {q[0]:.0f} ms, p90 {q[1]:.0f} ms, "
                f"p99 {q[2]:.0f} ms, max {lats[-1] * 1e3:.0f} ms; "
                f"max client send-lag {max_lag * 1e3:.0f} ms; "
                f"{n_teardown} events delivered during EOS teardown "
                f"(excluded)"
            )
        else:
            print("paced: no events fired")
        fut = asyncio.run_coroutine_threadsafe(
            server.stop(), loop_holder["loop"]
        )
        fut.result(10)
        return

    if args.client_procs:
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        q = ctx.Queue()
        procs = [
            ctx.Process(
                target=_client_proc,
                args=("127.0.0.1", server.port,
                      args.wav_paths[i % len(args.wav_paths)],
                      args.repeat, chunk, q),
            )
            for i in range(args.streams)
        ]
        for p in procs:
            p.start()
        # interpreter boot (~1 s/proc) is excluded: each client stamps
        # its own streaming window; wall = first send -> last finish
        results = [q.get() for _ in range(args.streams)]
        for p in procs:
            p.join()
        wall = max(r[3] for r in results) - min(r[2] for r in results)
        # queue order is completion order, NOT stream order — keys are
        # arrival ranks, so the sample prints below say "client", and
        # events are not attributed to a particular wav
        out = {i: r[1] for i, r in enumerate(results)}
        total_events = sum(r[0] for r in results)
    else:
        t0 = time.perf_counter()
        out = {}
        threads = [
            threading.Thread(target=client, args=(i, out))
            for i in range(args.streams)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.perf_counter() - t0
        total_events = sum(len(v) for v in out.values())

    audio_s = sum(len(p) for p in pcms) / 2 / sr
    label = "client" if args.client_procs else "stream"
    for i in sorted(out):
        for e in out[i][:2]:
            kw = e.get("keyword")
            when = e.get("time", e.get("start"))
            print(f"{label} {i}: {kw} at {when:.2f}s score {e['score']:.3f}")
    print(
        f"{args.streams} clients, {audio_s:.1f} audio-s, "
        f"{total_events} events in {wall:.2f}s "
        f"(aggregate {audio_s / wall:.1f}x realtime)"
    )
    s = server.stats
    if s["steps"]:
        print(
            f"server: {s['steps']} stepper steps, "
            f"{s['participants'] / s['steps']:.1f}/{args.streams} "
            f"avg participants, step {s['step_s']:.2f}s, "
            f"accept-wait {s['accept_s']:.2f}s "
            f"(handler-summed, incl. engine-thread queueing), "
            f"coalesce {s['coalesce_s']:.2f}s"
        )
    e = server.engine.stats
    if e["dispatches"]:
        print(
            f"engine: {e['dispatches']} dispatches, "
            f"{e['rows'] / e['dispatches']:.1f}/{args.streams} avg rows, "
            f"{e['frames']} stream-frames, "
            f"dispatch {e['dispatch_s']:.2f}s "
            f"({e['dispatch_s'] / e['dispatches'] * 1e3:.1f} ms avg)"
        )

    fut = asyncio.run_coroutine_threadsafe(
        server.stop(), loop_holder["loop"]
    )
    fut.result(10)


if __name__ == "__main__":
    main()
