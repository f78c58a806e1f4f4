"""KWS serving daemon CLI.

Binds the batched multi-stream engine (CTC beams, optionally
on-device decode, or max-pooling threshold detection) behind a
framed-TCP protocol (wekws_tpu/serving/protocol.py) so many network
clients share ONE jitted batched device program.

    python -m wekws_tpu.bin.serve \
        --config exp/config.yaml --checkpoint exp/final.ckpt \
        --token_file tokens.txt --keywords "hi xiaowen" \
        --port 8990 --streams 64 [--device_decode]

    python -m wekws_tpu.bin.serve --maxpool \
        --config exp/config.yaml --checkpoint exp/avg_5.ckpt \
        --threshold 0.5 --keywords wake --streams 64

Client side: ``wekws_tpu.serving.KwsClient`` (or any implementation
of the 5-byte-framed protocol).
"""

import argparse
import asyncio
import logging
import time


def get_args():
    parser = argparse.ArgumentParser(description="kws serving daemon")
    parser.add_argument("--config", required=True)
    parser.add_argument(
        "--checkpoint", required=True,
        help="flax checkpoint file, OR an exported artifact DIRECTORY "
             "(model.json + weights[.int8].bin) to serve a float or "
             "static-int8 artifact natively on the TPU")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8990)
    parser.add_argument("--streams", type=int, default=16)
    parser.add_argument("--step_frames", type=int, default=8)
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--maxpool", action="store_true",
                        help="max-pooling (sigmoid) model: threshold + "
                             "refractory detection instead of CTC beams")
    parser.add_argument("--token_file", default=None)
    parser.add_argument("--lexicon_file", default=None)
    parser.add_argument("--keywords", default=None)
    parser.add_argument("--min_frames", type=int, default=5)
    parser.add_argument("--max_frames", type=int, default=250)
    parser.add_argument("--interval_frames", type=int, default=50)
    parser.add_argument("--score_beam", type=int, default=3)
    parser.add_argument("--path_beam", type=int, default=20)
    parser.add_argument("--device_decode", action="store_true")
    parser.add_argument("--device_frontend", action="store_true",
                        help="featurize inside the batched device "
                             "dispatch (fbank+splice+skip); the host "
                             "only buffers raw samples per stream")
    parser.add_argument("--mesh_devices", type=int, default=0,
                        help="shard the stream axis over the first N "
                             "devices (0 = single device)")
    parser.add_argument("--compilation_cache_dir", default=None,
                        help="persistent XLA compilation cache: daemon "
                             "restarts reload compiled programs from "
                             "this directory instead of recompiling")
    parser.add_argument("--warmup", action="store_true",
                        help="compile the serving programs before the "
                             "port opens so the first clients never "
                             "pay the XLA compile")
    return parser.parse_args()


def warmup_engine(engine):
    """One full step + tail flush on slot 0: every later dispatch
    reuses the same fixed (streams, step_frames, dim) program, so this
    compiles the full serving surface (full step and padded flush share
    one jitted program — see _BatchedStreamEngine._run in
    wekws_tpu/runtime/batch_spotter.py).  Feeds silence until just past
    one step's worth of FEATURE frames (the frontend may splice and
    frame-skip, so samples->frames is not static arithmetic), keeping
    the flush to a couple of dispatches instead of a long serial drain.
    Stream state AND dispatch stats are cleared afterwards — the XLA
    compile lands inside the first dispatch's timing and would
    otherwise skew every later stats readout."""
    cfg = engine._frontend_args[0]
    chunk = bytes(
        2 * (cfg.frame_length + engine.step_frames * cfg.frame_shift)
    )
    while engine.pending_frames(0) <= engine.step_frames:
        engine.accept_wave(0, chunk)
    engine.step()
    engine.flush_stream(0)
    engine.reset_all()
    engine.stats = {
        k: type(v)() for k, v in engine.stats.items()
    }


def build_engine(args):
    import numpy as np

    # tolerate pre-device_frontend Namespace objects (tests build
    # their own argparse.Namespace)
    device_frontend = getattr(args, "device_frontend", False)

    from wekws_tpu.runtime import BatchKeywordSpotter, BatchMaxPoolSpotter

    mesh = None
    if args.mesh_devices:
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(
            np.asarray(jax.devices()[: args.mesh_devices]), ("streams",)
        )
    if args.maxpool:
        names = args.keywords.split(",") if args.keywords else None
        return BatchMaxPoolSpotter(
            args.checkpoint, args.config, args.threshold,
            num_streams=args.streams, step_frames=args.step_frames,
            interval_frames=args.interval_frames,
            keyword_names=names, mesh=mesh,
            device_frontend=device_frontend,
        )
    if not args.token_file or not args.keywords:
        raise SystemExit(
            "--token_file and --keywords are required in CTC mode"
        )
    engine = BatchKeywordSpotter(
        args.checkpoint, args.config, args.token_file,
        args.lexicon_file, args.threshold, num_streams=args.streams,
        step_frames=args.step_frames, min_frames=args.min_frames,
        max_frames=args.max_frames,
        interval_frames=args.interval_frames,
        score_beam=args.score_beam, path_beam=args.path_beam,
        device_decode=args.device_decode,
        device_frontend=device_frontend, mesh=mesh,
    )
    engine.set_keywords(args.keywords)
    return engine


def main():
    args = get_args()
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )
    from wekws_tpu.serving import KwsServer

    if args.compilation_cache_dir:
        from wekws_tpu.bin.common import enable_compilation_cache

        enable_compilation_cache(args.compilation_cache_dir)
    engine = build_engine(args)
    if args.warmup:
        logging.info("warmup: compiling serving programs...")
        t0 = time.perf_counter()
        warmup_engine(engine)
        logging.info("warmup done in %.1fs", time.perf_counter() - t0)
    server = KwsServer(engine, args.host, args.port)
    try:
        asyncio.run(server.serve_forever())
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
