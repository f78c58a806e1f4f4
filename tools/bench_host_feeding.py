"""Delivered end-to-end training throughput: real disk-backed corpus,
full host pipeline (wav IO -> [augmentation] -> bucketed batching ->
worker processes), real jitted train steps on the chip — the
'host-feeding gap' measurement (device-only bench.py rate vs what a
real epoch delivers).

Generates a 2-second-utterance corpus once (cached under --corpus_dir),
then times one epoch per (num_workers, aug) setting at the bench
model/batch (flagship MDTC, B=512) and reports delivered
audio-s/s/chip.

Usage:
    python tools/bench_host_feeding.py [--utts 8192] [--workers 0 8 16]
        [--aug none full]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000
UTT_SECONDS = 2.0


def ensure_corpus(corpus_dir: str, utts: int) -> str:
    """Synthesized 2 s wavs + data.list + noise/rir stores (cached)."""
    list_path = os.path.join(corpus_dir, "data.list")
    marker = os.path.join(corpus_dir, f".complete_{utts}")
    if os.path.exists(marker):
        return list_path
    from wekws_tpu.data.audio import write_wav
    from wekws_tpu.tools.make_blob import make_blob

    os.makedirs(os.path.join(corpus_dir, "wavs"), exist_ok=True)
    rng = np.random.default_rng(0)
    n_samples = int(SR * UTT_SECONDS)
    lines = []
    t = np.arange(n_samples) / SR
    for i in range(utts):
        freq = 400 + (i % 37) * 40
        wave = (0.25 * np.sin(2 * np.pi * freq * t)
                + 0.02 * rng.standard_normal(n_samples)).astype(np.float32)
        p = os.path.join(corpus_dir, "wavs", f"u{i}.wav")
        write_wav(p, wave, SR)
        lines.append(json.dumps({
            "key": f"u{i}", "txt": "0" if i % 2 == 0 else "-1",
            "wav": os.path.abspath(p), "duration": UTT_SECONDS,
        }))
    with open(list_path, "w") as f:
        f.write("\n".join(lines) + "\n")

    # small noise/rir stores for the aug=full setting
    scp = []
    for i in range(16):
        kind = "noise" if i % 2 == 0 else "music"
        w = (0.1 * rng.standard_normal(SR * 3)).astype(np.float32)
        p = os.path.join(corpus_dir, "wavs", f"{kind}_{i}.wav")
        write_wav(p, w, SR)
        scp.append(f"{kind}_{i} {p}")
    with open(os.path.join(corpus_dir, "noise.scp"), "w") as f:
        f.write("\n".join(scp) + "\n")
    make_blob(os.path.join(corpus_dir, "noise.scp"),
              os.path.join(corpus_dir, "noise_store"))
    scp = []
    for i in range(8):
        rir = np.zeros(3200, np.float32)
        rir[0] = 1.0
        rir[rng.integers(1, 3200, 40)] += 0.4 * rng.standard_normal(40)
        rir *= np.exp(-np.arange(3200) / (SR * 0.1))
        p = os.path.join(corpus_dir, "wavs", f"rir_{i}.wav")
        write_wav(p, rir, SR)
        scp.append(f"rir_{i} {p}")
    with open(os.path.join(corpus_dir, "rir.scp"), "w") as f:
        f.write("\n".join(scp) + "\n")
    make_blob(os.path.join(corpus_dir, "rir.scp"),
              os.path.join(corpus_dir, "rir_store"))
    open(marker, "w").close()
    return list_path


def run_host_only(list_path, corpus_dir, num_workers, aug, batch_size,
                  shm=True):
    """Host pipeline production rate alone (no device, no transfers)."""
    from wekws_tpu.data.dataset import init_dataset
    from wekws_tpu.data.loader import DataLoader

    conf = make_conf(corpus_dir, aug, batch_size)
    dataset = init_dataset(list_path, conf, split="train")
    loader = DataLoader(dataset, num_workers=num_workers, prefetch=8,
                        shm=shm)
    loader.set_epoch(0)
    for _ in loader:  # warm caches / spawn workers (consume fully)
        pass
    loader.set_epoch(1)
    audio_seconds, n = 0.0, 0
    start = time.perf_counter()
    for batch in loader:
        audio_seconds += float(batch["wave_lengths"].sum()) / SR
        n += 1
    elapsed = time.perf_counter() - start
    loader.close()
    rate = audio_seconds / elapsed
    print(f"HOST-ONLY workers={num_workers:3d} aug={aug:4s} "
          f"shm={int(shm)}: {n} batches -> {rate:8.0f} audio-s/s",
          flush=True)
    return rate


def run_h2d_only(list_path, corpus_dir, aug, batch_size):
    """Transfer rate: device_put pre-built batches (tunnel/PCIe bound)."""
    import jax

    from wekws_tpu.parallel import make_mesh, shard_batch

    conf = make_conf(corpus_dir, aug, batch_size)
    mesh = make_mesh()
    smax = conf["batch_conf"]["fixed_samples"]
    rng = np.random.default_rng(0)
    batch = {
        "waves": rng.standard_normal((batch_size, smax)).astype(np.float32),
        "wave_lengths": np.full((batch_size,), smax, np.int32),
        "target": np.zeros((batch_size,), np.int32),
        "target_lengths": np.ones((batch_size,), np.int32),
    }
    for _ in range(2):
        out = shard_batch(batch, mesh)
    jax.block_until_ready(out)
    n = 10
    start = time.perf_counter()
    for _ in range(n):
        out = shard_batch(batch, mesh)
        jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    mb = batch["waves"].nbytes / 1e6
    rate = batch_size * (smax / SR) * n / elapsed
    print(f"H2D-ONLY aug={aug:4s}: {mb:.0f} MB/batch, "
          f"{mb * n / elapsed:.0f} MB/s -> {rate:8.0f} audio-s/s",
          flush=True)
    return rate


def make_conf(corpus_dir, aug, batch_size):
    from __graft_entry__ import DATASET_CONF

    conf = {
        "filter_conf": {"max_length": 2048, "min_length": 0},
        "resample_conf": {"resample_rate": SR},
        **{k: v for k, v in DATASET_CONF.items()},
        "shuffle": True,
        "shuffle_conf": {"shuffle_size": 2000},
        # aug=full: speed 0.9 lengthens waves ~11%, so the fixed batch
        # width must cover it or those utterances get length-filtered
        "batch_conf": {"batch_size": batch_size,
                       "fixed_samples": int(SR * UTT_SECONDS
                                            * (1.12 if aug == "full"
                                               else 1.0))},
    }
    if aug == "full":
        conf["speed_perturb"] = True
        conf["noise_source"] = os.path.join(corpus_dir, "noise_store")
        conf["noise_prob"] = 0.6
        conf["reverb_source"] = os.path.join(corpus_dir, "rir_store")
        conf["reverb_prob"] = 0.4
    return conf


def run_epoch(list_path, corpus_dir, num_workers, aug, batch_size):
    import jax

    from __graft_entry__ import FLAGSHIP_MODEL_CONF
    from wekws_tpu.data.dataset import init_dataset
    from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline
    from wekws_tpu.data.loader import DataLoader
    from wekws_tpu.models import init_model
    from wekws_tpu.parallel import make_mesh
    from wekws_tpu.train import Executor, Trainer

    conf = make_conf(corpus_dir, aug, batch_size)
    mesh = make_mesh()
    model = init_model(dict(FLAGSHIP_MODEL_CONF, dtype="bfloat16"))
    pipeline = DeviceFeaturePipeline.from_conf(conf, training=True)
    cvp = DeviceFeaturePipeline.from_conf(conf, training=False)
    trainer = Trainer(model, pipeline, cvp, "max_pooling",
                      learning_rate=1e-3, grad_clip=5.0, min_duration=5)
    executor = Executor(trainer, mesh, log_interval=10**9)

    dataset = init_dataset(list_path, conf, split="train")
    loader = DataLoader(dataset, num_workers=num_workers, prefetch=8)
    loader.set_epoch(0)

    # warmup epoch 0: consume it FULLY (an abandoned worker epoch keeps
    # producing in the background and starves the timed epoch), build
    # state + compile on its first batch, warm the page cache
    state = None
    key = jax.random.key(1, impl="rbg")
    for batch in loader:
        if state is None:
            state = trainer.init_state(jax.random.PRNGKey(0), batch, mesh)
            db = executor._prepare(batch)
            for _ in range(2):
                state, metrics = trainer.train_step(state, db, key, 1e-3)
    if state is None:
        raise SystemExit(
            "configuration produced no batches (per-worker shards "
            "smaller than one batch all get dropped by drop_last) — "
            "lower --batch_size or --workers, or raise --utts"
        )
    jax.block_until_ready(metrics["loss"])

    loader.set_epoch(1)
    audio_seconds = 0.0
    n_batches = 0
    t_host = t_prep = t_step = 0.0
    start = time.perf_counter()
    it = executor._iterate(loader)
    while True:
        t0 = time.perf_counter()
        batch = next(it, None)
        t1 = time.perf_counter()
        if batch is None:
            break
        audio_seconds += float(batch["wave_lengths"].sum()) / SR
        db = executor._prepare(batch)
        t2 = time.perf_counter()
        state, metrics = trainer.train_step(state, db, key, 1e-3)
        t3 = time.perf_counter()
        t_host += t1 - t0
        t_prep += t2 - t1
        t_step += t3 - t2
        n_batches += 1
    t0 = time.perf_counter()
    jax.block_until_ready(metrics["loss"])
    t_step += time.perf_counter() - t0
    elapsed = time.perf_counter() - start
    loader.close()
    rate = audio_seconds / elapsed
    print(f"workers={num_workers:3d} aug={aug:4s}: {n_batches} steps, "
          f"{audio_seconds:.0f} audio-s in {elapsed:.1f}s -> "
          f"{rate:8.0f} audio-s/s/chip  "
          f"[host-wait {t_host:.1f}s, h2d/prep {t_prep:.1f}s, "
          f"step-dispatch {t_step:.1f}s]", flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus_dir", default="/tmp/host_feed_corpus")
    ap.add_argument("--utts", type=int, default=8192)
    ap.add_argument("--workers", type=int, nargs="+", default=[0, 4, 8, 16])
    ap.add_argument("--aug", nargs="+", default=["none", "full"])
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--mode", choices=["train", "host", "h2d"],
                    default="train")
    ap.add_argument("--no_shm", action="store_true")
    args = ap.parse_args()

    list_path = ensure_corpus(args.corpus_dir, args.utts)
    for aug in args.aug:
        if args.mode == "h2d":
            run_h2d_only(list_path, args.corpus_dir, aug, args.batch_size)
            continue
        for w in args.workers:
            if args.mode == "host":
                run_host_only(list_path, args.corpus_dir, w, aug,
                              args.batch_size, shm=not args.no_shm)
            else:
                run_epoch(list_path, args.corpus_dir, w, aug,
                          args.batch_size)


if __name__ == "__main__":
    main()
