"""Training-throughput benchmark (flagship MDTC wake-word config).

Measures steady-state jitted train-step throughput — on-device fbank +
spec_aug + MDTC forward/backward + Adam — in audio-seconds processed
per wall-clock second per chip.  This is the framework's north-star
metric (BASELINE.json): the reference publishes no throughput numbers
(SURVEY.md §6), so ``vs_baseline`` is reported against the target
recorded in BASELINE.json ("published" -> "train_audio_s_per_s_chip"),
defaulting to 1.0 on first measurement.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np


def barrier(x):
    """Timing barrier: fetch one element to host.

    On the tunneled axon backend ``jax.block_until_ready`` is a no-op
    for single-device (non-pjit) arrays (PERF.md r4 'Timing-method
    audit'); a host fetch of any element data-dependent on the last
    step is the only reliable way to drain the dispatch queue.  The
    fetched element rides the dependence chain, so one fetch at the
    end of a timed loop forces every enqueued step.
    """
    arr = np.asarray(x).reshape(-1)
    return arr[:1]


def bench_ctc(n_devices, mesh):
    """CTC training throughput at the reference's production FSMN-CTC
    shape (hi_xiaowen conf/fsmn_ctc.yaml: 80-mel + splice(2,2) +
    frame_skip 3 -> 400-dim input, 4-layer FSMN, char vocab) —
    BENCH_CRITERION=ctc.  Prints the same JSON line."""
    import time

    import jax

    from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline
    from wekws_tpu.models import init_model
    from wekws_tpu.parallel import shard_batch
    from wekws_tpu.train import Trainer

    dataset_conf = {
        "feats_type": "fbank",
        "fbank_conf": {"num_mel_bins": 80, "frame_shift": 10,
                       "frame_length": 25, "dither": 1.0,
                       "dither_mode": "wave", "precision": "default"},
        "context_expansion": True,
        "context_expansion_conf": {"left": 2, "right": 2},
        "frame_skip": 3,
        "spec_aug": True,
        "spec_aug_conf": {"num_t_mask": 1, "num_f_mask": 1,
                          "max_t": 20, "max_f": 10},
    }
    vocab = int(os.environ.get("BENCH_CTC_VOCAB", 2599))
    model_conf = {
        "input_dim": 400, "output_dim": vocab, "hidden_dim": 128,
        "dtype": os.environ.get("BENCH_DTYPE", "bfloat16"),
        "preprocessing": {"type": "none"},
        "backbone": {"type": "fsmn", "input_affine_dim": 140,
                     "num_layers": 4, "linear_dim": 250,
                     "proj_dim": 128, "left_order": 10,
                     "right_order": 2, "left_stride": 1,
                     "right_stride": 1, "output_affine_dim": 140},
        "classifier": {"type": "identity", "dropout": 0.1},
        "activation": {"type": "identity"},
    }
    model = init_model(model_conf)
    pipeline = DeviceFeaturePipeline.from_conf(dataset_conf, training=True)
    cvp = DeviceFeaturePipeline.from_conf(dataset_conf, training=False)
    trainer = Trainer(model, pipeline, cvp, "ctc", learning_rate=1e-3,
                      grad_clip=5.0)

    b = int(os.environ.get("BENCH_BATCH_PER_CHIP", 256)) * n_devices
    seconds = 2.0
    s = int(16000 * seconds)
    u = 6
    rng = np.random.default_rng(0)
    batch = {
        "waves": (rng.standard_normal((b, s)) * 1000).astype(np.float32),
        "wave_lengths": np.full((b,), s, np.int32),
        "target": rng.integers(1, vocab, (b, u)).astype(np.int32),
        "target_lengths": np.full((b,), u, np.int32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch, mesh)
    db = shard_batch(batch, mesh)
    key = jax.random.key(1, impl="rbg")
    for _ in range(2):
        state, metrics = trainer.train_step(state, db, key, 1e-3)
    barrier(metrics["loss"])
    iters = int(os.environ.get("BENCH_ITERS", 100))
    start = time.perf_counter()
    for _ in range(iters):
        state, metrics = trainer.train_step(state, db, key, 1e-3)
    barrier(metrics["loss"])
    elapsed = time.perf_counter() - start
    value = b * seconds * iters / elapsed / n_devices
    record = {
        "metric": "ctc_train_audio_seconds_per_s_per_chip",
        "value": round(value, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": 1.0,
    }
    if not os.environ.get("BENCH_NO_ROOFLINE"):
        record.update(roofline(
            trainer._train_step_impl,
            (state, db, key, jnp_lr(1e-3)),
            elapsed / iters, n_devices,
        ))
    print(json.dumps(record))


def bench_epoch(n_devices, mesh):
    """Full-epoch training rate INCLUDING data delivery
    (BENCH_MODE=epoch): host-built int16 corpus -> one-time staging
    H2D -> device-resident epochs (per-epoch shuffle + gather + fbank +
    train on device, zero per-step H2D).  The staging cost is charged
    against the timed epochs (conservative: real runs amortize it over
    all of training).  Prints the same JSON line with a components
    breakdown."""
    import jax

    from __graft_entry__ import DATASET_CONF, FLAGSHIP_MODEL_CONF
    from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline
    from wekws_tpu.data.resident import stage_arrays
    from wekws_tpu.models import init_model
    from wekws_tpu.train import Executor, Trainer

    model_conf = dict(FLAGSHIP_MODEL_CONF)
    model_conf["dtype"] = os.environ.get("BENCH_DTYPE", "bfloat16")
    if model_conf["dtype"] == "bfloat16":
        model_conf["backbone"] = {
            **model_conf["backbone"], "bn_dtype": "bfloat16",
        }
    model = init_model(model_conf)
    pipeline = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=True)
    cvp = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=False)
    trainer = Trainer(model, pipeline, cvp, "max_pooling",
                      learning_rate=1e-3, grad_clip=5.0, min_duration=5)

    n_utts = int(os.environ.get("BENCH_EPOCH_UTTS", 8192)) * n_devices
    seconds = float(os.environ.get("BENCH_UTT_SECONDS", 2.0))
    if os.environ.get("BENCH_DEVICE_AUG"):
        # full waveform-augmentation chain inside the step
        # (speed perturb + RIR reverb + SNR noise mixing,
        # data/device_aug.py) from realistic synthetic banks:
        # 50 noise clips up to 10 s, 20 RIRs of 0.25 s
        import jax.numpy as jnp

        from wekws_tpu.data.device_aug import DeviceWaveAug, MatmulFFT

        arng = np.random.default_rng(7)
        s_in = int(16000 * seconds)
        out_len = int(np.ceil(s_in / 0.9))
        n_rows = 400  # 50 noise clips x 8 crop variants
        bank = np.zeros((512, out_len), np.float32)
        bank[:n_rows] = (arng.standard_normal((n_rows, out_len))
                         * 300).astype(np.float32)
        rirs = arng.standard_normal((20, 4000))
        rirs /= np.sqrt((rirs ** 2).sum(1, keepdims=True))
        # r5 production layout (PERF.md r5 'Device-aug chain',
        # 44.6k -> 80.4k delivered): full-utterance HERMITIAN DFT on
        # lane-aligned factors, 1-pass bf16 matmuls, bf16 banks,
        # NWC-conv + group-partitioned speed.  BENCH_AUG_PRECISION /
        # BENCH_AUG_DTYPE / BENCH_AUG_BLOCKED reproduce the
        # alternatives (the overlap-save block variant measured
        # slower in-chain here - framing passes outweigh its smaller
        # pick).
        prec = os.environ.get("BENCH_AUG_PRECISION", "default")
        adt = os.environ.get("BENCH_AUG_DTYPE", "bfloat16")
        if os.environ.get("BENCH_AUG_BLOCKED"):
            fft = MatmulFFT.for_block(4000, precision=prec, dtype=adt)
            rir_len = 4000
        else:
            fft = MatmulFFT.for_length(out_len + 4000 - 1,
                                       precision=prec, dtype=adt)
            rir_len = 0
        spec = np.zeros((512, fft.nh), np.complex64)
        for i in range(20):
            spec[i] = fft.spectrum_mat_half(rirs[i]).reshape(-1)
        pipeline.wave_aug = DeviceWaveAug(
            speed_perturb=True, speeds=(0.9, 1.0, 1.1),
            fft=fft,
            rir_re=jnp.asarray(spec.real, adt),
            rir_im=jnp.asarray(spec.imag, adt),
            n_rirs=20, reverb_prob=0.5,
            noise_rows=jnp.asarray(bank, adt),
            snr_lo=jnp.zeros((512,), np.float32),
            snr_hi=jnp.full((512,), 15.0, np.float32),
            n_noise_rows=n_rows, noise_prob=0.8,
            power_scale=1.0 / 32768.0,
            rir_len=rir_len, precision=prec,
        )
    epochs = int(os.environ.get("BENCH_EPOCH_EPOCHS", 25))
    batch = int(os.environ.get("BENCH_BATCH_PER_CHIP", 512)) * n_devices
    s = int(16000 * seconds)
    rng_np = np.random.default_rng(0)
    arrays = {
        "waves": rng_np.integers(-1000, 1000, (n_utts, s)).astype(np.int16),
        "wave_lengths": np.full((n_utts,), s, np.int32),
        "target": (np.arange(n_utts) % 2 - 1).astype(np.int32),
        "target_lengths": np.ones((n_utts,), np.int32),
    }

    # One-time staging.  Tunnel device_put is LAZY (PERF.md r5
    # 'Lazy-upload discovery'): the enqueue returns in ~0.5 s while
    # the true ~30-45 MB/s upload is forced by the first consuming
    # program.  stage_arrays therefore forces the upload on a
    # background thread that runs WHILE the warmup epoch compiles
    # (measured concurrent), and the staging CHARGE is the enqueue
    # plus any upload time sticking out past the one-time
    # compile/warmup phase a real run pays anyway.
    t0 = time.perf_counter()
    corpus = stage_arrays(arrays, mesh=mesh)
    enqueue_s = time.perf_counter() - t0

    example = {k: v[:batch] for k, v in corpus.arrays.items()}
    state = trainer.init_state(jax.random.PRNGKey(0), example, mesh)
    executor = Executor(trainer, mesh, log_interval=10**9)
    rng = jax.random.key(1, impl="rbg")

    # warmup epoch: compiles the resident train step (excluded, like
    # the resident-batch bench's warmup steps)
    t0 = time.perf_counter()
    state, _ = executor.train_resident(state, corpus, rng, 1e-3, 0, batch)
    warmup_s = time.perf_counter() - t0
    t_w1 = time.perf_counter()
    upload_s = corpus.wait_uploaded()
    overhang_s = max(0.0, time.perf_counter() - t_w1)
    stage_s = enqueue_s + overhang_s

    audio = 0.0
    t0 = time.perf_counter()
    for epoch in range(1, epochs + 1):
        state, summary = executor.train_resident(
            state, corpus, rng, 1e-3, epoch, batch, sync=False
        )
        audio += summary["batches"] * batch * seconds
    barrier(jax.tree.leaves(state.params)[0])
    train_s = time.perf_counter() - t0

    value = audio / (train_s + stage_s) / n_devices
    baseline = None
    try:
        with open(os.path.join(os.path.dirname(__file__),
                               "BASELINE.json")) as f:
            baseline = json.load(f).get("published", {}).get(
                "train_audio_s_per_s_chip")
    except Exception:
        pass
    print(json.dumps({
        "metric": "epoch_train_audio_seconds_per_s_per_chip",
        "value": round(value, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value / baseline, 3) if baseline else 1.0,
        "stage_s": round(stage_s, 3),
        "stage_enqueue_s": round(enqueue_s, 3),
        "stage_upload_s": round(upload_s, 3) if upload_s else None,
        "stage_overhang_s": round(overhang_s, 3),
        "warmup_s": round(warmup_s, 3),
        "train_s": round(train_s, 3),
        "epochs": epochs,
        "corpus_audio_s": round(corpus.audio_seconds, 1),
        "device_only_rate": round(audio / train_s / n_devices, 2),
    }))


def roofline(fn, args, step_seconds, n_devices):
    """XLA cost-model roofline for a compiled step: analytical FLOPs /
    bytes from compiled.cost_analysis(), achieved TFLOP/s and fraction
    of chip peak (VERDICT r3 item 3: an absolute yardstick, not
    vs_baseline).  Peaks: v5e bf16 197 TFLOP/s, 819 GB/s HBM
    (public TPU v5e specs); other chips fall back to flops-only."""
    import jax

    peaks = {  # (bf16 TFLOP/s, HBM GB/s) per jax device_kind
        "TPU v5 lite": (197.0, 819.0),
        "TPU v5": (459.0, 1228.0),
        "TPU v4": (275.0, 1228.0),
    }
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        bytes_accessed = float(cost.get("bytes accessed", 0.0))
    except Exception:
        return {}
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in peaks.items() if kind.startswith(k)), None)
    out = {
        "step_gflops": round(flops / 1e9 / n_devices, 2),
        # cost-model bytes: every buffer access, including VMEM-resident
        # reuse inside fusions — an UPPER BOUND on true HBM traffic
        # (the ratio to HBM peak can exceed 1).  The r5 MEASURED
        # per-op trace (tools/profile_step.py, PERF.md 'Measured
        # per-op roofline') shows the flagship's working set is
        # VMEM-resident (per-op access 1.8-2.4 TB/s) — treat this
        # field as a bound, not a utilization claim.
        "step_gbytes_bound": round(bytes_accessed / 1e9 / n_devices, 3),
        "achieved_tflops": round(
            flops / step_seconds / 1e12 / n_devices, 2),
    }
    if peak:
        out["mfu"] = round(out["achieved_tflops"] / peak[0], 4)
        out["bytes_bound_vs_hbm_peak"] = round(
            bytes_accessed / step_seconds / 1e9 / n_devices / peak[1], 3)
    return out


def main():
    import jax

    # Optional persistent compile cache (off by default: cache writes
    # stall for minutes on the tunneled axon backend).
    cache_dir = os.environ.get("BENCH_COMPILE_CACHE")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import DATASET_CONF, FLAGSHIP_MODEL_CONF
    from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline
    from wekws_tpu.models import init_model
    from wekws_tpu.parallel import make_mesh
    from wekws_tpu.train import Trainer

    n_devices = len(jax.devices())
    mesh = make_mesh()
    criterion = os.environ.get("BENCH_CRITERION", "max_pooling")
    if criterion == "ctc":
        return bench_ctc(n_devices, mesh)
    if os.environ.get("BENCH_MODE") == "epoch":
        return bench_epoch(n_devices, mesh)
    model_conf = dict(FLAGSHIP_MODEL_CONF)
    # Mixed precision is the TPU training default: bf16 conv compute,
    # f32 params/BN-stats/loss (models/mdtc.py header).  Synthetic
    # recipe converges identically to f32 (PERF.md round 2); override
    # with BENCH_DTYPE=float32 to bench the pure-f32 path.
    model_conf["dtype"] = os.environ.get("BENCH_DTYPE", "bfloat16")
    # bf16 BN activations ride along with bf16 convs (statistics stay
    # f32); convergence-gated vs the f32-BN bf16 path (PERF.md r3
    # 'bn_dtype gate').  BENCH_BN_DTYPE=float32 reverts.
    bn_dtype = os.environ.get(
        "BENCH_BN_DTYPE",
        "bfloat16" if model_conf["dtype"] == "bfloat16" else "",
    )
    if bn_dtype and bn_dtype != "float32":
        model_conf["backbone"] = {
            **model_conf["backbone"], "bn_dtype": bn_dtype,
        }
    if os.environ.get("BENCH_REMAT"):
        model_conf["backbone"] = {
            **model_conf["backbone"], "remat": True,
        }
    if os.environ.get("BENCH_FUSED_TRAIN"):
        # fused Pallas training blocks (ops/fused_mdtc_train.py)
        model_conf["backbone"] = {
            **model_conf["backbone"], "fused_train": True,
        }
    model = init_model(model_conf)
    dataset_conf = dict(DATASET_CONF)
    if os.environ.get("BENCH_FUSED_FRONTEND"):
        dataset_conf["fused_frontend"] = True
    pipeline = DeviceFeaturePipeline.from_conf(dataset_conf, training=True)
    cv_pipeline = DeviceFeaturePipeline.from_conf(dataset_conf, training=False)
    trainer = Trainer(
        model, pipeline, cv_pipeline, "max_pooling",
        learning_rate=1e-3, grad_clip=5.0, min_duration=5,
    )

    # B=512 is the measured per-chip throughput sweet spot (PERF.md)
    batch_per_chip = int(os.environ.get("BENCH_BATCH_PER_CHIP", 512))
    seconds_per_utt = float(os.environ.get("BENCH_UTT_SECONDS", 2.0))
    b = batch_per_chip * n_devices
    s = int(16000 * seconds_per_utt)
    rng = np.random.default_rng(0)
    batch = {
        "waves": (rng.standard_normal((b, s)) * 1000).astype(np.float32),
        "wave_lengths": np.full((b,), s, np.int32),
        "target": (np.arange(b) % 2 - 1).astype(np.int32),
        "target_lengths": np.ones((b,), np.int32),
    }

    from wekws_tpu.parallel import shard_batch

    state = trainer.init_state(jax.random.PRNGKey(0), batch, mesh)
    device_batch = shard_batch(batch, mesh)
    key = jax.random.key(1, impl="rbg")  # see bin/train.py rationale

    # warmup / compile (two steps: the first call's output state carries
    # device-committed shardings, so call two triggers a second
    # specialization — both must compile before timing)
    for _ in range(2):
        state, metrics = trainer.train_step(state, device_batch, key, 1e-3)
    barrier(metrics["loss"])

    # 100 iters: the timed loop carries ~100 ms of fixed cost (queue
    # ramp + the final fetch's tunnel round trip); at 30 iters that
    # left ~12% of it in the number (148.7k vs 167.9k@100/171.6k@200,
    # PERF.md r4).  The metric is steady-state throughput, so the
    # default amortizes the fixed cost to ~1.5%.  (vs_baseline note:
    # BASELINE.json was recorded at 30 iters, so ~0.13x of the ratio
    # is methodology, not speed — PERF.md r4 'Timing-method audit'.)
    iters = int(os.environ.get("BENCH_ITERS", 100))
    start = time.perf_counter()
    for _ in range(iters):
        state, metrics = trainer.train_step(state, device_batch, key, 1e-3)
    barrier(metrics["loss"])
    elapsed = time.perf_counter() - start

    audio_seconds = b * seconds_per_utt * iters
    value = audio_seconds / elapsed / n_devices

    baseline = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "BASELINE.json")) as f:
            baseline = json.load(f).get("published", {}).get(
                "train_audio_s_per_s_chip"
            )
    except Exception:
        pass
    vs = value / baseline if baseline else 1.0
    record = {
        "metric": "train_audio_seconds_per_s_per_chip",
        "value": round(value, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(vs, 3),
    }
    # Methodology honesty (r4 verdict): BASELINE.json was recorded at
    # BENCH_ITERS=30; the 30->100 default change removed ~12% of fixed
    # loop cost from the denominator era's number.  The adjusted ratio
    # rescales the baseline to what it would have measured at 100
    # iters (measured 163.1/148.7 at 60/30 on the same build,
    # PERF.md r4 'Steady-state amortization') so round-over-round
    # comparisons stay like-for-like.
    if baseline and iters >= 100:
        record["vs_baseline_like_for_like"] = round(
            value / (baseline * 163.1 / 148.7), 3)
    # MFU/roofline yardstick (VERDICT r3 item 3): XLA cost-model FLOPs
    # and bytes for the exact compiled step, vs chip peak
    if not os.environ.get("BENCH_NO_ROOFLINE"):
        record.update(roofline(
            trainer._train_step_impl,
            (state, device_batch, key, jnp_lr(1e-3)),
            elapsed / iters, n_devices,
        ))
    print(json.dumps(record))


def jnp_lr(v):
    import jax.numpy as jnp

    return jnp.asarray(v, jnp.float32)


if __name__ == "__main__":
    main()
