"""Measured per-op roofline of the training step (r4 verdict item 4).

Captures a jax.profiler device trace of the flagship train step (or
the device-resident step with the full waveform-aug chain) on the
real chip and reports MEASURED per-op device time, achieved HBM
bandwidth and TFLOP/s — replacing the XLA cost-model bytes bound
(an upper bound) with trace-derived numbers.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_step.py \
        --mode flagship|aug [--steps 5] [--out /tmp/trace_dir]

Output: top ops by device time, rollups by HLO category and by source
file (device_aug.py vs model vs frontend), and the step totals:
device-busy ms, sum of per-op bytes at the 819 GB/s v5e HBM roof, and
the measured utilization ratio.

The per-op ``bytes_accessed`` is the compiler's figure for the FUSED
op — at op granularity this is close to true HBM traffic (each
fusion streams its operands/outputs once), unlike the whole-graph
cost-model total which double-counts VMEM-resident reuse.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HBM_GBPS = 819.0  # v5e
PEAK_TFLOPS = 197.0  # v5e bf16


def build_flagship():
    import jax

    from __graft_entry__ import DATASET_CONF, FLAGSHIP_MODEL_CONF
    from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline
    from wekws_tpu.models import init_model
    from wekws_tpu.parallel import make_mesh, shard_batch
    from wekws_tpu.train import Trainer

    model_conf = dict(FLAGSHIP_MODEL_CONF, dtype="bfloat16")
    model_conf["backbone"] = {**model_conf["backbone"],
                              "bn_dtype": "bfloat16"}
    model = init_model(model_conf)
    pipeline = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=True)
    cvp = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=False)
    trainer = Trainer(model, pipeline, cvp, "max_pooling",
                      learning_rate=1e-3, grad_clip=5.0, min_duration=5)
    mesh = make_mesh()
    b, s = 512, 32000
    rng = np.random.default_rng(0)
    batch = {
        "waves": (rng.standard_normal((b, s)) * 1000).astype(np.float32),
        "wave_lengths": np.full((b,), s, np.int32),
        "target": (np.arange(b) % 2 - 1).astype(np.int32),
        "target_lengths": np.ones((b,), np.int32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch, mesh)
    db = shard_batch(batch, mesh)
    key = jax.random.key(1, impl="rbg")

    def run_steps(n):
        nonlocal state
        for _ in range(n):
            state, metrics = trainer.train_step(state, db, key, 1e-3)
        np.asarray(metrics["loss"]).reshape(-1)[:1]

    return run_steps


def build_ctc():
    """The FSMN-CTC bench shape (bench.py bench_ctc)."""
    import jax

    from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline
    from wekws_tpu.models import init_model
    from wekws_tpu.parallel import make_mesh, shard_batch
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
    model_conf = {
        "input_dim": 400, "output_dim": 2599, "hidden_dim": 128,
        "dtype": "bfloat16",
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
    mesh = make_mesh()
    b, s, u = 256, 32000, 6
    rng = np.random.default_rng(0)
    batch = {
        "waves": (rng.standard_normal((b, s)) * 1000).astype(np.float32),
        "wave_lengths": np.full((b,), s, np.int32),
        "target": rng.integers(1, 2599, (b, u)).astype(np.int32),
        "target_lengths": np.full((b,), u, np.int32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch, mesh)
    db = shard_batch(batch, mesh)
    key = jax.random.key(1, impl="rbg")

    def run_steps(n):
        nonlocal state
        for _ in range(n):
            state, metrics = trainer.train_step(state, db, key, 1e-3)
        np.asarray(metrics["loss"]).reshape(-1)[:1]

    return run_steps


def build_aug():
    """Device-resident step with the full waveform-aug chain — the
    bench.py BENCH_DEVICE_AUG configuration."""
    import jax

    os.environ.setdefault("BENCH_DEVICE_AUG", "1")
    from __graft_entry__ import DATASET_CONF, FLAGSHIP_MODEL_CONF
    from wekws_tpu.data.device_aug import DeviceWaveAug, MatmulFFT
    from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline
    from wekws_tpu.data.resident import stage_arrays
    from wekws_tpu.models import init_model
    from wekws_tpu.parallel import make_mesh
    from wekws_tpu.train import Executor, Trainer

    import jax.numpy as jnp

    model_conf = dict(FLAGSHIP_MODEL_CONF, dtype="bfloat16")
    model_conf["backbone"] = {**model_conf["backbone"],
                              "bn_dtype": "bfloat16"}
    model = init_model(model_conf)
    pipeline = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=True)
    cvp = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=False)

    arng = np.random.default_rng(7)
    s_in = 32000
    out_len = int(np.ceil(s_in / 0.9))
    n_rows = 400
    bank = np.zeros((512, out_len), np.float32)
    bank[:n_rows] = (arng.standard_normal((n_rows, out_len))
                     * 300).astype(np.float32)
    rirs = arng.standard_normal((20, 4000))
    rirs /= np.sqrt((rirs ** 2).sum(1, keepdims=True))
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
        speed_perturb=True, speeds=(0.9, 1.0, 1.1), fft=fft,
        rir_re=jnp.asarray(spec.real, adt),
        rir_im=jnp.asarray(spec.imag, adt),
        n_rirs=20, reverb_prob=0.5,
        noise_rows=jnp.asarray(bank, adt),
        snr_lo=jnp.zeros((512,), np.float32),
        snr_hi=jnp.full((512,), 15.0, np.float32),
        n_noise_rows=n_rows, noise_prob=0.8,
        power_scale=1.0 / 32768.0, rir_len=rir_len, precision=prec,
    )
    trainer = Trainer(model, pipeline, cvp, "max_pooling",
                      learning_rate=1e-3, grad_clip=5.0, min_duration=5)
    mesh = make_mesh()
    n_utts, b = 2048, 512
    rng = np.random.default_rng(0)
    arrays = {
        "waves": rng.integers(-1000, 1000, (n_utts, s_in)).astype(np.int16),
        "wave_lengths": np.full((n_utts,), s_in, np.int32),
        "target": (np.arange(n_utts) % 2 - 1).astype(np.int32),
        "target_lengths": np.ones((n_utts,), np.int32),
    }
    corpus = stage_arrays(arrays, mesh=mesh)
    executor = Executor(trainer, mesh, log_interval=10**9)
    example = {k: v[:b] for k, v in corpus.arrays.items()}
    import jax as _jax

    state = trainer.init_state(_jax.random.PRNGKey(0), example, mesh)
    key = _jax.random.key(1, impl="rbg")
    holder = {"state": state, "epoch": 0}

    def run_steps(_n):
        holder["state"], _ = executor.train_resident(
            holder["state"], corpus, key, 1e-3, holder["epoch"], b)
        holder["epoch"] += 1

    return run_steps


def parse_trace(logdir):
    paths = sorted(glob.glob(
        os.path.join(logdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    evs = [e for e in tr["traceEvents"] if e.get("ph") == "X"]
    # device pid: the process named /device:TPU:*
    meta = [e for e in tr["traceEvents"] if e.get("ph") == "M"]
    dev_pids = set()
    mod_tids, op_tids = {}, {}
    pid = None
    for e in meta:
        if e.get("name") == "process_name":
            pid = e.get("pid")
            if "TPU" in e["args"].get("name", ""):
                dev_pids.add(pid)
        if e.get("name") == "thread_name" and e.get("pid") in dev_pids:
            nm = e["args"].get("name", "")
            if nm == "XLA Modules":
                mod_tids[e["pid"]] = e.get("tid")
            if nm == "XLA Ops":
                op_tids[e["pid"]] = e.get("tid")
    # some traces omit pid on thread metas; fall back to observation
    modules = [e for e in evs if e.get("pid") in dev_pids
               and e.get("tid") in mod_tids.values()]
    ops = [e for e in evs if e.get("pid") in dev_pids
           and e.get("tid") in op_tids.values()]
    return modules, ops


def report(modules, ops, label, top=25):
    # steps = executions of the dominant module (tiny helper modules
    # like convert_element_type also appear on the Modules track)
    mod_counts = collections.Counter(m["name"] for m in modules)
    n_runs = max(mod_counts.values()) if mod_counts else 1
    by_name = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])
    by_cat = collections.defaultdict(lambda: [0.0, 0.0])
    by_src = collections.defaultdict(lambda: [0.0, 0.0])
    tot_ms = tot_bytes = tot_flops = 0.0
    for e in ops:
        a = e.get("args", {})
        ms = float(a.get("device_duration_ps", 0)) / 1e9
        byt = float(a.get("bytes_accessed", 0))
        fl = float(a.get("model_flops", 0) or 0)
        r = by_name[e["name"]]
        r[0] += ms; r[1] += byt; r[2] += fl; r[3] += 1
        by_cat[a.get("hlo_category", "?")][0] += ms
        by_cat[a.get("hlo_category", "?")][1] += byt
        src = a.get("source", "?").split("/")[-1]
        by_src[src][0] += ms
        by_src[src][1] += byt
        tot_ms += ms; tot_bytes += byt; tot_flops += fl
    print(f"\n=== {label}: {n_runs} module runs, "
          f"{len(ops)} op events ===")
    print(f"device busy: {tot_ms / n_runs:.3f} ms/step | "
          f"bytes {tot_bytes / n_runs / 1e9:.3f} GB/step -> "
          f"HBM roof {tot_bytes / n_runs / 1e9 / HBM_GBPS * 1e3:.3f} ms"
          f" | measured/roof = "
          f"{(tot_ms / 1e3) / (tot_bytes / 1e9 / HBM_GBPS + 1e-12):.2f}x"
          f" | flops {tot_flops / n_runs / 1e9:.1f} GF/step "
          f"({tot_flops / (tot_ms / 1e3 + 1e-12) / 1e12:.1f} TF/s)")
    print(f"\n{'op':44s} {'ms/step':>8s} {'GB/s':>7s} {'TF/s':>6s} "
          f"{'calls':>5s}")
    rows = sorted(by_name.items(), key=lambda kv: -kv[1][0])
    for name, (ms, byt, fl, cnt) in rows[:top]:
        gbps = byt / (ms / 1e3 + 1e-12) / 1e9
        tfs = fl / (ms / 1e3 + 1e-12) / 1e12
        print(f"{name[:44]:44s} {ms / n_runs:8.3f} {gbps:7.1f} "
              f"{tfs:6.2f} {cnt // n_runs:5d}")
    print(f"\n{'hlo_category':30s} {'ms/step':>8s} {'GB/s':>8s}")
    for cat, (ms, byt) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        print(f"{cat:30s} {ms / n_runs:8.3f} "
              f"{byt / (ms / 1e3 + 1e-12) / 1e9:8.1f}")
    print(f"\n{'source':40s} {'ms/step':>8s}")
    for src, (ms, _) in sorted(by_src.items(), key=lambda kv: -kv[1][0])[:15]:
        print(f"{src[:40]:40s} {ms / n_runs:8.3f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="flagship",
                    choices=["flagship", "aug", "ctc"])
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    import jax

    logdir = args.out or f"/tmp/profile_step_{args.mode}_{os.getpid()}"
    builders = {"flagship": build_flagship, "aug": build_aug,
                "ctc": build_ctc}
    run_steps = builders[args.mode]()
    t0 = time.perf_counter()
    run_steps(2)  # compile + warm
    print(f"warmup {time.perf_counter() - t0:.1f} s", flush=True)
    jax.profiler.start_trace(logdir)
    run_steps(args.steps)
    jax.profiler.stop_trace()
    modules, ops = parse_trace(logdir)
    report(modules, ops, f"mode={args.mode}", top=args.top)


if __name__ == "__main__":
    main()
