"""A/B the depthwise-conv backward: autodiff grouped conv-transpose vs
the hand-written dense VJP (models/layers.py depthwise_conv1d_cvjp),
full MDTC train step at several batch sizes — the PERF.md 'B=1024
regression' experiment.

Usage: python tools/bench_dw_backward.py  (real chip)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_impl(impl_name, batch):
    import jax

    from wekws_tpu.models import layers
    from __graft_entry__ import DATASET_CONF, FLAGSHIP_MODEL_CONF
    from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline
    from wekws_tpu.models import init_model
    from wekws_tpu.parallel import make_mesh, shard_batch
    from wekws_tpu.train import Trainer

    layers.depthwise_conv1d = getattr(layers, f"depthwise_conv1d_{impl_name}")

    mesh = make_mesh()
    model_conf = dict(FLAGSHIP_MODEL_CONF, dtype="bfloat16")
    model = init_model(model_conf)
    pipeline = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=True)
    cvp = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=False)
    trainer = Trainer(model, pipeline, cvp, "max_pooling",
                      learning_rate=1e-3, grad_clip=5.0, min_duration=5)

    b, s = batch, 32000
    rng = np.random.default_rng(0)
    hbatch = {
        "waves": (rng.standard_normal((b, s)) * 1000).astype(np.float32),
        "wave_lengths": np.full((b,), s, np.int32),
        "target": (np.arange(b) % 2 - 1).astype(np.int32),
        "target_lengths": np.ones((b,), np.int32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), hbatch, mesh)
    device_batch = shard_batch(hbatch, mesh)
    key = jax.random.key(1, impl="rbg")
    for _ in range(2):
        state, metrics = trainer.train_step(state, device_batch, key, 1e-3)
    jax.block_until_ready(metrics["loss"])
    iters = 20
    start = time.perf_counter()
    for _ in range(iters):
        state, metrics = trainer.train_step(state, device_batch, key, 1e-3)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - start) / iters
    tput = b * 2.0 / dt
    print(f"{impl_name:8s} B={b:5d}: step {dt * 1e3:7.2f} ms  "
          f"{tput:9.0f} audio-s/s", flush=True)
    return dt


def main():
    impls = sys.argv[1:] or ["grouped", "cvjp"]
    for b in (512, 1024):
        for impl in impls:
            bench_impl(impl, b)


if __name__ == "__main__":
    sys.exit(main())
