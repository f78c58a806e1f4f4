"""Data-parallel sharding-overhead measurement (BASELINE.json north
star: >=0.9 scaling efficiency).

Without multi-chip hardware, virtual CPU devices share the same
physical cores, so WEAK scaling (fixed per-device batch) only measures
core contention — an n-device mesh does n times the compute on the
same silicon.  The meaningful single-host measurement is STRONG
scaling at a fixed GLOBAL batch: the total compute is constant, so
t(n)/t(1) isolates what the framework adds when the batch is sharded
n ways — the inserted all-reduces, per-shard dispatch, and any
partition-induced recompute.  sharding_overhead(n) = t(n)/t(1);
1.0 means the sharded program costs nothing extra.  On real TPU pods
the same script measures true scaling (each shard has its own chip).

Each device count runs in a fresh subprocess
(xla_force_host_platform_device_count is latched at backend init).

Usage: python tools/bench_scaling.py [--global-batch 256]
Prints one JSON line per mesh size plus a summary line.
"""

import argparse
import json
import os
import subprocess
import sys

_CHILD = r"""
import os, sys, time, json
n = int(sys.argv[1])
gb = int(sys.argv[2])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={n}"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.getcwd())
import numpy as np
from __graft_entry__ import DATASET_CONF, FLAGSHIP_MODEL_CONF
from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline
from wekws_tpu.models import init_model
from wekws_tpu.parallel import make_mesh
from wekws_tpu.parallel.mesh import shard_batch
from wekws_tpu.train import Trainer

assert len(jax.devices()) == n
mesh = make_mesh()
model = init_model(FLAGSHIP_MODEL_CONF)
pipe = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=True)
cvp = DeviceFeaturePipeline.from_conf(DATASET_CONF, training=False)
tr = Trainer(model, pipe, cvp, "max_pooling", learning_rate=1e-3,
             min_duration=5)
ns = 16000
rng = np.random.default_rng(0)
batch = {
    "waves": (rng.standard_normal((gb, ns)) * 1000).astype(np.float32),
    "wave_lengths": np.full((gb,), ns, np.int32),
    "target": (np.arange(gb) % 2 - 1).astype(np.int32),
}
state = tr.init_state(jax.random.PRNGKey(0), batch, mesh)
dbatch = shard_batch(batch, mesh)
key = jax.random.PRNGKey(1)
for _ in range(2):
    state, m = tr.train_step(state, dbatch, key, 1e-3)
jax.block_until_ready(m["loss"])
iters = 10
t0 = time.perf_counter()
for _ in range(iters):
    state, m = tr.train_step(state, dbatch, key, 1e-3)
jax.block_until_ready(m["loss"])
med = (time.perf_counter() - t0) / iters
print(json.dumps({"devices": n, "step_ms": med * 1e3,
                  "global_batch": gb}), flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--global-batch", type=int, default=256)
    ap.add_argument("--mesh-sizes", type=int, nargs="+",
                    default=[1, 2, 4, 8])
    args = ap.parse_args()
    results = []
    for n in args.mesh_sizes:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, str(n), str(args.global_batch)],
            capture_output=True, text=True, cwd=os.getcwd(),
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"mesh={n} FAILED:\n{out.stderr[-2000:]}",
                  file=sys.stderr)
            sys.exit(1)
        rec = json.loads(line[-1])
        results.append(rec)
        print(json.dumps(rec), flush=True)
    t1 = results[0]["step_ms"]
    summary = {
        "sharding_overhead": {
            str(r["devices"]): round(r["step_ms"] / t1, 3)
            for r in results
        },
        "global_batch": args.global_batch,
        "note": "t(n)/t(1) at fixed global batch on shared-core "
                "virtual devices; 1.0 = sharding adds no cost",
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
