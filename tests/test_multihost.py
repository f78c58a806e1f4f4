"""Real multi-process data-parallel validation.

Spawns two jax.distributed processes (Gloo coordinator on localhost,
4 virtual CPU devices each -> one global 8-device mesh), assembles the
global batch from per-process shards, and runs a jitted train step —
the actual multi-host path of SURVEY.md §7 step 7, not a simulation.

Slow (~2 min): gated behind RUN_MULTIHOST=1.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import os, sys
pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
sys.path.insert(0, %(repo)r)
import numpy as np
from __graft_entry__ import DATASET_CONF, FLAGSHIP_MODEL_CONF
from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline
from wekws_tpu.models import init_model
from wekws_tpu.parallel import make_mesh
from wekws_tpu.parallel.mesh import make_global_batch
from wekws_tpu.train import Trainer

assert jax.process_count() == 2
assert len(jax.devices()) == 8
mesh = make_mesh()
model = init_model(FLAGSHIP_MODEL_CONF)
pipe = DeviceFeaturePipeline.from_conf(DATASET_CONF, True)
cvp = DeviceFeaturePipeline.from_conf(DATASET_CONF, False)
tr = Trainer(model, pipe, cvp, "max_pooling", learning_rate=1e-3,
             min_duration=5)
rng = np.random.default_rng(pid)
local = {
    "waves": (rng.standard_normal((8, 8000)) * 1000).astype(np.float32),
    "wave_lengths": np.full((8,), 8000, np.int32),
    "target": (np.arange(8) %% 2 - 1).astype(np.int32),
    "target_lengths": np.ones((8,), np.int32),
}
batch = make_global_batch(local, mesh)
state = tr.init_state(jax.random.PRNGKey(0), local, mesh)
state, m = tr.train_step(state, batch, jax.random.PRNGKey(1), 1e-3)
loss = float(jax.device_get(m["loss"]))
assert np.isfinite(loss)
print(f"MH_OK proc={pid} loss={loss:.4f}", flush=True)
''' % {"repo": REPO}


@pytest.mark.skipif(
    os.environ.get("RUN_MULTIHOST") != "1",
    reason="slow 2-process test; set RUN_MULTIHOST=1",
)
def test_two_process_data_parallel(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = "12391"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", str(worker), str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}:\n{out[-3000:]}"
        assert "MH_OK" in out
