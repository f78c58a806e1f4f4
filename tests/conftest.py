"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so data-parallel/sharding
logic is exercised without TPU hardware (SURVEY.md §4: multi-host tests
via xla_force_host_platform_device_count).  Env vars alone are not
enough: jax may already be imported by a pytest plugin, which latches
JAX_PLATFORMS at import time — so we also force the config directly.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


import yaml  # noqa: E402


@pytest.fixture
def spotter_setup(tmp_path):
    """Tiny trained-ish model artifacts for KeyWordSpotter."""
    from wekws_tpu.models import init_model
    from wekws_tpu.train import save_checkpoint

    configs = {
        "dataset_conf": {
            "feats_type": "fbank",
            "fbank_conf": {"num_mel_bins": 23, "frame_shift": 10,
                           "frame_length": 25, "dither": 1.0},
        },
        "model": {
            "input_dim": 23, "output_dim": 4, "hidden_dim": 16,
            "preprocessing": {"type": "linear"},
            "backbone": {"type": "tcn", "ds": True, "num_layers": 2,
                         "kernel_size": 4, "dropout": 0.0},
            "classifier": {"type": "element", "dropout": 0.0},
            "activation": {"type": "identity"},
        },
    }
    config_path = tmp_path / "config.yaml"
    config_path.write_text(yaml.dump(configs))
    model = init_model(configs["model"])
    feats0 = np.zeros((1, 10, 23), np.float32)
    variables = model.init(jax.random.PRNGKey(0), feats0)
    ckpt = tmp_path / "final.ckpt"
    save_checkpoint(
        str(ckpt), variables["params"], variables.get("batch_stats", {})
    )
    tokens = tmp_path / "tokens.txt"
    tokens.write_text("<blk> 0\nh 1\ni 2\nx 3\n")
    return str(ckpt), str(config_path), str(tokens)
