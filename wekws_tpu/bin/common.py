"""Shared CLI plumbing: load trained model + config, batched forward."""

import copy
from typing import Optional

import numpy as np
import yaml


def load_test_setup(config_path: str, checkpoint: str, batch_size: int = 256):
    """-> (configs, model, variables, cv_pipeline, test_conf)."""
    import jax

    from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline
    from wekws_tpu.models import init_model
    from wekws_tpu.train import load_checkpoint

    with open(config_path, "r") as fin:
        configs = yaml.safe_load(fin)
    test_conf = copy.deepcopy(configs["dataset_conf"])
    fc = test_conf.get("filter_conf", {})
    fc["max_length"] = 102400
    fc["min_length"] = 0
    fc["min_output_input_ratio"] = 0.0
    fc["token_max_length"] = 10240
    fc["token_min_length"] = 1
    test_conf["filter_conf"] = fc
    test_conf["batch_conf"] = dict(
        test_conf.get("batch_conf", {}), batch_size=batch_size
    )

    pipeline = DeviceFeaturePipeline.from_conf(test_conf, training=False)
    model = init_model(configs["model"])

    # init to obtain the variable structure, then restore
    dummy = np.zeros((1, 16000), np.float32)
    feats, flens = pipeline(dummy, np.array([16000], np.int32))
    variables = model.init(jax.random.PRNGKey(0), feats)
    template = {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats", {})),
    }
    params, stats = load_checkpoint(checkpoint, template)
    variables = {"params": params, "batch_stats": stats}
    return configs, model, variables, pipeline, test_conf


def make_forward_fn(model, variables, pipeline, softmax: bool = False):
    """batch dict -> (posteriors/logits numpy, feat lengths numpy)."""
    import jax

    @jax.jit
    def fwd(waves, wave_lengths):
        feats, feat_lengths = pipeline(waves, wave_lengths)
        out, _ = model.apply(
            variables, feats, lengths=feat_lengths, softmax=softmax
        )
        return out, feat_lengths

    def forward(batch):
        out, lengths = fwd(batch["waves"], batch["wave_lengths"])
        return np.asarray(out), np.asarray(lengths)

    return forward


def enable_compilation_cache(cache_dir: str) -> None:
    """Persistent XLA compilation cache rooted at ``cache_dir``.

    A restarted daemon (or a re-launched training job) on the same
    topology reloads its compiled programs from disk instead of paying
    the multi-second TPU compile again — the difference between a
    ~30 s and a sub-second serving cold start.  Thresholds are zeroed
    so even small serving programs (step + tail-flush) are cached.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
