"""wekws_tpu: a TPU-native keyword-spotting / wake-word framework.

Built from scratch in JAX/XLA/Pallas with the capability surface of
wenet-e2e/wekws (see SURVEY.md): Kaldi-compatible on-device feature
extraction, streaming small-footprint backbones with explicit causal
caches, max-pooling / CE / CTC training, CTC prefix beam search with
per-token timestamps, data-parallel training over TPU meshes, DET and
accuracy evaluation, checkpointing + model averaging, export, and a C++
streaming runtime.
"""

__version__ = "0.1.0"


def _honor_jax_platforms_env() -> None:
    """Make ``JAX_PLATFORMS=cpu python -m wekws_tpu.bin.*`` reliable.

    Site hooks on some hosts import jax at interpreter start (to
    register an out-of-tree TPU backend), which latches the platform
    before the env var from the user's shell can take effect. jax's
    config is still mutable until the first backend is materialized,
    so re-assert the user's choice here (every CLI and library entry
    imports this package before touching a device)."""
    import os

    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import sys

    jax = sys.modules.get("jax")
    if jax is None:
        return  # not imported yet: the env var will apply normally
    try:
        jax.config.update("jax_platforms", want)
    except Exception:  # backend already initialized: keep jax's error
        pass


_honor_jax_platforms_env()
