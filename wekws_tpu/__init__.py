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
