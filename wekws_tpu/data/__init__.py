"""Data package.

Imports are lazy so loader worker processes (spawn context) unpickle
Dataset objects without paying the jax import (~5 s per worker);
DeviceFeaturePipeline pulls jax only when actually requested.
"""


def __getattr__(name):
    if name in ("Dataset", "init_dataset"):
        from wekws_tpu.data import dataset as _d

        return getattr(_d, name)
    if name == "DeviceFeaturePipeline":
        from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline

        return DeviceFeaturePipeline
    raise AttributeError(name)


__all__ = ["Dataset", "init_dataset", "DeviceFeaturePipeline"]
