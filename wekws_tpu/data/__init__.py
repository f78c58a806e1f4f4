from wekws_tpu.data.dataset import Dataset, init_dataset
from wekws_tpu.data.device_pipeline import DeviceFeaturePipeline

__all__ = ["Dataset", "init_dataset", "DeviceFeaturePipeline"]
