from wekws_tpu.export.graph import export_model, load_artifact
from wekws_tpu.export.np_runtime import GraphRuntime

__all__ = ["export_model", "load_artifact", "GraphRuntime"]
