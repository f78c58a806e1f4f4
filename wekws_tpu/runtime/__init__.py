from wekws_tpu.runtime.streaming_frontend import StreamingFrontend
from wekws_tpu.runtime.keyword_spotter import KeyWordSpotter

__all__ = ["StreamingFrontend", "KeyWordSpotter"]
