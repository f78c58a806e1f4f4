from wekws_tpu.runtime.streaming_frontend import StreamingFrontend
from wekws_tpu.runtime.keyword_spotter import KeyWordSpotter
from wekws_tpu.runtime.batch_spotter import (
    BatchKeywordSpotter,
    BatchMaxPoolSpotter,
)

__all__ = [
    "StreamingFrontend",
    "KeyWordSpotter",
    "BatchKeywordSpotter",
    "BatchMaxPoolSpotter",
]
