"""Model zoo: streaming small-footprint KWS backbones.

Every backbone follows the streaming cache contract
``(y, new_cache) = backbone(x, cache, train=...)`` where ``cache`` is a
pytree of per-layer causal left-context buffers (zeros at utterance
start).  Chunked forward with cache round-tripping is numerically
identical to a full-utterance forward (tests/test_models.py).
"""

from wekws_tpu.models.kws_model import KWSModel, init_model
from wekws_tpu.models.tcn import TCN, CnnBlock, DsCnnBlock
from wekws_tpu.models.mdtc import MDTC
from wekws_tpu.models.fsmn import FSMN
from wekws_tpu.models.gru import GRU
from wekws_tpu.models.cmvn import GlobalCMVN
from wekws_tpu.models.subsampling import (
    LinearSubsampling1,
    Conv1dSubsampling1,
    NoSubsampling,
)
from wekws_tpu.models.classifier import (
    GlobalClassifier,
    LastClassifier,
    ElementClassifier,
    LinearClassifier,
)

__all__ = [
    "KWSModel",
    "init_model",
    "TCN",
    "CnnBlock",
    "DsCnnBlock",
    "MDTC",
    "FSMN",
    "GRU",
    "GlobalCMVN",
    "LinearSubsampling1",
    "Conv1dSubsampling1",
    "NoSubsampling",
    "GlobalClassifier",
    "LastClassifier",
    "ElementClassifier",
    "LinearClassifier",
]
