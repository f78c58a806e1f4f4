from wekws_tpu.decode.ctc_prefix_beam_search import (
    PrefixBeam,
    ctc_prefix_beam_search,
)
from wekws_tpu.decode.calculator import Calculator
from wekws_tpu.decode.accuracy import acc_utterance

__all__ = [
    "PrefixBeam",
    "ctc_prefix_beam_search",
    "Calculator",
    "acc_utterance",
]
