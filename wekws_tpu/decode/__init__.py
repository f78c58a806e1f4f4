from wekws_tpu.decode.ctc_prefix_beam_search import (
    PrefixBeam,
    ctc_prefix_beam_search,
)
from wekws_tpu.decode.calculator import Calculator
from wekws_tpu.decode.accuracy import acc_utterance
from wekws_tpu.decode.batched_ctc import (
    batched_ctc_prefix_beam_search,
    hyps_from_arrays,
)

__all__ = [
    "PrefixBeam",
    "ctc_prefix_beam_search",
    "Calculator",
    "acc_utterance",
    "batched_ctc_prefix_beam_search",
    "hyps_from_arrays",
]
