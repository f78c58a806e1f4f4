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
from wekws_tpu.decode.greedy import (
    batched_edit_distance,
    ctc_greedy_decode,
    ctc_token_accuracy,
)

__all__ = [
    "batched_edit_distance",
    "ctc_greedy_decode",
    "ctc_token_accuracy",
    "PrefixBeam",
    "ctc_prefix_beam_search",
    "Calculator",
    "acc_utterance",
    "batched_ctc_prefix_beam_search",
    "hyps_from_arrays",
]
