from wekws_tpu.tools.cmvn_stats import compute_cmvn_stats
from wekws_tpu.tools.make_list import make_list
from wekws_tpu.tools.durations import wav_durations

from wekws_tpu.tools.import_torch import (  # noqa: F401 (torch optional)
    import_torch_checkpoint,
)

__all__ = ["compute_cmvn_stats", "make_list", "wav_durations",
           "import_torch_checkpoint"]
