from wekws_tpu.eval.det import (
    compute_det,
    frr_at_fa_per_hour,
    load_label_and_score,
    write_stats_file,
)
from wekws_tpu.eval.score import write_score_file

__all__ = [
    "compute_det",
    "frr_at_fa_per_hour",
    "load_label_and_score",
    "write_stats_file",
    "write_score_file",
]
