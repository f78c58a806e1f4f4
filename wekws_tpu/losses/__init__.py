from wekws_tpu.losses.mask import padding_mask
from wekws_tpu.losses.losses import (
    max_pooling_loss,
    max_pooling_per_utt,
    cross_entropy,
    ctc_loss,
    acc_frame,
    criterion,
    criterion_per_utt,
)

__all__ = [
    "padding_mask",
    "max_pooling_loss",
    "max_pooling_per_utt",
    "cross_entropy",
    "ctc_loss",
    "acc_frame",
    "criterion",
    "criterion_per_utt",
]
