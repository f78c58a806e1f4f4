from wekws_tpu.losses.mask import padding_mask
from wekws_tpu.losses.losses import (
    max_pooling_loss,
    cross_entropy,
    ctc_loss,
    acc_frame,
    criterion,
)

__all__ = [
    "padding_mask",
    "max_pooling_loss",
    "cross_entropy",
    "ctc_loss",
    "acc_frame",
    "criterion",
]
