from wekws_tpu.train.steps import TrainState, Trainer
from wekws_tpu.train.executor import Executor
from wekws_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    load_checkpoint_info,
)
from wekws_tpu.train.scheduler import ReduceLROnPlateau
from wekws_tpu.train.average import average_checkpoints

__all__ = [
    "TrainState",
    "Trainer",
    "Executor",
    "load_checkpoint",
    "save_checkpoint",
    "load_checkpoint_info",
    "ReduceLROnPlateau",
    "average_checkpoints",
]
