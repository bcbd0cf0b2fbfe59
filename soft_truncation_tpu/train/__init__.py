from .state import TrainState, init_train_state
from .step import (make_eval_loss_step, make_multi_train_step,
                   make_train_step)
from .checkpoint import CheckpointManager

__all__ = [
    "TrainState",
    "init_train_state",
    "make_eval_loss_step",
    "make_multi_train_step",
    "make_train_step",
    "CheckpointManager",
]
