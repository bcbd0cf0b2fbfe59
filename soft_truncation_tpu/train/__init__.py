from .state import TrainState, init_train_state
from .step import make_train_step
from .checkpoint import CheckpointManager

__all__ = [
    "TrainState",
    "init_train_state",
    "make_train_step",
    "CheckpointManager",
]
