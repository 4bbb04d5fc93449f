from .losses import charbonnier_loss, l1_loss, mse_loss
from .schedule import cosine_restart_schedule
from .state import TrainState, create_train_state
from .train_step import make_train_step, make_eval_step

__all__ = [
    "charbonnier_loss",
    "l1_loss",
    "mse_loss",
    "cosine_restart_schedule",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
