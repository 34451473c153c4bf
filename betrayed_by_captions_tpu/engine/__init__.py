from .optim import build_optimizer, OptimizerConfig
from .train_state import TrainState, create_train_state
from .train_step import make_train_step, make_eval_step

__all__ = [
    "build_optimizer",
    "OptimizerConfig",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
