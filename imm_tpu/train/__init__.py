from imm_tpu.train.state import TrainState, create_train_state, TrainConfig
from imm_tpu.train.steps import make_train_step, make_synthetic_train_step
from imm_tpu.train.loop import Trainer

__all__ = [
    "TrainState",
    "TrainConfig",
    "create_train_state",
    "make_train_step",
    "make_synthetic_train_step",
    "Trainer",
]
