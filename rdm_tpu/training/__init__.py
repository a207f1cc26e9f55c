from rdm_tpu.training.ema import EmaState, ema_init, ema_update
from rdm_tpu.training.optim import lambda_linear_schedule, make_optimizer
from rdm_tpu.training.train_state import TrainState, make_train_step

__all__ = [
    "EmaState", "ema_init", "ema_update",
    "lambda_linear_schedule", "make_optimizer",
    "TrainState", "make_train_step",
]
