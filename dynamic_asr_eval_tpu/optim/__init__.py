from dynamic_asr_eval_tpu.optim.madgrad import madgrad
from dynamic_asr_eval_tpu.optim.ema import EmaState, ema_init, ema_update, ema_params
from dynamic_asr_eval_tpu.optim.masks import (
    param_labels,
    masked_optimizer,
    trainable_mask,
)

__all__ = [
    "madgrad",
    "EmaState",
    "ema_init",
    "ema_update",
    "ema_params",
    "param_labels",
    "masked_optimizer",
    "trainable_mask",
]
