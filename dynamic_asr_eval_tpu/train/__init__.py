from dynamic_asr_eval_tpu.train.schedule import (
    CosineSchedule,
    SequenceWarmupManager,
)
from dynamic_asr_eval_tpu.train.data import SimpleDataset, VariableBatchLoader
from dynamic_asr_eval_tpu.train.nst import NSTTrainer, TrainConfig

__all__ = [
    "CosineSchedule",
    "SequenceWarmupManager",
    "SimpleDataset",
    "VariableBatchLoader",
    "NSTTrainer",
    "TrainConfig",
]
