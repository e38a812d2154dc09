from dynamic_asr_eval_tpu.data.adapters import datasets_functions, get_dataset

__all__ = ["datasets_functions", "get_dataset"]
