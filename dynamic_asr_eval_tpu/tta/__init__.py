from dynamic_asr_eval_tpu.tta.runner import DynamicEvalEngine, chunked_inference
from dynamic_asr_eval_tpu.tta.awmc import AWMCEngine

__all__ = ["DynamicEvalEngine", "AWMCEngine", "chunked_inference"]
