from dynamic_asr_eval_tpu.tta.runner import DynamicEvalEngine, chunked_inference
from dynamic_asr_eval_tpu.tta.awmc import AWMCEngine
from dynamic_asr_eval_tpu.tta.consistency import ConsistencyEngine

__all__ = ["DynamicEvalEngine", "AWMCEngine", "ConsistencyEngine", "chunked_inference"]
