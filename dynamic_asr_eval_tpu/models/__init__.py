from dynamic_asr_eval_tpu.models.conformer import (
    ConformerConfig,
    SCConformer,
    init_conformer,
)

__all__ = ["ConformerConfig", "SCConformer", "init_conformer"]
