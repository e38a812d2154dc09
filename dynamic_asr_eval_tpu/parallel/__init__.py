from dynamic_asr_eval_tpu.parallel.mesh import (
    make_mesh,
    conformer_param_sharding,
    shard_params,
    replicate,
    psum_wer_counts,
)

__all__ = [
    "make_mesh",
    "conformer_param_sharding",
    "shard_params",
    "replicate",
    "psum_wer_counts",
]
