from dynamic_asr_eval_tpu.parallel.mesh import (
    batch_sharding,
    conformer_param_sharding,
    make_mesh,
    psum_wer_counts,
    reduce_wer_counts,
    replicate,
    shard_params,
)

__all__ = [
    "batch_sharding",
    "conformer_param_sharding",
    "make_mesh",
    "psum_wer_counts",
    "reduce_wer_counts",
    "replicate",
    "shard_params",
]
