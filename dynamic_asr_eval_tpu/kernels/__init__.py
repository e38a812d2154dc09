from dynamic_asr_eval_tpu.kernels.softdtw import SoftDTW, soft_dtw, pairwise_sq_dist

__all__ = ["SoftDTW", "soft_dtw", "pairwise_sq_dist"]
