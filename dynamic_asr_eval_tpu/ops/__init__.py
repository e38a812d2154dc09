from dynamic_asr_eval_tpu.ops.ctc import (
    ctc_loss,
    greedy_decode,
    greedy_labels,
)
from dynamic_asr_eval_tpu.ops.chunk import chunk_spectrogram, num_chunks, pad_num_chunks
from dynamic_asr_eval_tpu.ops.stitch import stitch_chunk_probs

__all__ = [
    "ctc_loss",
    "greedy_decode",
    "greedy_labels",
    "chunk_spectrogram",
    "num_chunks",
    "pad_num_chunks",
    "stitch_chunk_probs",
]
