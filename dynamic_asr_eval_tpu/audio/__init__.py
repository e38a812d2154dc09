from dynamic_asr_eval_tpu.audio.features import (
    FeaturizerConfig,
    log_mel_spectrogram,
    make_featurizer,
    zero_out_spectrogram,
)
from dynamic_asr_eval_tpu.audio.io import load_audio, resample

__all__ = [
    "FeaturizerConfig",
    "log_mel_spectrogram",
    "make_featurizer",
    "zero_out_spectrogram",
    "load_audio",
    "resample",
]
