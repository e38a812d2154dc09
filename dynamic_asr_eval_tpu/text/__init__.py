from dynamic_asr_eval_tpu.text.normalizer import EnglishTextNormalizer, normalize
from dynamic_asr_eval_tpu.text.tokenizer import (
    CharTokenizer,
    VocabTokenizer,
    load_tokenizer,
)
from dynamic_asr_eval_tpu.text.wer import word_error_rate_detail, cer

__all__ = [
    "EnglishTextNormalizer",
    "normalize",
    "CharTokenizer",
    "VocabTokenizer",
    "load_tokenizer",
    "word_error_rate_detail",
    "cer",
]
