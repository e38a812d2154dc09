from dynamic_asr_eval_tpu.lm.transformer_lm import TransformerLM, TransformerLMConfig, init_lm
from dynamic_asr_eval_tpu.lm.ngram import NGramLM, load_arpa

__all__ = ["TransformerLM", "TransformerLMConfig", "init_lm", "NGramLM", "load_arpa"]
