"""pyctcdecode-compatible decode surface.

Capability parity with the reference's pyctcdecode usage
(``build_ctcdecoder(vocab, kenlm_model_path=...)`` +
``decode_beams_lm([logits], decoder, beam_width, ds_factor)`` at
``lcasr/run_in_dataset_eval.py:55-56,120-122`` and the KenLM-armed variant at
``wav2vec2/tedlium/run.py:127-133``) — backed by this framework's on-device
beam search and ARPA n-gram tables instead of the C++ runtime.  Word offsets
are reported in frame units scaled by ``ds_factor`` like pyctcdecode.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


class CTCDecoder:
    def __init__(self, tokenizer, ngram=None, alpha: float = 0.45,
                 beta: float = 1.53, exclude_token_zero: bool = False):
        self.tokenizer = tokenizer
        self.ngram = ngram
        self.alpha = alpha if ngram is not None else 0.0
        self.beta = beta if ngram is not None else 0.0
        self.exclude_token_zero = exclude_token_zero

    def _adapter(self):
        from dynamic_asr_eval_tpu.ops.beam_search import NGramAdapter, UniformLMAdapter

        V = self.tokenizer.vocab_size()
        if self.ngram is None:
            return UniformLMAdapter(V)
        return NGramAdapter(self.ngram)

    def decode(self, logits: np.ndarray, beam_width: int = 1) -> str:
        import jax.numpy as jnp

        from dynamic_asr_eval_tpu.ops.beam_search import beam_search_device
        from dynamic_asr_eval_tpu.ops.ctc import greedy_decode

        if beam_width <= 1 and self.ngram is None:
            return greedy_decode(logits, self.tokenizer)
        toks, lens, _ = beam_search_device(
            jnp.asarray(logits), self._adapter(), beam_width=max(beam_width, 1),
            alpha=self.alpha, beta=self.beta,
            exclude_token_zero=self.exclude_token_zero,
        )
        ids = [int(x) for x in np.asarray(toks[0])[: int(lens[0])]]
        return self.tokenizer.decode(ids)


def build_ctcdecoder(tokenizer, kenlm_model_path: Optional[str] = None,
                     alpha: float = 0.45, beta: float = 1.53) -> CTCDecoder:
    """Reference-call-shape constructor; loads an ARPA (optionally .gz) into
    device tables when given."""
    ngram = None
    if kenlm_model_path:
        from dynamic_asr_eval_tpu.lm.ngram import load_arpa

        token_to_id = {
            tokenizer.id_to_piece(i): i for i in range(tokenizer.vocab_size())
        }
        ngram = load_arpa(kenlm_model_path, token_to_id, tokenizer.vocab_size())
    return CTCDecoder(tokenizer, ngram, alpha, beta)


def decode_beams_lm(
    logits_list: Sequence[np.ndarray],
    decoder: CTCDecoder,
    beam_width: int = 1,
    ds_factor: float = 1.0,
) -> Tuple[List[str], List[List[Tuple[str, Tuple[int, int]]]]]:
    """Decode a list of logit matrices → (texts, per-text word offsets in
    input-frame units)."""
    texts, offsets = [], []
    for logits in logits_list:
        text = decoder.decode(np.asarray(logits), beam_width=beam_width)
        texts.append(text)
        # approximate word offsets by uniform division (the reference only
        # uses offsets for display)
        words = text.split()
        T = int(np.asarray(logits).shape[0] * ds_factor)
        word_offsets = []
        for i, w in enumerate(words):
            a = int(T * i / max(len(words), 1))
            b = int(T * (i + 1) / max(len(words), 1))
            word_offsets.append((w, (a, b)))
        offsets.append(word_offsets)
    return texts, offsets
