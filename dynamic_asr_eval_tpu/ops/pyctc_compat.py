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
                 beta: float = 1.53, exclude_token_zero: bool = False,
                 word_adapter=None):
        self.tokenizer = tokenizer
        self.ngram = ngram
        self.word_adapter = word_adapter
        have_lm = ngram is not None or word_adapter is not None
        self.alpha = alpha if have_lm else 0.0
        self.beta = beta if have_lm else 0.0
        self.exclude_token_zero = exclude_token_zero

    def _adapter(self):
        from dynamic_asr_eval_tpu.ops.beam_search import NGramAdapter, UniformLMAdapter

        V = self.tokenizer.vocab_size()
        if self.word_adapter is not None:
            return self.word_adapter
        if self.ngram is None:
            return UniformLMAdapter(V)
        return NGramAdapter(self.ngram)

    def decode(self, logits: np.ndarray, beam_width: int = 1) -> str:
        import jax.numpy as jnp

        from dynamic_asr_eval_tpu.ops.beam_search import beam_search_device
        from dynamic_asr_eval_tpu.ops.ctc import greedy_decode

        if beam_width <= 1 and self.ngram is None and self.word_adapter is None:
            return greedy_decode(logits, self.tokenizer)
        # word-level fusion: the word-insertion bonus (pyctcdecode beta) is
        # applied per COMPLETED WORD inside the adapter, not per token
        beta = 0.0 if self.word_adapter is not None else self.beta
        toks, lens, _ = beam_search_device(
            jnp.asarray(logits), self._adapter(), beam_width=max(beam_width, 1),
            alpha=self.alpha, beta=beta,
            exclude_token_zero=self.exclude_token_zero,
        )
        ids = [int(x) for x in np.asarray(toks[0])[: int(lens[0])]]
        return self.tokenizer.decode(ids)


def build_ctcdecoder(tokenizer, kenlm_model_path: Optional[str] = None,
                     alpha: float = 0.45, beta: float = 1.53,
                     lm_level: str = "auto",
                     unk_score_offset: Optional[float] = -10.0) -> CTCDecoder:
    """Reference-call-shape constructor; loads an ARPA (optionally .gz) into
    device tables when given.

    ``lm_level``: ``"token"`` fuses the ARPA per AM token (its vocab must be
    tokenizer pieces); ``"word"`` builds word-boundary KenLM semantics
    (reference ``4gram_big.arpa.gz`` against a char/subword AM vocab,
    ``wav2vec2/tedlium/run.py:127-133``); ``"auto"`` picks word-level when
    fewer than half the ARPA's unigrams are tokenizer pieces.

    ``unk_score_offset``: pyctcdecode's provisional mid-word penalty for
    partials outside the lexicon's prefix set (word-level fusion only;
    ``None`` disables the lookahead)."""
    if not kenlm_model_path:
        return CTCDecoder(tokenizer, None, alpha, beta)

    from dynamic_asr_eval_tpu.lm.ngram import load_arpa, load_word_arpa

    token_to_id = {
        tokenizer.id_to_piece(i): i for i in range(tokenizer.vocab_size())
    }
    if lm_level == "token":
        ngram = load_arpa(kenlm_model_path, token_to_id, tokenizer.vocab_size())
        return CTCDecoder(tokenizer, ngram, alpha, beta)

    word_lm, word_to_id = load_word_arpa(kenlm_model_path)
    if lm_level == "auto":
        specials = {"<s>", "</s>", "<unk>"}
        real_words = [w for w in word_to_id if w not in specials]
        overlap = sum(1 for w in real_words if w in token_to_id)
        if real_words and overlap / len(real_words) >= 0.5:
            # the ARPA vocab IS the tokenizer vocab → token-level fusion
            ngram = load_arpa(
                kenlm_model_path, token_to_id, tokenizer.vocab_size()
            )
            return CTCDecoder(tokenizer, ngram, alpha, beta)

    from dynamic_asr_eval_tpu.lm.word_fusion import WordNGramAdapter

    # pyctcdecode's beta is per word; the beam multiplies lm_lps by alpha,
    # so the adapter's bonus is beta/alpha to come out as +beta per word
    bonus = beta / alpha if alpha else 0.0
    adapter = WordNGramAdapter(word_lm, word_to_id, tokenizer, word_bonus=bonus,
                               unk_score_offset=unk_score_offset)
    return CTCDecoder(tokenizer, None, alpha, beta, word_adapter=adapter)


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
