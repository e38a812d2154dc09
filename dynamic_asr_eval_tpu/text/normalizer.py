"""English text normalization for WER scoring.

The reference scores WER on text passed through Whisper's
``EnglishTextNormalizer`` followed by ``.lower()`` (reference:
``lcasr/run.py:8-9,111``).  The ``transformers`` package (baked into this
environment) ships the same normalizer; we wrap it so scoring is
bit-compatible, and fall back to a conservative basic normalizer if the
import is ever unavailable.
"""

from __future__ import annotations

import re
import unicodedata


class _BasicEnglishNormalizer:
    """Minimal fallback: lowercase, strip punctuation/bracketed noise,
    collapse whitespace.  Only used if transformers' normalizer is missing."""

    def __call__(self, text: str) -> str:
        text = text.lower()
        text = re.sub(r"[<\[][^>\]]*[>\]]", "", text)  # remove bracketed tags
        text = re.sub(r"\(([^)]+?)\)", "", text)
        text = unicodedata.normalize("NFKC", text)
        text = re.sub(r"[^\w\s'$%]", " ", text)
        text = re.sub(r"\s+", " ", text)
        return text.strip()


def _build_normalizer():
    try:
        from transformers.models.whisper.english_normalizer import (
            EnglishTextNormalizer as _HFNormalizer,
        )

        # Whisper's normalizer takes an english_spelling_mapping dict; the
        # reference uses openai-whisper's default (english.json).  That file
        # is not in this image — text/spelling.py regenerates the same
        # British→American table from its morphological families.
        from dynamic_asr_eval_tpu.text.spelling import english_spelling_mapping

        return _HFNormalizer(english_spelling_mapping())
    except Exception:  # pragma: no cover - fallback path
        return _BasicEnglishNormalizer()


class EnglishTextNormalizer:
    """Callable normalizer matching the reference's scoring pipeline:
    Whisper EnglishTextNormalizer then ``.lower()``."""

    def __init__(self):
        self._impl = _build_normalizer()

    def __call__(self, text: str) -> str:
        return self._impl(text).lower()


_default = None


def normalize(text: str) -> str:
    """Module-level convenience using a shared normalizer instance."""
    global _default
    if _default is None:
        _default = EnglishTextNormalizer()
    return _default(text)
