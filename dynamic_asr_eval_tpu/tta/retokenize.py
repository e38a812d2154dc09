"""Pseudo-label re-tokenization — the reference's text round-trip, quantified.

The reference derives CTC pseudo-targets by decoding the clean stream to
TEXT and re-encoding it with the tokenizer (``lcasr/lib.py:558-571``): both
the greedy path (``decoder(...)`` → text) and the LM-beam path
(``beam_search.return_text(idx=0)``) end in
``tokenizer.encode(pseudo_targets)``.  For a unigram SentencePiece model,
``encode`` returns the Viterbi-best segmentation of that text — which can
differ from the token path the decoder actually emitted (the classic
"emitted token path vs canonical segmentation" mismatch).  The engine's
default uses the decoded token ids directly, keeping the whole adaptation
inside one jitted scan with no host sync per window.

This module provides:

- :func:`retokenize` — the reference-exact round trip for one label sequence;
- :func:`divergence_report` — quantifies how often the round trip changes the
  CTC target and by how much (VERDICT r4 ask #3);
- :func:`make_retokenize_callback` — a host callback the engine routes labels
  through when ``TTAConfig.pseudo_label_retokenize`` is set (opt-in exact
  mode; one host round-trip per window via ``jax.pure_callback``).

Both label choices decode to the SAME transcript (the round trip preserves
text); only the CTC target segmentation differs, so this is a training-signal
divergence, not an output divergence.  Measured rates (synthetic unigram SPM,
tests/test_retokenize.py): 0% when the decoded path is the tokenizer-
canonical segmentation — the overwhelming case for a CTC model trained on
canonical targets — and >0% only on non-canonical piece paths.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def retokenize(ids: Sequence[int], tokenizer) -> List[int]:
    """``tokenizer.encode(tokenizer.decode(ids))`` (lcasr/lib.py:560,569-571)."""
    return list(tokenizer.encode(tokenizer.decode([int(i) for i in ids])))


def _edit_distance(a: Sequence[int], b: Sequence[int]) -> int:
    """Token-level Levenshtein distance."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def divergence_report(label_seqs: Sequence[Sequence[int]], tokenizer) -> Dict:
    """Quantify the id-path vs re-tokenized divergence over decode results.

    Returns counts and magnitudes: ``rate`` (fraction of sequences whose CTC
    target changes), ``mean_token_edit`` / ``mean_len_delta`` over diverged
    cases, and ``text_preserved`` (the round trip must never change the
    transcript itself — if this is not ``n_cases`` something is wrong with
    the tokenizer, not the labels)."""
    n = len(label_seqs)
    diverged = 0
    edit_total = 0
    len_delta_total = 0
    text_preserved = 0
    for ids in label_seqs:
        ids = [int(i) for i in ids]
        new = retokenize(ids, tokenizer)
        if tokenizer.decode(new) == tokenizer.decode(ids):
            text_preserved += 1
        if new != ids:
            diverged += 1
            edit_total += _edit_distance(ids, new)
            len_delta_total += len(new) - len(ids)
    return {
        "n_cases": n,
        "n_diverged": diverged,
        "rate": diverged / n if n else 0.0,
        "mean_token_edit": edit_total / diverged if diverged else 0.0,
        "mean_len_delta": len_delta_total / diverged if diverged else 0.0,
        "text_preserved": text_preserved,
    }


def make_retokenize_callback(tokenizer, max_tokens: int):
    """Host-side (labels, length) → (labels, length) for ``jax.pure_callback``.

    Fixed output shape ``[max_tokens]`` (zero-padded) + scalar length, so the
    callback composes with the engine's shape-static CTC step.  Re-encoded
    sequences longer than ``max_tokens`` are truncated (same cap the default
    path applies)."""

    def _cb(labels, length):
        labels = np.asarray(labels)
        ids = [int(t) for t in labels[: int(length)]]
        new = retokenize(ids, tokenizer)[:max_tokens]
        out = np.zeros((max_tokens,), np.int32)
        out[: len(new)] = new
        return out, np.int32(len(new))

    return _cb
