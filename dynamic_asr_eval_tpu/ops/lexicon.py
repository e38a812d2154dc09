"""Lexicon-constrained (word-constrained) CTC beam decoding.

Capability parity with the reference's ``word_beam_search`` C++ extension
(``wav2vec2/wbeamtest.py:1-61``): decoding is constrained to words from a
fixed corpus.  TPU-native design: a *constraint adapter* that wraps any LM
adapter of :mod:`ops.beam_search` — per-beam state tracks the current word
prefix as a rolling hash; next-token log-probs get ``-inf`` for characters
that leave the word-prefix trie, and the word separator is only allowed when
the prefix is a complete word.  The trie is two sorted hash tables (prefixes,
complete words) queried with vectorized ``searchsorted`` — no host calls.

Works with both :class:`BeamSearchHost` and :func:`beam_search_device`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_asr_eval_tpu.ops.beam_search import _INC_HI, _INC_LO, _roll_hash
from dynamic_asr_eval_tpu.lm.ngram import _hash_ctx

NEG = -1e30


class _HashSet:
    """Sorted uint64 hash set (hi/lo uint32 pairs) with vectorized lookup."""

    def __init__(self, hashes: Sequence[int]):
        keys = np.unique(np.array(sorted(hashes), dtype=np.uint64))
        self.hi = jnp.asarray((keys >> np.uint64(32)).astype(np.uint32))
        self.lo = jnp.asarray((keys & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        self.n = int(keys.shape[0])

    def contains(self, h_hi: jnp.ndarray, h_lo: jnp.ndarray) -> jnp.ndarray:
        if self.n == 0:
            return jnp.zeros(h_hi.shape, bool)
        left = jnp.searchsorted(self.hi, h_hi, side="left")
        PROBE = 8
        idxs = jnp.clip(left[..., None] + jnp.arange(PROBE), 0, self.n - 1)
        hit = (self.hi[idxs] == h_hi[..., None]) & (self.lo[idxs] == h_lo[..., None])
        return hit.any(-1)


def build_lexicon_tables(
    words: Sequence[str], tokenizer
) -> Tuple[_HashSet, _HashSet]:
    """Return (prefix_set, word_set) over token-id rolling hashes."""
    prefixes, completes = set(), set()
    for w in words:
        ids = tokenizer.encode(w)
        if not ids:
            continue
        for i in range(1, len(ids) + 1):
            prefixes.add(_hash_ctx(ids[:i]))
        completes.add(_hash_ctx(ids))
    return _HashSet(prefixes), _HashSet(completes)


class LexiconConstrainedAdapter:
    """Wrap an LM adapter with word-trie masking.

    ``separator_id`` is the word-boundary token (space for char vocabs).
    State = (inner_state, word-prefix hash pair [B], prefix length [B]).
    """

    def __init__(self, inner, prefix_set: _HashSet, word_set: _HashSet,
                 separator_id: int, vocab_size: int):
        self.inner = inner
        self.prefix_set = prefix_set
        self.word_set = word_set
        self.sep = separator_id
        self.vocab_size = vocab_size

    def _mask(self, wp_hi, wp_lo, wp_len):
        """[B, V] additive mask."""
        B = wp_hi.shape[0]
        V = self.vocab_size
        vocab = jnp.arange(V, dtype=jnp.int32)
        ext_hi, ext_lo = _roll_hash(
            jnp.broadcast_to(wp_hi[:, None], (B, V)),
            jnp.broadcast_to(wp_lo[:, None], (B, V)),
            jnp.broadcast_to(vocab[None], (B, V)),
        )
        ok_char = self.prefix_set.contains(ext_hi, ext_lo)  # [B, V]
        complete = self.word_set.contains(wp_hi, wp_lo) & (wp_len > 0)  # [B]
        mask = jnp.where(ok_char, 0.0, NEG)
        mask = mask.at[:, self.sep].set(jnp.where(complete, 0.0, NEG))
        return mask

    def init_state(self, batch: int):
        inner_state, lps = self.inner.init_state(batch)
        wp_hi = jnp.full((batch,), _INC_HI, jnp.uint32)
        wp_lo = jnp.full((batch,), _INC_LO, jnp.uint32)
        wp_len = jnp.zeros((batch,), jnp.int32)
        lps = lps + self._mask(wp_hi, wp_lo, wp_len)
        return (inner_state, wp_hi, wp_lo, wp_len), lps

    def advance(self, state, tokens, mask):
        inner_state, wp_hi, wp_lo, wp_len = state
        inner_state, lps = self.inner.advance(inner_state, tokens, mask)
        is_sep = tokens == self.sep
        roll_hi, roll_lo = _roll_hash(wp_hi, wp_lo, tokens)
        new_hi = jnp.where(is_sep, jnp.full_like(wp_hi, _INC_HI), roll_hi)
        new_lo = jnp.where(is_sep, jnp.full_like(wp_lo, _INC_LO), roll_lo)
        new_len = jnp.where(is_sep, 0, wp_len + 1)
        wp_hi = jnp.where(mask, new_hi, wp_hi)
        wp_lo = jnp.where(mask, new_lo, wp_lo)
        wp_len = jnp.where(mask, new_len, wp_len)
        lps = lps + self._mask(wp_hi, wp_lo, wp_len)
        return (inner_state, wp_hi, wp_lo, wp_len), lps

    def gather(self, state, idx):
        inner_state, wp_hi, wp_lo, wp_len = state
        return (self.inner.gather(inner_state, idx), wp_hi[idx], wp_lo[idx], wp_len[idx])


def word_beam_search(
    log_probs,  # [T, V+1]
    words: Sequence[str],
    tokenizer,
    separator_id: Optional[int] = None,
    beam_width: int = 5,
    lm_adapter=None,
    **beam_kwargs,
):
    """Word-constrained decode of a CTC logit matrix → text (the
    ``WordBeamSearch(...).compute`` surface of ``wav2vec2/wbeamtest.py:45``)."""
    from dynamic_asr_eval_tpu.ops.beam_search import (
        UniformLMAdapter, beam_search_device,
    )

    V = np.asarray(log_probs).shape[1] - 1
    if separator_id is None:
        separator_id = tokenizer.encode(" ")[0] if tokenizer.encode(" ") else 0
    prefix_set, word_set = build_lexicon_tables(words, tokenizer)
    if beam_kwargs.get("alpha", 1.0) == 0.0:
        raise ValueError(
            "word_beam_search requires alpha > 0 (the lexicon mask rides the "
            "LM log-probs; alpha=0 would disable the constraint)"
        )
    inner = lm_adapter or UniformLMAdapter(V)
    adapter = LexiconConstrainedAdapter(inner, prefix_set, word_set, separator_id, V)
    beam_kwargs.setdefault("alpha", 1.0)
    beam_kwargs.setdefault("beta", 0.0)
    # the reference's id-0 exclusion is an SPM-special-id convention; here the
    # lexicon mask governs validity, so id 0 stays decodable by default
    beam_kwargs.setdefault("exclude_token_zero", False)
    toks, lens, scores = beam_search_device(
        jnp.asarray(log_probs), adapter, beam_width=beam_width, **beam_kwargs
    )
    # enforce complete final words (the C++ WordBeamSearch only emits words):
    # take the best beam whose last word is in the lexicon; if none, strip the
    # trailing incomplete fragment from the best beam
    word_strs = set(words)
    candidates = []
    for b in range(toks.shape[0]):
        ids = [int(x) for x in np.asarray(toks[b])[: int(lens[b])]]
        text = tokenizer.decode(ids).strip()
        candidates.append(text)
        parts = text.split()
        if not parts or parts[-1] in word_strs:
            return text
    best = candidates[0].split()
    while best and best[-1] not in word_strs:
        best.pop()
    return " ".join(best)
