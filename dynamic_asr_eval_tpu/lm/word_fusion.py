"""Word-boundary n-gram fusion — true KenLM/pyctcdecode semantics on device.

The reference fuses a WORD-level KenLM 4-gram through pyctcdecode
(``wav2vec2/tedlium/run.py:127-133``, ``4gram_big.arpa.gz``): the LM scores
``P(word | word history)`` exactly when a word COMPLETES, not per emitted
token.  Mapping a word-level ARPA through ``tokenizer.id_to_piece`` (the
token-level path) silently drops nearly every n-gram — ``load_arpa`` now
warns about that; this module is the correct path.

TPU-native design: everything stays inside the jitted beam-search scan.

- per-beam state carries the WORD history (last ``order-1`` word ids) plus a
  64-bit rolling hash of the current partial word's bytes (uint32-pair
  arithmetic — TPUs have no int64);
- every vocab token has precomputed host-side constants: whether emitting it
  CLOSES the current word (SentencePiece "▁"-pieces and char-level
  separators), and its byte-hash composition ``(M^len, Σ M^(len-j)(b_j+1))``
  so the partial-word hash extends in O(1);
- when any closing token is emitted, the completed word's hash is looked up
  in a sorted device table (→ word id, or ``<unk>``) and scored with
  :meth:`NGramLM.score_candidates` (a [B, 1] point query with Katz backoff);
  the adapter exposes that score in ``lm_lps`` ONLY at closing tokens, so
  the beam adds it exactly once per word — pyctcdecode's behavior;
- ``word_bonus`` is the per-WORD insertion bonus (pyctcdecode's beta); set
  the beam's per-token ``beta=0`` when using it.

- at end-of-stream the pending partial word is scored as a full word
  (:meth:`WordNGramAdapter.final_scores`, applied by the beam searches at
  finalization) — pyctcdecode's last-word semantics;
- partial-word lookahead (pyctcdecode ``score_partial_token``): while a word
  is incomplete, a provisional penalty of ``unk_score_offset ×
  max(1, len/avg_token_len)`` applies iff the partial is NOT a prefix of any
  lexicon word (prefix membership via a second sorted hash table over every
  prefix of every word).  The adapter emits score DELTAS, so the provisional
  penalty telescopes away when the word closes and is replaced by the real
  n-gram score — completed-word totals are identical with or without it; only
  mid-word candidate ranking changes, exactly pyctcdecode's behavior.

Documented divergence from pyctcdecode: partial length is measured in UTF-8
bytes, pyctcdecode uses characters (identical for ASCII lexicons).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

_MUL = 6364136223846793005
_INC = 1442695040888963407
_M64 = (1 << 64) - 1


def _hash_bytes(text: str, h: int = _INC) -> int:
    for b in text.encode("utf-8"):
        h = (h * _MUL + b + 1) & _M64
    return h


def _piece_contribution(piece: str) -> Tuple[int, int, bool, int]:
    """(multiplier M^len, additive C, closes_word, byte_len) for one piece.

    Extending a word hash h with this piece: h' = h·M^len + C (mod 2^64).
    """
    if piece in (" ", "|", "<sep>"):
        return 1, 0, True, 0  # explicit separator: closes, contributes nothing
    closes = piece.startswith("▁")  # SPM "▁": starts a NEW word
    text = piece[1:] if closes else piece
    mult = 1
    add = 0
    for b in text.encode("utf-8"):
        mult = (mult * _MUL) & _M64
        add = (add * _MUL + b + 1) & _M64
    return mult, add, closes, len(text.encode("utf-8"))


def _split64(x: np.ndarray):
    x = x.astype(np.uint64)
    return (
        jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
    )


def _mul32_hi(x, y):
    x0 = x & jnp.uint32(0xFFFF)
    x1 = x >> jnp.uint32(16)
    y0 = y & jnp.uint32(0xFFFF)
    y1 = y >> jnp.uint32(16)
    mid = x1 * y0 + ((x0 * y0) >> jnp.uint32(16))
    mid2 = x0 * y1 + (mid & jnp.uint32(0xFFFF))
    return x1 * y1 + (mid >> jnp.uint32(16)) + (mid2 >> jnp.uint32(16))


def _muladd64(h_hi, h_lo, m_hi, m_lo, c_hi, c_lo):
    """(h·m + c) mod 2^64 on uint32 pairs."""
    lo = h_lo * m_lo
    hi = h_hi * m_lo + h_lo * m_hi + _mul32_hi(h_lo, m_lo)
    new_lo = lo + c_lo
    carry = (new_lo < lo).astype(jnp.uint32)
    return hi + c_hi + carry, new_lo


class WordNGramAdapter:
    """Beam-search LM adapter with word-boundary KenLM semantics.

    Parameters
    ----------
    word_lm : NGramLM over WORD ids (from ``load_word_arpa``).
    word_to_id : the ARPA's word vocabulary.
    tokenizer : provides ``id_to_piece`` / ``vocab_size`` for the AM vocab.
    word_bonus : per-word insertion bonus (pyctcdecode beta), added to every
        completed word's score.
    unk_logp : flat penalty when the completed word is OOV and the ARPA has
        no ``<unk>`` entry.
    unk_score_offset : pyctcdecode's provisional penalty for partials that
        are not a prefix of any lexicon word (its UNK_SCORE_OFFSET default);
        ``None`` disables the lookahead.
    avg_token_len : pyctcdecode's AVG_TOKEN_LEN — partials longer than this
        scale the penalty by ``len/avg_token_len``.
    """

    def __init__(self, word_lm, word_to_id: Dict[str, int], tokenizer,
                 word_bonus: float = 0.0, unk_logp: float = -20.0,
                 unk_score_offset: Optional[float] = -10.0,
                 avg_token_len: int = 6):
        self.lm = word_lm
        self.ctx = max(word_lm.order - 1, 1)
        self.vocab_size = tokenizer.vocab_size()
        self.word_bonus = word_bonus
        self.unk_logp = unk_logp
        self.unk_score_offset = unk_score_offset
        self.avg_token_len = avg_token_len

        V = self.vocab_size
        mult = np.ones((V,), np.uint64)
        add = np.zeros((V,), np.uint64)
        closes = np.zeros((V,), bool)
        blen = np.zeros((V,), np.int32)
        for i in range(V):
            m, a, c, n = _piece_contribution(tokenizer.id_to_piece(i))
            mult[i], add[i], closes[i], blen[i] = m, a, c, n
        self.tok_mult_hi, self.tok_mult_lo = _split64(mult)
        self.tok_add_hi, self.tok_add_lo = _split64(add)
        self.tok_closes = jnp.asarray(closes)
        self.tok_blen = jnp.asarray(blen)

        # sorted word-hash table → word id
        hashes = np.array(
            [_hash_bytes(w) for w in word_to_id], dtype=np.uint64
        )
        ids = np.array(list(word_to_id.values()), dtype=np.int32)
        order = np.argsort(hashes, kind="stable")
        hashes, ids = hashes[order], ids[order]
        self.wh_hi, self.wh_lo = _split64(hashes)
        self.wh_ids = jnp.asarray(ids)
        # probe must cover the longest equal-hi32 run (see ngram.probe_width)
        from dynamic_asr_eval_tpu.lm.ngram import probe_width

        self._probe = probe_width(
            (hashes >> np.uint64(32)).astype(np.uint32))
        self.n_words = len(word_to_id)
        self.unk_id = word_to_id.get("<unk>", -1)
        self.bos_id = word_to_id.get("<s>", -1)
        # sentinel pushed into the history for OOV words when the ARPA lacks
        # <unk>: an id outside the hash space, so later lookups back off
        self.oov_sentinel = self.n_words + 1

        if unk_score_offset is not None:
            # prefix-membership table for the lookahead: hashes of every
            # byte-prefix of every lexicon word (pyctcdecode's char trie)
            prefix_hashes = set()
            for w in word_to_id:
                if w.startswith("<"):  # specials: <s> </s> <unk>
                    continue
                h = _INC
                for b in w.encode("utf-8"):
                    h = (h * _MUL + b + 1) & _M64
                    prefix_hashes.add(h)
            ph = np.sort(np.fromiter(prefix_hashes, np.uint64,
                                     len(prefix_hashes)))
            self.pf_hi, self.pf_lo = _split64(ph)
            self.pf_probe = probe_width((ph >> np.uint64(32)).astype(np.uint32))
            # per-token: partial score of the NEW partial a CLOSING token
            # starts (its own piece content) — a host-computable constant
            p_after = np.zeros((V,), np.float32)
            for i in range(V):
                piece = tokenizer.id_to_piece(i)
                if not bool(closes[i]):
                    continue
                text = piece[1:] if piece.startswith("▁") else ""
                p_after[i] = self._host_partial_score(
                    text, _hash_bytes(text) in prefix_hashes)
            self.tok_p_after = jnp.asarray(p_after)

    def _host_partial_score(self, text: str, is_prefix: bool) -> float:
        """pyctcdecode ``score_partial_token`` on host (init-time constants)."""
        n = len(text.encode("utf-8"))
        if n == 0 or is_prefix:
            return 0.0
        s = float(self.unk_score_offset)
        if n > self.avg_token_len:
            s *= n / self.avg_token_len
        return s

    # -- device partial-word lookahead ---------------------------------------
    def _partial_scores(self, h_hi, h_lo, blen):
        """pyctcdecode ``score_partial_token`` on device: provisional penalty
        for partials that are no lexicon word's prefix, length-scaled past
        ``avg_token_len``.  Any shape; returns matching f32."""
        if self.unk_score_offset is None:
            return jnp.zeros(blen.shape, jnp.float32)
        n = self.pf_hi.shape[0]
        left = jnp.searchsorted(self.pf_hi, h_hi, side="left")
        idxs = jnp.clip(left[..., None] + jnp.arange(self.pf_probe), 0, n - 1)
        found = (
            (self.pf_hi[idxs] == h_hi[..., None])
            & (self.pf_lo[idxs] == h_lo[..., None])
        ).any(-1)
        scale = jnp.maximum(blen.astype(jnp.float32) / self.avg_token_len, 1.0)
        return jnp.where(
            found | (blen <= 0), 0.0, self.unk_score_offset * scale
        )

    # -- device word-id lookup ----------------------------------------------
    def _word_id(self, h_hi, h_lo):
        n = self.wh_hi.shape[0]
        left = jnp.searchsorted(self.wh_hi, h_hi, side="left")
        PROBE = self._probe
        idxs = jnp.clip(left[..., None] + jnp.arange(PROBE), 0, n - 1)
        hit = (self.wh_hi[idxs] == h_hi[..., None]) & (
            self.wh_lo[idxs] == h_lo[..., None]
        )
        any_hit = hit.any(-1)
        first = jnp.argmax(hit, axis=-1)
        sel = jnp.take_along_axis(idxs, first[..., None], axis=-1)[..., 0]
        return any_hit, self.wh_ids[sel]

    # -- lm_lps from state ----------------------------------------------------
    def _close_of(self, hist, hlen, h_hi, h_lo, wlen):
        """[B]: n-gram score (+ word bonus) of closing the current partial
        word, 0 when nothing is pending."""
        found, wid = self._word_id(h_hi, h_lo)
        if self.unk_id >= 0:
            wid_eff = jnp.where(found, wid, self.unk_id)
            close = self.lm.score_candidates(hist, hlen, wid_eff[:, None])[:, 0]
        else:
            close = jnp.where(
                found,
                self.lm.score_candidates(hist, hlen, wid[:, None])[:, 0],
                self.unk_logp,
            )
        close = close + self.word_bonus
        return jnp.where(wlen > 0, close, 0.0)  # nothing to close yet

    def _lm_lps(self, state):
        """[B, V]: score DELTA added if token v is emitted.  Closing tokens:
        completed word's n-gram score, minus the provisional partial penalty
        being replaced, plus the new partial's penalty (the piece's own
        content).  Non-closing tokens: the change in partial penalty.  Deltas
        telescope, so completed-word totals never see the lookahead."""
        hist, hlen, h_hi, h_lo, wlen, p_cur = state
        close = self._close_of(hist, hlen, h_hi, h_lo, wlen)
        base = jnp.where(self.tok_closes[None, :], close[:, None], 0.0)
        if self.unk_score_offset is None:
            return base
        ext_hi, ext_lo = _muladd64(
            h_hi[:, None], h_lo[:, None],
            self.tok_mult_hi[None, :], self.tok_mult_lo[None, :],
            self.tok_add_hi[None, :], self.tok_add_lo[None, :],
        )
        p_ext = self._partial_scores(
            ext_hi, ext_lo, wlen[:, None] + self.tok_blen[None, :]
        )
        p_next = jnp.where(
            self.tok_closes[None, :], self.tok_p_after[None, :], p_ext
        )
        return base + p_next - p_cur[:, None]

    def init_state(self, batch: int):
        hist = jnp.full((batch, self.ctx), -1, jnp.int32)
        hlen = jnp.zeros((batch,), jnp.int32)
        if self.bos_id >= 0:
            hist = hist.at[:, -1].set(self.bos_id)
            hlen = hlen + 1
        h_hi = jnp.full((batch,), jnp.uint32(_INC >> 32))
        h_lo = jnp.full((batch,), jnp.uint32(_INC & 0xFFFFFFFF))
        wlen = jnp.zeros((batch,), jnp.int32)
        p_cur = jnp.zeros((batch,), jnp.float32)
        state = (hist, hlen, h_hi, h_lo, wlen, p_cur)
        return state, self._lm_lps(state)

    def advance(self, state, tokens, mask):
        hist, hlen, h_hi, h_lo, wlen, p_cur = state
        tokens = tokens.astype(jnp.int32)
        closes = self.tok_closes[tokens] & mask
        closing_real = closes & (wlen > 0)

        # push the completed word into the history
        found, wid = self._word_id(h_hi, h_lo)
        push = jnp.where(
            found, wid,
            self.unk_id if self.unk_id >= 0 else self.oov_sentinel,
        ).astype(jnp.int32)
        new_hist = jnp.concatenate([hist[:, 1:], push[:, None]], axis=1)
        new_hlen = jnp.minimum(hlen + 1, self.ctx)
        hist = jnp.where(closing_real[:, None], new_hist, hist)
        hlen = jnp.where(closing_real, new_hlen, hlen)

        # extend / restart the partial-word hash
        seed_hi = jnp.full_like(h_hi, jnp.uint32(_INC >> 32))
        seed_lo = jnp.full_like(h_lo, jnp.uint32(_INC & 0xFFFFFFFF))
        base_hi = jnp.where(closes, seed_hi, h_hi)
        base_lo = jnp.where(closes, seed_lo, h_lo)
        ext_hi, ext_lo = _muladd64(
            base_hi, base_lo,
            self.tok_mult_hi[tokens], self.tok_mult_lo[tokens],
            self.tok_add_hi[tokens], self.tok_add_lo[tokens],
        )
        new_wlen = jnp.where(closes, 0, wlen) + self.tok_blen[tokens]
        h_hi = jnp.where(mask, ext_hi, h_hi)
        h_lo = jnp.where(mask, ext_lo, h_lo)
        wlen = jnp.where(mask, new_wlen, wlen)
        if self.unk_score_offset is not None:
            p_cur = jnp.where(
                mask, self._partial_scores(h_hi, h_lo, wlen), p_cur
            )

        state = (hist, hlen, h_hi, h_lo, wlen, p_cur)
        return state, self._lm_lps(state)

    def gather(self, state, idx):
        return tuple(x[idx] for x in state)

    def final_scores(self, state):
        """[B]: end-of-stream delta — score the pending PARTIAL word as a
        full word (pyctcdecode finalization; without this the last word of
        every recording goes unscored) and retire its provisional lookahead
        penalty.  The beam search adds ``alpha ×`` this to the final beam
        scores (no ``beta``: no token is emitted)."""
        hist, hlen, h_hi, h_lo, wlen, p_cur = state
        return self._close_of(hist, hlen, h_hi, h_lo, wlen) - p_cur
