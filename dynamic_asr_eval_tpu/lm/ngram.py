"""N-gram language model: ARPA loader → dense device tables with backoff.

The reference fuses a KenLM 4-gram (``4gram_big.arpa.gz``, listed in
``.MISSING_LARGE_BLOBS:1``) through pyctcdecode's C++ runtime
(``wav2vec2/tedlium/run.py:127-133``, ``lcasr/run_in_dataset_eval.py:55-56``).
TPU-native equivalent (named explicitly by the BASELINE.json north star):

- host side: parse ARPA (optionally gzipped) into hashed context tables —
  for each order, sorted uint64 keys → (log10 prob, backoff) values;
- device side: :meth:`NGramLM.score_next` computes ``[B, V]`` next-token
  log-probs for a batch of contexts entirely with ``jnp.searchsorted`` on the
  sorted key arrays (vectorized binary search — no host round-trips), with
  standard Katz backoff  P(w|h) = p(h,w) if seen else b(h)·P(w|h').

Vocabulary is indexed by token id; the caller supplies the token-string→id
mapping when loading (tokens absent from the tokenizer are dropped).
"""

from __future__ import annotations

import gzip
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LOG10 = math.log(10.0)

# 64-bit FNV-style rolling hash over (order, token ids); computed with python
# ints on host and uint32-pair arithmetic on device.
_MUL = np.uint64(6364136223846793005)
_INC = np.uint64(1442695040888963407)


def _hash_ctx(tokens: Sequence[int]) -> int:
    h = np.uint64(_INC)
    for t in tokens:
        h = np.uint64((int(h) * int(_MUL) + (int(t) + 1)) % (1 << 64))
    return int(h)


def probe_width(hi_sorted: np.ndarray, minimum: int = 8) -> int:
    """Linear-probe width for a sorted hi-32 key array: the maximum run of
    equal hi-32 values (a probe shorter than the longest duplicate run turns
    a table hit into a silent backoff/unk).  Computed once at build time —
    at KenLM scale (~1M+ n-grams) birthday collisions in 32 bits are routine."""
    n = len(hi_sorted)
    if n == 0:
        return minimum
    change = np.nonzero(np.diff(hi_sorted))[0]
    bounds = np.concatenate([[-1], change, [n - 1]])
    return max(minimum, int(np.max(np.diff(bounds))))


class NGramLM:
    """Backoff n-gram tables over token ids.

    Tables per order k (1-indexed): sorted ``keys[k]`` (uint64 hashes of the
    k-token n-gram), ``logp[k]`` (natural log), ``backoff[k]`` (natural log,
    hashed by the k-token context for order k+1 lookups).
    """

    def __init__(self, order: int, tables: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]],
                 vocab_size: int, unk_logp: float = -20.0):
        self.order = order
        self.vocab_size = vocab_size
        self.unk_logp = unk_logp
        # device arrays; split uint64 keys into hi/lo uint32 pairs packed as
        # a single sorted float-free comparison via two int32 arrays is
        # awkward — instead store keys as sorted uint64-as-2xuint32 interleave
        # trick.  TPUs lack int64, so we keep keys as sorted *pairs* encoded
        # into float64?  no — simplest robust device encoding: keys mod 2^52
        # stored exactly in float64 is unavailable under x32.  We therefore
        # re-hash to 32-bit pairs: primary sorted array of hi32 with
        # secondary lo32 resolved by a short linear probe.
        self.keys_hi: Dict[int, jnp.ndarray] = {}
        self.keys_lo: Dict[int, jnp.ndarray] = {}
        self.logp: Dict[int, jnp.ndarray] = {}
        self.backoff: Dict[int, jnp.ndarray] = {}
        self.probe: Dict[int, int] = {}
        for k, (keys, logp, backoff) in tables.items():
            order_idx = np.argsort(keys, kind="stable")
            keys = keys[order_idx]
            hi = (keys >> np.uint64(32)).astype(np.uint32)
            self.keys_hi[k] = jnp.asarray(hi)
            self.keys_lo[k] = jnp.asarray((keys & np.uint64(0xFFFFFFFF)).astype(np.uint32))
            self.logp[k] = jnp.asarray(logp[order_idx].astype(np.float32))
            self.backoff[k] = jnp.asarray(backoff[order_idx].astype(np.float32))
            # probe must cover the longest equal-hi32 run or lookups can
            # silently miss; audited here at build time
            self.probe[k] = probe_width(hi)

    # -- device-side lookup -------------------------------------------------
    def _lookup(self, k: int, h_hi: jnp.ndarray, h_lo: jnp.ndarray):
        """Vectorized lookup of hashes in order-k table.
        Returns (found mask, logp, backoff)."""
        keys_hi, keys_lo = self.keys_hi[k], self.keys_lo[k]
        n = keys_hi.shape[0]
        if n == 0:
            z = jnp.zeros(h_hi.shape, jnp.float32)
            return jnp.zeros(h_hi.shape, bool), z, z
        # combined sort key: hi*2^32+lo is the sort order; searchsorted on hi
        # then linear probe over duplicates of hi — probe width covers the
        # table's longest duplicate-hi32 run (audited in __init__)
        left = jnp.searchsorted(keys_hi, h_hi, side="left")
        PROBE = self.probe[k]
        idxs = jnp.clip(left[..., None] + jnp.arange(PROBE), 0, n - 1)
        cand_hi = keys_hi[idxs]
        cand_lo = keys_lo[idxs]
        hit = (cand_hi == h_hi[..., None]) & (cand_lo == h_lo[..., None])
        any_hit = hit.any(-1)
        first = jnp.argmax(hit, axis=-1)
        sel = jnp.take_along_axis(idxs, first[..., None], axis=-1)[..., 0]
        lp = self.logp[k][sel]
        bo = self.backoff[k][sel]
        return any_hit, lp, bo

    @staticmethod
    def _roll_hash(h_hi, h_lo, token):
        """64-bit LCG step on (hi, lo) uint32 pairs: h = h*MUL + token + 1."""
        mul_hi = jnp.uint32(int(_MUL) >> 32)
        mul_lo = jnp.uint32(int(_MUL) & 0xFFFFFFFF)
        a = h_lo.astype(jnp.uint64) if False else None  # no uint64 on TPU
        # 32x32 multiply-accumulate in uint32 with carry emulation
        lo = h_lo * mul_lo
        # carry of h_lo*mul_lo: use 16-bit split
        def mul32_hi(x, y):
            x0 = x & jnp.uint32(0xFFFF); x1 = x >> jnp.uint32(16)
            y0 = y & jnp.uint32(0xFFFF); y1 = y >> jnp.uint32(16)
            mid = x1 * y0 + ((x0 * y0) >> jnp.uint32(16))
            mid2 = x0 * y1 + (mid & jnp.uint32(0xFFFF))
            return x1 * y1 + (mid >> jnp.uint32(16)) + (mid2 >> jnp.uint32(16))

        hi = h_hi * mul_lo + h_lo * mul_hi + mul32_hi(h_lo, mul_lo)
        t = (token + 1).astype(jnp.uint32)
        new_lo = lo + t
        carry = (new_lo < lo).astype(jnp.uint32)
        return hi + carry, new_lo

    def score_candidates(self, context_tokens: jnp.ndarray,
                         context_lens: jnp.ndarray, cand: jnp.ndarray):
        """Log-probs of candidate next tokens ``cand [B, C]`` given per-row
        contexts.  Katz backoff across orders; returns [B, C] natural log.
        ``score_next`` is the ``C == vocab_size`` case; the word-fusion
        adapter uses ``C == 1`` point queries (one word per beam)."""
        B, C = cand.shape
        cand = cand.astype(jnp.int32)

        # start from unigram
        h0_hi = jnp.full((B, C), jnp.uint32(int(_INC) >> 32))
        h0_lo = jnp.full((B, C), jnp.uint32(int(_INC) & 0xFFFFFFFF))
        uh_hi, uh_lo = self._roll_hash(h0_hi, h0_lo, cand)
        found, lp, _ = self._lookup(1, uh_hi, uh_lo)
        scores = jnp.where(found, lp, self.unk_logp)  # [B, C]

        # iteratively refine with higher orders
        for k in range(2, self.order + 1):
            ctx_len_needed = k - 1
            # context hash of the last (k-1) tokens
            ch_hi = jnp.full((B,), jnp.uint32(int(_INC) >> 32))
            ch_lo = jnp.full((B,), jnp.uint32(int(_INC) & 0xFFFFFFFF))
            W = context_tokens.shape[1]
            for j in range(ctx_len_needed):
                # buffer is right-aligned: most recent token at [:, -1]
                tok = context_tokens[:, W - ctx_len_needed + j]
                ch_hi, ch_lo = self._roll_hash(ch_hi, ch_lo, tok.astype(jnp.int32))
            have_ctx = context_lens >= ctx_len_needed
            # backoff weight of the context (stored in order k-1 table)
            ctx_found, _, ctx_bo = self._lookup(k - 1, ch_hi, ch_lo)
            bo = jnp.where(ctx_found, ctx_bo, 0.0)  # [B]
            # full k-gram hash for each candidate token
            fh_hi, fh_lo = self._roll_hash(
                jnp.broadcast_to(ch_hi[:, None], (B, C)),
                jnp.broadcast_to(ch_lo[:, None], (B, C)),
                cand,
            )
            kfound, klp, _ = self._lookup(k, fh_hi, fh_lo)
            upd = jnp.where(kfound, klp, scores + bo[:, None])
            scores = jnp.where(have_ctx[:, None], upd, scores)
        return scores

    def score_next(self, context_tokens: jnp.ndarray, context_lens: jnp.ndarray):
        """Next-token log-probs for every vocab id.

        context_tokens [B, order-1] (left-padded with -1), context_lens [B].
        Returns [B, V] natural-log probabilities with Katz backoff.
        """
        B = context_tokens.shape[0]
        vocab = jnp.broadcast_to(
            jnp.arange(self.vocab_size, dtype=jnp.int32)[None], (B, self.vocab_size)
        )
        return self.score_candidates(context_tokens, context_lens, vocab)


def _iter_arpa(path: str, max_order: Optional[int] = None):
    """Yield ``(order, logp_log10, tokens, backoff_log10)`` rows of an ARPA
    file (optionally .gz).  Unigrams are guaranteed to come before higher
    orders by the ARPA format."""
    opener = gzip.open if path.endswith(".gz") else open
    cur = None
    with opener(path, "rt", encoding="utf-8", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("\\") and "-grams:" in line:
                cur = int(line[1:].split("-")[0])
                if max_order and cur > max_order:
                    cur = None
                continue
            if line.startswith("\\") or line.startswith("ngram ") or cur is None:
                if line == "\\end\\":
                    break
                continue
            parts = line.split("\t")
            if len(parts) < 2:
                parts = line.split()
                if len(parts) < cur + 1:
                    continue
                logp = float(parts[0])
                toks = parts[1 : 1 + cur]
                bo = float(parts[1 + cur]) if len(parts) > cur + 1 else 0.0
            else:
                logp = float(parts[0])
                toks = parts[1].split(" ")
                bo = float(parts[2]) if len(parts) > 2 else 0.0
            yield cur, logp, toks, bo


def _tables_to_numpy(tables: Dict[int, List[Tuple[int, float, float]]]):
    np_tables = {}
    for k, rows in tables.items():
        if not rows:
            continue
        keys = np.array([r[0] for r in rows], dtype=np.uint64)
        logp = np.array([r[1] for r in rows], dtype=np.float32)
        bo = np.array([r[2] for r in rows], dtype=np.float32)
        np_tables[k] = (keys, logp, bo)
    return np_tables


def _warn_dropped(path: str, total: int, kept: int, warn_drop_fraction: float):
    if total and (total - kept) / total > warn_drop_fraction:
        import warnings

        msg = (
            f"load_arpa: dropped {total - kept}/{total} n-grams "
            f"({100.0 * (total - kept) / total:.1f}%) because their tokens are "
            f"not in the tokenizer vocab — '{path}' looks like a WORD-level "
            f"LM; token-level fusion will be a near-no-op.  Use "
            f"lm.word_fusion.load_word_arpa + WordNGramAdapter instead."
        )
        print(f"WARNING: {msg}")
        warnings.warn(msg, stacklevel=2)


def _load_arpa_native(
    path: str,
    token_to_id: Dict[str, int],
    vocab_size: int,
    max_order: Optional[int],
    warn_drop_fraction: float,
) -> NGramLM:
    """Native-reader fast path: C++ parse + vectorized numpy hashing."""
    from dynamic_asr_eval_tpu.lm import arpa_native

    vocab, raw = arpa_native.parse_arpa(path, max_order)
    id_map = np.array([token_to_id.get(w, -1) for w in vocab], np.int64)
    np_tables: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    order = 0
    total = kept = 0
    for k, (ids, lp, bo) in raw.items():
        order = max(order, k)
        total += ids.shape[0]
        mapped = id_map[ids] if len(vocab) else np.empty_like(ids, np.int64)
        valid = (mapped >= 0).all(axis=1)
        kept += int(valid.sum())
        if not valid.any():
            continue
        keys = arpa_native.hash_rows(mapped[valid])
        np_tables[k] = (keys, lp[valid] * LOG10, bo[valid] * LOG10)
    _warn_dropped(path, total, kept, warn_drop_fraction)
    return NGramLM(order, np_tables, vocab_size)


def load_arpa(
    path: str,
    token_to_id: Dict[str, int],
    vocab_size: int,
    max_order: Optional[int] = None,
    warn_drop_fraction: float = 0.2,
    use_native: Optional[bool] = None,
) -> NGramLM:
    """Parse an ARPA file (optionally .gz) into an :class:`NGramLM` indexed
    by TOKENIZER ids.

    Log10 values are converted to natural log; n-grams containing tokens not
    in ``token_to_id`` are dropped.  ``<s>``/``</s>``/``<unk>`` map to ids
    only if present in the mapping, else are skipped.

    If more than ``warn_drop_fraction`` of the n-grams are dropped the ARPA
    vocabulary does not match the tokenizer — almost always a WORD-level LM
    (e.g. the reference's ``4gram_big.arpa.gz``) loaded against a char or
    subword vocab, where fusion silently degrades to a no-op.  Use
    :func:`load_word_arpa` + ``WordNGramAdapter`` for those.

    ``use_native`` selects the C++ reader (``native/arpa_reader.cc``, the
    KenLM-loader equivalent); default auto-detects and falls back to the
    pure-Python parser.
    """
    from dynamic_asr_eval_tpu.lm import arpa_native

    if use_native is None:
        use_native = arpa_native.available()
    if use_native:
        try:
            return _load_arpa_native(
                path, token_to_id, vocab_size, max_order, warn_drop_fraction
            )
        except RuntimeError:
            pass  # fall back to the Python parser

    tables: Dict[int, List[Tuple[int, float, float]]] = {}
    order = 0
    total = kept = 0
    for cur, logp, toks, bo in _iter_arpa(path, max_order):
        order = max(order, cur)
        tables.setdefault(cur, [])
        total += 1
        ids = [token_to_id.get(t) for t in toks]
        if any(i is None for i in ids):
            continue
        kept += 1
        tables[cur].append((_hash_ctx(ids), logp * LOG10, bo * LOG10))

    _warn_dropped(path, total, kept, warn_drop_fraction)
    return NGramLM(order, _tables_to_numpy(tables), vocab_size)


def load_word_arpa(
    path: str,
    max_order: Optional[int] = None,
    use_native: Optional[bool] = None,
) -> Tuple[NGramLM, Dict[str, int]]:
    """Parse a WORD-level ARPA into an :class:`NGramLM` over WORD ids plus
    the word→id mapping (ids assigned from the unigram section, which the
    ARPA format guarantees to precede higher orders)."""
    from dynamic_asr_eval_tpu.lm import arpa_native

    if use_native is None:
        use_native = arpa_native.available()
    if use_native:
        try:
            return _load_word_arpa_native(path, max_order)
        except RuntimeError:
            pass  # fall back to the Python parser

    word_to_id: Dict[str, int] = {}
    tables: Dict[int, List[Tuple[int, float, float]]] = {}
    order = 0
    for cur, logp, toks, bo in _iter_arpa(path, max_order):
        order = max(order, cur)
        tables.setdefault(cur, [])
        if cur == 1:
            word_to_id.setdefault(toks[0], len(word_to_id))
        ids = [word_to_id.get(t) for t in toks]
        if any(i is None for i in ids):
            continue
        tables[cur].append((_hash_ctx(ids), logp * LOG10, bo * LOG10))
    return NGramLM(order, _tables_to_numpy(tables), len(word_to_id)), word_to_id


def _load_word_arpa_native(
    path: str, max_order: Optional[int]
) -> Tuple[NGramLM, Dict[str, int]]:
    """Native-reader fast path for :func:`load_word_arpa`.  Word ids are
    assigned by unigram-section order (exactly the Python loader's scheme);
    higher-order rows containing words absent from the unigrams are dropped,
    matching the fallback's semantics."""
    from dynamic_asr_eval_tpu.lm import arpa_native

    vocab, raw = arpa_native.parse_arpa(path, max_order)
    if 1 not in raw:
        return NGramLM(0, {}, 0), {}
    uni_ids = raw[1][0][:, 0]  # native intern ids of the unigram words
    id_map = np.full((len(vocab),), -1, np.int64)
    word_to_id: Dict[str, int] = {}
    for rank, nid in enumerate(uni_ids):
        if id_map[nid] == -1:  # first unigram occurrence wins
            id_map[nid] = len(word_to_id)
            word_to_id[vocab[nid]] = id_map[nid]
    np_tables: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    order = 0
    for k, (ids, lp, bo) in raw.items():
        order = max(order, k)
        mapped = id_map[ids]
        valid = (mapped >= 0).all(axis=1)
        if not valid.any():
            continue
        keys = arpa_native.hash_rows(mapped[valid])
        np_tables[k] = (keys, lp[valid] * LOG10, bo[valid] * LOG10)
    return NGramLM(order, np_tables, len(word_to_id)), word_to_id
