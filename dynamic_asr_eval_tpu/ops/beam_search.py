"""CTC beam search with LM shallow fusion.

Capability parity with the reference's ``lcasr/ctc_beam_search.py`` (semantics
mapped from ``BeamSearch.step``, ``:212-319``):

- beams are keyed by the collapsed token sequence plus a trailing-blank
  marker (``am_sequence``; blank appended only when last ≠ blank, and a
  trailing blank is *replaced* by a following non-blank token, ``:255-260``);
- extension classes per frame: blank (``score += am[blank] + blank_penalty``),
  repeat of the last token when not after blank (``+ repetition_penalty``),
  or a new token with fused LM score ``am + α·lm + β`` (``:230-268``);
- only tokens with ``am > max + top_am_threshold`` are considered (``:225``);
  token id 0 is by default never proposed (reference loop starts at 1,
  ``:244`` — SPM id 0 is special there; pass ``exclude_token_zero=False``
  for tokenizers where 0 is a real symbol);
- equal-key beams merge by log-sum-exp (``:161-169``), then top-``beam_width``
  pruning and score-gap pruning (``prune_less_than_val``, ``:205-210``);
- the LM advances only for beams that emitted a new token (``:284-312``).

Two implementations with identical semantics:

- :class:`BeamSearchHost` — a clear numpy implementation (reference for
  tests, and the practical path for CPU decoding);
- :func:`beam_search_device` — the TPU-native version: fixed beam width,
  prefixes as rolling 64-bit hashes (uint32 pairs), merge via a pairwise
  equality mask + row logsumexp, the whole time loop a jitted ``lax.scan``;
  the LM state is carried *lazily* (a permutation vector composes beam
  reorders) and is physically gathered + advanced only on frames where some
  selected beam emitted a new token (static shapes throughout).

LM interface (both versions): an adapter with
``init_state(batch) -> (state, lps [batch, V])``,
``advance(state, tokens [batch], mask [batch]) -> (state, lps)``, and
``gather(state, idx)`` for beam reindexing.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# LM adapters
# ---------------------------------------------------------------------------


class UniformLMAdapter:
    """No-LM fusion: every next-token log-prob is 0 (α scales it away)."""

    def __init__(self, vocab_size: int):
        self.vocab_size = vocab_size

    def init_state(self, batch: int):
        return jnp.zeros((batch, 0), jnp.int32), jnp.zeros((batch, self.vocab_size), jnp.float32)

    def advance(self, state, tokens, mask):
        return state, jnp.zeros((tokens.shape[0], self.vocab_size), jnp.float32)

    def gather(self, state, idx):
        return state[idx]


class NGramAdapter:
    """Backoff n-gram fusion over :class:`dynamic_asr_eval_tpu.lm.ngram.NGramLM`.

    State = last (order-1) token ids per beam (left-shifted buffer) + count."""

    def __init__(self, ngram, bos_id: Optional[int] = None):
        self.lm = ngram
        self.ctx = max(ngram.order - 1, 1)
        self.bos_id = bos_id

    def init_state(self, batch: int):
        toks = jnp.full((batch, self.ctx), -1, jnp.int32)
        lens = jnp.zeros((batch,), jnp.int32)
        if self.bos_id is not None:
            toks = toks.at[:, -1].set(self.bos_id)
            lens = lens + 1
        state = (toks, lens)
        lps = self.lm.score_next(toks, lens)
        return state, lps

    def advance(self, state, tokens, mask):
        toks, lens = state
        new_toks = jnp.concatenate([toks[:, 1:], tokens[:, None].astype(jnp.int32)], axis=1)
        new_lens = jnp.minimum(lens + 1, self.ctx)
        toks = jnp.where(mask[:, None], new_toks, toks)
        lens = jnp.where(mask, new_lens, lens)
        lps = self.lm.score_next(toks, lens)
        return (toks, lens), lps

    def gather(self, state, idx):
        toks, lens = state
        return toks[idx], lens[idx]


class TransformerLMAdapter:
    """Neural-LM fusion over :class:`lm.transformer_lm.TransformerLM` with the
    fixed-size ring-buffer KV cache."""

    def __init__(self, model, variables, config, bos_id: int = 0):
        self.model = model
        self.variables = variables
        self.config = config
        self.bos_id = bos_id

    def init_state(self, batch: int):
        from dynamic_asr_eval_tpu.lm.transformer_lm import empty_cache

        cache = empty_cache(self.config, batch)
        toks = jnp.full((batch,), self.bos_id, jnp.int32)
        lps, cache = self.model.apply(self.variables, toks, cache)
        return cache, lps

    def advance(self, state, tokens, mask):
        # masked rows never touch the cache: the ring write is dropped inside
        # the model (write_mask), which is ~200 MB/call cheaper than where-
        # merging the full [L, B, H, N, D] caches after the fact
        lps, new_cache = self.model.apply(
            self.variables, tokens.astype(jnp.int32), state, write_mask=mask
        )
        return new_cache, lps

    def gather(self, state, idx):
        return {
            "k": state["k"][:, idx],
            "v": state["v"][:, idx],
            "lengths": state["lengths"][idx],
        }


def collapse_blank_frames(
    log_probs: np.ndarray,  # [T, V+1]
    blank_id: Optional[int] = None,
    threshold: float = 0.995,
) -> np.ndarray:
    """Blank-run collapse ("Blank Collapse", arXiv:2210.17017): drop frames
    whose blank probability exceeds ``threshold``, keeping ONE frame per
    blank run so the repeat/new-token separation semantics survive.  CTC
    emissions are blank-dominated (~80-90% of frames), so beam search over
    the compacted matrix is typically 5-10× faster with negligible WER
    effect.  Host-side preprocessing (runs once per recording)."""
    lp = np.asarray(log_probs)
    blank = lp.shape[1] - 1 if blank_id is None else blank_id
    blank_dom = lp[:, blank] > np.log(threshold)
    prev_dom = np.concatenate([[False], blank_dom[:-1]])
    keep = ~(blank_dom & prev_dom)  # keep the first blank of each run
    return lp[keep]


@partial(jax.jit, static_argnames=("blank_id",))
def collapse_blank_frames_device(
    log_probs: jnp.ndarray,  # [T, V+1] device log-probs
    blank_id: Optional[int] = None,
    threshold: float = 0.995,
    valid_frames: Optional[jnp.ndarray] = None,
):
    """Device-resident :func:`collapse_blank_frames`: same keep rule, but the
    compaction happens ON the chip (cumsum index + one scatter), so the
    stitched posterior matrix never crosses to the host.  This is the
    TPU-native final-decode path — the engine's ``EngineOutput.logits`` is
    already a device array, and round-tripping it (885 MB at Earnings-22
    scale) through host numpy + the tunnel costs more than the decode itself
    under host load (PERF.md round-4 LM reconciliation).

    Returns ``(compacted [T, V+1] — rows ≥ n_kept are zeros, n_kept)``;
    slice with ``int(n_kept)`` before decoding."""
    lp = log_probs
    T = lp.shape[0]
    blank = lp.shape[1] - 1 if blank_id is None else blank_id
    valid = (jnp.arange(T) < valid_frames) if valid_frames is not None else jnp.ones((T,), bool)
    blank_dom = (lp[:, blank] > jnp.log(threshold)) & valid
    prev_dom = jnp.concatenate([jnp.zeros((1,), bool), blank_dom[:-1]])
    keep = ~(blank_dom & prev_dom) & valid
    idx = jnp.cumsum(keep) - 1
    pos = jnp.where(keep, idx, T)  # dropped rows scatter off the end
    out = jnp.zeros_like(lp).at[pos].set(lp, mode="drop")
    return out, jnp.sum(keep).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Host reference implementation
# ---------------------------------------------------------------------------


class _HostBeam(NamedTuple):
    prefix: tuple  # collapsed token sequence
    ends_blank: bool
    score: float
    lm_state: object  # adapter state of batch 1
    lm_lps: np.ndarray  # [V]


def _logaddexp(a, b):
    if a == -math.inf:
        return b
    if b == -math.inf:
        return a
    m = max(a, b)
    return m + math.log(math.exp(a - m) + math.exp(b - m))


class BeamSearchHost:
    """Reference-semantics beam search on host (clear numpy loop; per-beam
    batch-1 LM states — clarity over speed, used for tests and CPU decode)."""

    def __init__(
        self,
        log_probs: np.ndarray,  # [T, V+1]
        lm_adapter,
        beam_width: int = 25,
        alpha: float = 0.45,
        beta: float = 1.53,
        blank_id: Optional[int] = None,
        blank_penalty: float = 0.0,
        repetition_penalty: float = 0.0,
        top_am_threshold: float = -6.0,
        prune_less_than_val: Optional[float] = 3.17,
        exclude_token_zero: bool = True,
        debug: bool = False,
    ):
        self.log_probs = np.asarray(log_probs)
        self.V = self.log_probs.shape[1] - 1
        self.blank_id = self.V if blank_id is None else blank_id
        self.lm = lm_adapter
        self.beam_width = beam_width
        self.alpha, self.beta = alpha, beta
        self.blank_penalty = blank_penalty
        self.repetition_penalty = repetition_penalty
        self.top_am_threshold = top_am_threshold
        self.prune_less_than_val = prune_less_than_val
        self.exclude_token_zero = exclude_token_zero
        # per-step operation counters printed when debug=True — the
        # reference's `debug` beam-search tracing (ctc_beam_search.py:104,
        # 153,276): candidates proposed, beams merged, beams pruned, LM calls
        self.debug = debug
        self.debug_counts = {"candidates": 0, "merges": 0, "pruned": 0,
                             "lm_advances": 0}
        self.beams: List[_HostBeam] = []

    def run_search(self, use_tqdm: bool = False) -> List[Tuple[tuple, float]]:
        T = self.log_probs.shape[0]
        state, lps = self.lm.init_state(1)
        self.beams = [
            _HostBeam(prefix=(), ends_blank=False, score=0.0,
                      lm_state=state, lm_lps=np.asarray(lps)[0])
        ]

        for t in range(T):
            am = self.log_probs[t]
            thresh = am.max() + self.top_am_threshold
            lo = 1 if self.exclude_token_zero else 0
            top = [v for v in range(lo, self.V + 1) if am[v] > thresh]

            # key -> [score, parent_beam, is_new, token]
            cand = {}
            for beam in self.beams:
                for v in top:
                    if v == self.blank_id:
                        key = (beam.prefix, True)
                        s = beam.score + am[v] + self.blank_penalty
                        entry = (beam, False, -1)
                    elif beam.prefix and beam.prefix[-1] == v and not beam.ends_blank:
                        key = (beam.prefix, False)
                        s = beam.score + am[v] + self.repetition_penalty
                        entry = (beam, False, -1)
                    else:
                        key = (beam.prefix + (v,), False)
                        s = beam.score + am[v] + self.alpha * beam.lm_lps[v] + self.beta
                        entry = (beam, True, v)
                    if key in cand:
                        cand[key][0] = _logaddexp(cand[key][0], s)
                        self.debug_counts["merges"] += 1
                    else:
                        cand[key] = [s, *entry]
                    self.debug_counts["candidates"] += 1

            if not cand:
                # no token above threshold was proposable (e.g. only token 0
                # dominated the frame) — skip the frame instead of dying (the
                # reference would end with zero beams here)
                continue

            merged = sorted(cand.items(), key=lambda kv: -kv[1][0])[: self.beam_width]
            if self.prune_less_than_val is not None and merged:
                best = merged[0][1][0]
                kept = [m for m in merged if m[1][0] >= best - self.prune_less_than_val]
                self.debug_counts["pruned"] += len(merged) - len(kept)
                merged = kept

            advance_lm = t < T - 1
            new_beams = []
            for (prefix, ends_blank), (s, parent, is_new, tok) in merged:
                if is_new and advance_lm:
                    st, lp = self.lm.advance(
                        parent.lm_state, jnp.asarray([tok]), jnp.ones((1,), bool)
                    )
                    self.debug_counts["lm_advances"] += 1
                    new_beams.append(_HostBeam(prefix, ends_blank, s, st, np.asarray(lp)[0]))
                else:
                    new_beams.append(
                        _HostBeam(prefix, ends_blank, s, parent.lm_state, parent.lm_lps)
                    )
            self.beams = new_beams
            if self.debug:
                print(f"beam t={t}: beams={len(self.beams)} "
                      f"best={self.beams[0].score:.3f} "
                      f"cand={self.debug_counts['candidates']} "
                      f"merge={self.debug_counts['merges']} "
                      f"prune={self.debug_counts['pruned']} "
                      f"lm={self.debug_counts['lm_advances']}")

        if hasattr(self.lm, "final_scores"):
            # end-of-stream finalization (pyctcdecode last-word semantics):
            # word-boundary adapters score the pending partial word
            self.beams = [
                b._replace(
                    score=b.score
                    + self.alpha * float(np.asarray(self.lm.final_scores(b.lm_state))[0])
                )
                for b in self.beams
            ]
            self.beams.sort(key=lambda b: -b.score)
        return [(b.prefix, b.score) for b in self.beams]

    def return_text(self, idx: int, tokenizer) -> str:
        if idx >= len(self.beams):
            return ""
        return tokenizer.decode(list(self.beams[idx].prefix))


# ---------------------------------------------------------------------------
# Device implementation
# ---------------------------------------------------------------------------

_MUL_HI = np.uint32(6364136223846793005 >> 32)
_MUL_LO = np.uint32(6364136223846793005 & 0xFFFFFFFF)
_INC_HI = np.uint32(1442695040888963407 >> 32)
_INC_LO = np.uint32(1442695040888963407 & 0xFFFFFFFF)


def _mul32_hi(x, y):
    x0 = x & jnp.uint32(0xFFFF)
    x1 = x >> jnp.uint32(16)
    y0 = y & jnp.uint32(0xFFFF)
    y1 = y >> jnp.uint32(16)
    mid = x1 * y0 + ((x0 * y0) >> jnp.uint32(16))
    mid2 = x0 * y1 + (mid & jnp.uint32(0xFFFF))
    return x1 * y1 + (mid >> jnp.uint32(16)) + (mid2 >> jnp.uint32(16))


def _roll_hash(h_hi, h_lo, token):
    lo = h_lo * _MUL_LO
    hi = h_hi * _MUL_LO + h_lo * _MUL_HI + _mul32_hi(h_lo, _MUL_LO)
    t = (token + 1).astype(jnp.uint32)
    new_lo = lo + t
    carry = (new_lo < lo).astype(jnp.uint32)
    return hi + carry, new_lo


class DeviceBeamState(NamedTuple):
    score: jnp.ndarray  # [B]
    hash_hi: jnp.ndarray  # [B] prefix hash (without trailing blank)
    hash_lo: jnp.ndarray
    ends_blank: jnp.ndarray  # [B] bool
    last_token: jnp.ndarray  # [B] int32 (-1 none)
    tokens: jnp.ndarray  # [B, Lmax]
    length: jnp.ndarray  # [B]
    lm_lps: jnp.ndarray  # [B, V]
    lm_state: object


class _ScanState(NamedTuple):
    """Per-frame scan carry: DeviceBeamState WITHOUT the [B, Lmax] token
    buffer.  Carrying materialized tokens costs an O(B·Lmax) gather + rewrite
    EVERY frame (≈4 MB/frame at stitched Earnings-22 scale — ~100 GB of HBM
    traffic per recording, the decode bottleneck); instead each step emits
    [B] backpointers and tokens are reconstructed once per call by
    :func:`_reconstruct_tokens`."""

    score: jnp.ndarray
    hash_hi: jnp.ndarray
    hash_lo: jnp.ndarray
    ends_blank: jnp.ndarray
    last_token: jnp.ndarray
    length: jnp.ndarray
    lm_lps: jnp.ndarray
    lm_state: object
    # lazy LM-state carry: ``lm_state`` rows live in a stale *physical*
    # order; ``perm[b]`` is the physical row holding beam b's state.  Beam
    # reorders compose into perm (an O(B) int gather); the cache itself is
    # physically gathered + advanced ONLY on frames where a selected beam
    # emitted a new token.  On a transformer LM the per-frame KV gather was
    # ~88% of decode time (PERF.md round-3 probe) and most frames don't emit.
    perm: jnp.ndarray  # [B] int32


def _reconstruct_tokens(init_tokens, init_length, final_length,
                        parents, toks, news):
    """Backtrace: walk parent pointers from the final beams to the segment
    start, writing emitted tokens right-to-left, then splice each beam's
    originating prefix from ``init_tokens``.  One [B, Lmax] buffer total
    (in-place scatter of ≤B elements per step) instead of per frame.

    parents/toks/news: [T, B]; returns (tokens [B, Lmax], origin [B])."""
    B = init_length.shape[0]
    Lmax = init_tokens.shape[1]
    rows = jnp.arange(B)

    def back(carry, xs):
        cur, pos, buf = carry
        par, tk, nw = xs
        emitted = nw[cur]
        new_pos = pos - emitted.astype(jnp.int32)
        # out-of-range column drops the write (non-emitting rows, overflow)
        wpos = jnp.where(emitted & (new_pos >= 0), new_pos, Lmax)
        buf = buf.at[rows, wpos].set(tk[cur], mode="drop")
        return (par[cur], new_pos, buf), None

    carry0 = (rows, final_length.astype(jnp.int32),
              jnp.zeros((B, Lmax), jnp.int32))
    (origin, pos0, buf), _ = jax.lax.scan(
        back, carry0, (parents, toks, news), reverse=True
    )
    # positions < the origin's initial length come from the initial prefix
    prefix = init_tokens[origin]
    tokens = jnp.where(jnp.arange(Lmax)[None, :] < pos0[:, None], prefix, buf)
    return tokens, origin


def beam_search_device(
    log_probs: jnp.ndarray,  # [T, V+1]
    lm_adapter,
    beam_width: int = 25,
    alpha: float = 0.45,
    beta: float = 1.53,
    blank_id: Optional[int] = None,
    blank_penalty: float = 0.0,
    repetition_penalty: float = 0.0,
    top_am_threshold: float = -6.0,
    prune_less_than_val: Optional[float] = 3.17,
    top_k_tokens: int = 32,
    max_tokens: Optional[int] = None,
    valid_frames: Optional[jnp.ndarray] = None,
    exclude_token_zero: bool = True,
    init_state: Optional["DeviceBeamState"] = None,
    return_state: bool = False,
):
    """Tensorized beam search; returns (tokens [B, Lmax], lengths [B],
    scores [B]) sorted by score descending.  Jit-compiled end to end.

    ``valid_frames`` (scalar) truncates the scan logically (frames beyond it
    are skipped) so one compilation serves many stitched lengths.

    ``init_state``/``return_state`` support *segmented* decoding of very long
    stitched streams (:func:`beam_search_segmented`): the search resumes from
    a prior segment's final :class:`DeviceBeamState` (whose tokens buffer
    then defines ``Lmax``), and optionally returns the raw final state
    instead of sorted results.
    """
    T, Vp1 = log_probs.shape
    V = Vp1 - 1
    blank = V if blank_id is None else blank_id
    B = beam_width
    # the reference never proposes token id 0 (SPM special id); optional here
    K = min(top_k_tokens, V - 1 if exclude_token_zero else V)
    if init_state is not None:
        Lmax = init_state.tokens.shape[1]
    else:
        Lmax = max_tokens or T  # at most one emission per frame
    NEG = -1e30
    n_valid = jnp.asarray(T if valid_frames is None else valid_frames, jnp.int32)

    # per-frame top-K non-blank candidates (blank, and optionally token 0, excluded)
    masked = log_probs
    if exclude_token_zero:
        masked = masked.at[:, 0].set(NEG)
    if blank < Vp1:
        masked = masked.at[:, blank].set(NEG)
    top_vals, top_idx = jax.lax.top_k(masked, K)  # [T, K]

    if init_state is not None:
        state0 = init_state
    else:
        lm_state0, lm_lps0 = lm_adapter.init_state(B)
        state0 = DeviceBeamState(
            score=jnp.full((B,), NEG).at[0].set(0.0),
            hash_hi=jnp.full((B,), _INC_HI, jnp.uint32),
            hash_lo=jnp.full((B,), _INC_LO, jnp.uint32),
            ends_blank=jnp.zeros((B,), bool),
            last_token=jnp.full((B,), -1, jnp.int32),
            tokens=jnp.zeros((B, Lmax), jnp.int32),
            length=jnp.zeros((B,), jnp.int32),
            lm_lps=lm_lps0,
            lm_state=lm_state0,
        )

    def step(state, xs):
        t, am_row, vals, idxs = xs
        live = t < n_valid

        def do(state):
            am_max = am_row.max()
            thresh = am_max + top_am_threshold
            tok_ok = vals > thresh  # [K]

            # candidate classes: j in [0, K): token idxs[j]; j == K: blank
            v = idxs  # [K]
            is_repeat = (v[None, :] == state.last_token[:, None]) & (~state.ends_blank[:, None])
            lm_sc = alpha * jnp.take_along_axis(
                state.lm_lps, jnp.broadcast_to(v[None, :], (B, K)), axis=1
            ) + beta
            tok_score = state.score[:, None] + vals[None, :] + jnp.where(
                is_repeat, repetition_penalty, lm_sc
            )
            tok_score = jnp.where(tok_ok[None, :], tok_score, NEG)
            blank_ok = am_row[blank] > thresh
            blank_score = state.score + am_row[blank] + blank_penalty
            blank_score = jnp.where(blank_ok, blank_score, NEG)

            # candidate keys
            new_hi, new_lo = _roll_hash(
                jnp.broadcast_to(state.hash_hi[:, None], (B, K)),
                jnp.broadcast_to(state.hash_lo[:, None], (B, K)),
                jnp.broadcast_to(v[None, :], (B, K)).astype(jnp.int32),
            )
            cand_hi = jnp.where(is_repeat, state.hash_hi[:, None], new_hi)
            cand_lo = jnp.where(is_repeat, state.hash_lo[:, None], new_lo)
            cand_blankflag = jnp.zeros((B, K), bool)

            # append blank column
            score_all = jnp.concatenate([tok_score, blank_score[:, None]], axis=1)  # [B, K+1]
            hi_all = jnp.concatenate([cand_hi, state.hash_hi[:, None]], axis=1)
            lo_all = jnp.concatenate([cand_lo, state.hash_lo[:, None]], axis=1)
            bf_all = jnp.concatenate(
                [cand_blankflag, jnp.ones((B, 1), bool)], axis=1
            )
            parent = jnp.broadcast_to(jnp.arange(B)[:, None], (B, K + 1))
            tok_all = jnp.concatenate(
                [jnp.broadcast_to(v[None, :], (B, K)), jnp.full((B, 1), -1, jnp.int32)], axis=1
            )
            is_new_all = jnp.concatenate(
                [~is_repeat, jnp.zeros((B, 1), bool)], axis=1
            )

            flat = lambda x: x.reshape(-1)
            score_f, hi_f, lo_f = flat(score_all), flat(hi_all), flat(lo_all)
            bf_f, par_f, tok_f, new_f = flat(bf_all), flat(parent), flat(tok_all), flat(is_new_all)
            M = score_f.shape[0]

            # merge equal (hi, lo, blankflag) candidates via a pairwise
            # equality mask + row logsumexp: M² (~435k at B20/K32) fully
            # lane-parallel bool/float ops — far cheaper on the VPU than the
            # 4 sequential lexsorts this replaces.  The representative is the
            # LOWEST flat index of each group, which is exactly the host
            # search's first-insertion semantics (beam-major, token-major).
            alive_f = score_f > NEG / 2
            eqm = (
                (hi_f[:, None] == hi_f[None, :])
                & (lo_f[:, None] == lo_f[None, :])
                & (bf_f[:, None] == bf_f[None, :])
                & alive_f[:, None] & alive_f[None, :]
            )
            rep = jnp.argmax(eqm, axis=1)  # lowest equal index (self if alive)
            is_rep = (rep == jnp.arange(M)) & alive_f
            sc = jnp.where(eqm, score_f[None, :], NEG)
            row_max = sc.max(axis=1)
            merged = row_max + jnp.log(
                jnp.maximum(jnp.exp(sc - row_max[:, None]).sum(axis=1), 1e-37)
            )
            rep_scores = jnp.where(is_rep, merged, NEG)
            top_scores, sel = jax.lax.top_k(rep_scores, B)  # flat indices

            best = top_scores[0]
            if prune_less_than_val is not None:
                top_scores = jnp.where(
                    top_scores >= best - prune_less_than_val, top_scores, NEG
                )

            sel_parent = par_f[sel]
            sel_tok = tok_f[sel]
            sel_new = new_f[sel] & (top_scores > NEG / 2)
            sel_bf = bf_f[sel]

            # lengths advance with emissions; token buffers are NOT carried —
            # the step emits [B] backpointers instead (see _ScanState)
            length = state.length[sel_parent]
            length = jnp.where(sel_new, jnp.minimum(length + 1, Lmax), length)

            hash_hi = jnp.where(
                sel_new, _roll_hash(state.hash_hi[sel_parent], state.hash_lo[sel_parent], sel_tok)[0],
                state.hash_hi[sel_parent],
            )
            hash_lo = jnp.where(
                sel_new, _roll_hash(state.hash_hi[sel_parent], state.hash_lo[sel_parent], sel_tok)[1],
                state.hash_lo[sel_parent],
            )
            last_token = jnp.where(sel_new, sel_tok, state.last_token[sel_parent])
            ends_blank = sel_bf

            # LM advance for new-token beams.  On frames where NO beam
            # emitted (blank-dominant frames — most of a CTC stream even
            # after collapse) BOTH the LM forward and the physical cache
            # gather are skipped: the beam reorder composes into the lazy
            # permutation instead.  adapter.advance is identity on masked
            # rows, so this is exact.
            new_perm = state.perm[sel_parent]
            lm_lps_parent = state.lm_lps[sel_parent]

            def _adv(_):
                ls = lm_adapter.gather(state.lm_state, new_perm)
                ls2, lps_new = lm_adapter.advance(
                    ls, jnp.maximum(sel_tok, 0), sel_new
                )
                return (
                    ls2,
                    jnp.where(sel_new[:, None], lps_new, lm_lps_parent),
                    rows.astype(jnp.int32),  # cache is in beam order again
                )

            def _noadv(_):
                return state.lm_state, lm_lps_parent, new_perm

            lm_state, lm_lps, perm = jax.lax.cond(
                sel_new.any(), _adv, _noadv, None
            )

            new_state = _ScanState(
                score=top_scores,
                hash_hi=hash_hi,
                hash_lo=hash_lo,
                ends_blank=ends_blank,
                last_token=last_token,
                length=length,
                lm_lps=lm_lps,
                lm_state=lm_state,
                perm=perm,
            )
            return new_state, (sel_parent, sel_tok, sel_new)

        rows = jnp.arange(B)
        idle_ys = (rows, jnp.full((B,), -1, jnp.int32), jnp.zeros((B,), bool))

        def idle(s):
            return s, idle_ys

        def do_blank(state):
            """Fast path for frames where ONLY blank cleared the top_am
            threshold — the common case on CTC streams even after blank-run
            collapse.  Every beam extends with blank (key (hash, True));
            beams sharing a prefix hash merge.  No candidate fan-out, no
            sort/top-k over M, no LM machinery — exact w.r.t. the full
            path's result on such frames (up to beam ordering, which the
            final argsort normalizes)."""
            alive = state.score > NEG / 2
            score = state.score + am_row[blank] + blank_penalty
            eq = (
                (state.hash_hi[:, None] == state.hash_hi[None, :])
                & (state.hash_lo[:, None] == state.hash_lo[None, :])
                & alive[:, None] & alive[None, :]
            )
            rep = jnp.argmax(eq, axis=1)
            is_rep = (rep == rows) & alive
            sc = jnp.where(eq, score[None, :], NEG)
            row_max = sc.max(axis=1)
            merged = row_max + jnp.log(
                jnp.maximum(jnp.exp(sc - row_max[:, None]).sum(axis=1), 1e-37)
            )
            new_score = jnp.where(is_rep, merged, NEG)
            if prune_less_than_val is not None:
                best = new_score.max()
                new_score = jnp.where(
                    new_score >= best - prune_less_than_val, new_score, NEG
                )
            return state._replace(
                score=new_score, ends_blank=jnp.ones((B,), bool)
            ), idle_ys

        am_max_s = am_row.max()
        tok_any = (vals > am_max_s + top_am_threshold).any()
        blank_ok_s = am_row[blank] > am_max_s + top_am_threshold
        branch = jnp.where(
            live & tok_any, 0, jnp.where(live & blank_ok_s, 1, 2)
        )
        new_state, ys = jax.lax.switch(branch, [do, do_blank, idle], state)
        # skip-frame safeguard: if every candidate was below threshold the
        # whole beam set would die — keep the previous state instead
        dead = new_state.score[0] < NEG / 2
        new_state = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(dead, (1,) * new.ndim), old, new
            ) if hasattr(new, "ndim") else new,
            new_state, state,
        )
        ys = jax.tree.map(
            lambda y, i: jnp.where(jnp.reshape(dead, (1,) * y.ndim), i, y),
            ys, idle_ys,
        )
        return new_state, ys

    scan0 = _ScanState(
        score=state0.score, hash_hi=state0.hash_hi, hash_lo=state0.hash_lo,
        ends_blank=state0.ends_blank, last_token=state0.last_token,
        length=state0.length, lm_lps=state0.lm_lps, lm_state=state0.lm_state,
        perm=jnp.arange(B, dtype=jnp.int32),
    )
    xs = (jnp.arange(T), log_probs, top_vals, top_idx)
    fin, (parents, toks, news) = jax.lax.scan(step, scan0, xs)
    tokens, _ = _reconstruct_tokens(
        state0.tokens, state0.length, fin.length, parents, toks, news
    )
    final = DeviceBeamState(
        score=fin.score, hash_hi=fin.hash_hi, hash_lo=fin.hash_lo,
        ends_blank=fin.ends_blank, last_token=fin.last_token,
        tokens=tokens, length=fin.length, lm_lps=fin.lm_lps,
        # materialize the lazy permutation once per call so callers
        # (segment resume, finalization) always see beam-ordered LM state
        lm_state=lm_adapter.gather(fin.lm_state, fin.perm),
    )
    if return_state:
        # segmented decoding: finalization happens once at the true end of
        # the stream (beam_search_segmented), not per segment
        return final
    final = _finalize_state(final, lm_adapter, alpha)
    order = jnp.argsort(-final.score)
    return final.tokens[order], final.length[order], final.score[order]


def _finalize_state(state: "DeviceBeamState", lm_adapter, alpha: float):
    """End-of-stream finalization: word-boundary adapters score the pending
    partial word of each live beam (pyctcdecode's last-word semantics)."""
    if not hasattr(lm_adapter, "final_scores"):
        return state
    NEG = -1e30
    bonus = alpha * lm_adapter.final_scores(state.lm_state)
    return state._replace(
        score=jnp.where(state.score > NEG / 2, state.score + bonus, state.score)
    )


def beam_search_segmented(
    log_probs: jnp.ndarray,  # [T, V+1]
    lm_adapter,
    segment_frames: int = 4096,
    max_tokens: Optional[int] = None,
    **kwargs,
):
    """Segmented wrapper over :func:`beam_search_device` for stitched-scale
    streams (a full recording is ~25-55k frames after blank collapse).

    One device program per ``segment_frames``-frame slice with the beam
    state carried across segments — mathematically identical to a single
    scan over all T frames, but (a) each dispatch stays seconds-bounded
    (very long single XLA programs have been observed to kill the TPU
    worker through the remote tunnel), and (b) every segment reuses ONE
    compilation: the tail is zero-padded and logically truncated with
    ``valid_frames``.  Returns (tokens, lengths, scores) like the
    unsegmented call.
    """
    T = log_probs.shape[0]
    if T <= segment_frames:
        return beam_search_device(
            log_probs, lm_adapter, max_tokens=max_tokens, **kwargs
        )
    Lmax = max_tokens or T
    state = None
    for s0 in range(0, T, segment_frames):
        seg = log_probs[s0 : s0 + segment_frames]
        n = seg.shape[0]
        if n < segment_frames:
            seg = jnp.pad(seg, ((0, segment_frames - n), (0, 0)))
        state = beam_search_device(
            seg, lm_adapter,
            valid_frames=jnp.asarray(n, jnp.int32),
            max_tokens=Lmax,
            init_state=state,
            return_state=True,
            **kwargs,
        )
    state = _finalize_state(state, lm_adapter, kwargs.get("alpha", 0.45))
    order = jnp.argsort(-state.score)
    return state.tokens[order], state.length[order], state.score[order]


def beam_search_streams(
    log_probs: jnp.ndarray,  # [S, T, V+1] (zero-pad ragged streams)
    lm_adapter,
    valid_frames: Optional[jnp.ndarray] = None,  # [S] true lengths
    segment_frames: int = 4096,
    max_tokens: Optional[int] = None,
    **kwargs,
):
    """Decode S independent streams in ONE device program per segment —
    ``jax.vmap`` of :func:`beam_search_device` over a leading streams axis,
    with the segment carry of :func:`beam_search_segmented`.

    Why: one recording's LM-fused decode runs a beam_width-sized LM forward
    per emitting frame — tiny matmuls that leave the MXU idle.  Batching S
    streams widens every op (LM batch S·B, S-lane merge/top-k) at the price
    of losing the per-frame branch skipping (under vmap, ``lax.switch``
    executes all branches and selects, so the blank fast path and the lazy
    LM carry no longer skip work).  Per-stream wall-clock therefore rises —
    and the round-4 on-chip bench shows that at realistic post-collapse
    emission density (~50%) the AGGREGATE loses too (S=4: RTFx 108.5 vs
    122.8 single-stream; PERF.md round-4 item 3): the skips are worth more
    than the MXU widening there.  Use for LOW-density streams (TLM
    rescoring over logit dumps); single recordings and stitched-scale
    decodes should keep :func:`beam_search_segmented`.

    Per-stream results are EXACT w.r.t. :func:`beam_search_segmented` on the
    same stream (``tests/test_beam_search.py::TestStreams``).  Returns
    (tokens [S, B, Lmax], lengths [S, B], scores [S, B]), each stream's beams
    sorted by score descending.
    """
    S, T, _ = log_probs.shape
    vf = (jnp.full((S,), T, jnp.int32) if valid_frames is None
          else jnp.asarray(valid_frames, jnp.int32))
    Lmax = max_tokens or T
    seg_len = min(segment_frames, T)

    def first(lp, n):
        return beam_search_device(
            lp, lm_adapter, valid_frames=n, max_tokens=Lmax,
            init_state=None, return_state=True, **kwargs)

    def rest(lp, n, st):
        return beam_search_device(
            lp, lm_adapter, valid_frames=n, max_tokens=Lmax,
            init_state=st, return_state=True, **kwargs)

    state = None
    for s0 in range(0, T, seg_len):
        seg = log_probs[:, s0 : s0 + seg_len]
        n = seg.shape[1]
        if n < seg_len:
            seg = jnp.pad(seg, ((0, 0), (0, seg_len - n), (0, 0)))
        seg_vf = jnp.clip(vf - s0, 0, n)
        if state is None:
            state = jax.vmap(first)(seg, seg_vf)
        else:
            state = jax.vmap(rest)(seg, seg_vf, state)

    def fin(st):
        st = _finalize_state(st, lm_adapter, kwargs.get("alpha", 0.45))
        order = jnp.argsort(-st.score)
        return st.tokens[order], st.length[order], st.score[order]

    return jax.vmap(fin)(state)
