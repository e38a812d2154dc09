"""Word / character error rate with insertion/deletion/substitution detail.

Capability parity with the reference's ``lcasr.eval.wer.word_error_rate_detail``
(used at ``lcasr/run.py:119``), which returns
``(wer, words, ins_rate, del_rate, sub_rate)`` over a corpus of hypothesis /
reference string pairs: total edit counts are accumulated corpus-wide and
divided by the total number of reference words.

Error counts use the standard Levenshtein alignment with unit costs; when
multiple alignments tie, substitution is preferred over ins+del (the usual
NIST/sclite convention).

The alignment DP runs in C (``native/levenshtein.cc``, ctypes-bound, same
tie-break rules) when the toolchain is available — it sits on hot host
paths (enc-dec RL rewards score 1−WER per rollout, teacher filters 1−CER
per chunk; reference ``lcasr/lib.py:1330-1359``,
``enc_dec_teacher_filters.py``).  Set ``DAE_NO_NATIVE_LEV=1`` to force the
pure-Python DP.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

_lev_lib = None
_lev_checked = False


def _native_lev():
    global _lev_lib, _lev_checked
    if os.environ.get("DAE_NO_NATIVE_LEV"):
        return None
    if not _lev_checked:
        _lev_checked = True
        from dynamic_asr_eval_tpu import nativelib

        lib = nativelib.load("levenshtein.cc")
        if lib is not None:
            lib.lev_edit_ops.restype = ctypes.c_int64
            lib.lev_edit_ops.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.lev_edit_ops_batch.restype = None
            lib.lev_edit_ops_batch.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ]
        _lev_lib = lib
    return _lev_lib


def _intern(seqs: List[Sequence], table: dict) -> Tuple[np.ndarray, np.ndarray]:
    """Map token sequences to packed int32 ids + per-sequence lengths."""
    lens = np.array([len(s) for s in seqs], np.int64)
    flat = np.empty(int(lens.sum()), np.int32)
    k = 0
    for s in seqs:
        for tok in s:
            i = table.get(tok)
            if i is None:
                i = table[tok] = len(table)
            flat[k] = i
            k += 1
    return flat, lens


def _edit_ops(hyp: Sequence, ref: Sequence) -> Tuple[int, int, int]:
    """Return (insertions, deletions, substitutions) of the minimal-cost
    alignment transforming ``ref`` into ``hyp``."""
    H, R = len(hyp), len(ref)
    if R == 0:
        return H, 0, 0
    if H == 0:
        return 0, R, 0
    # dp[i, j] = (cost, ins, del, sub) for hyp[:i] vs ref[:j]
    # Vectorized over j with numpy rows; tie-break: sub < del < ins so counts
    # are deterministic.
    prev_cost = np.arange(R + 1, dtype=np.int32)
    prev_ops = np.zeros((R + 1, 3), dtype=np.int32)  # ins, del, sub
    prev_ops[:, 1] = np.arange(R + 1)
    for i in range(1, H + 1):
        cur_cost = np.empty(R + 1, dtype=np.int32)
        cur_ops = np.empty((R + 1, 3), dtype=np.int32)
        cur_cost[0] = i
        cur_ops[0] = (i, 0, 0)
        h = hyp[i - 1]
        for j in range(1, R + 1):
            match = h == ref[j - 1]
            sub_cost = prev_cost[j - 1] + (0 if match else 1)
            del_cost = cur_cost[j - 1] + 1
            ins_cost = prev_cost[j] + 1
            if sub_cost <= del_cost and sub_cost <= ins_cost:
                cur_cost[j] = sub_cost
                cur_ops[j] = prev_ops[j - 1]
                if not match:
                    cur_ops[j, 2] += 1
            elif del_cost <= ins_cost:
                cur_cost[j] = del_cost
                cur_ops[j] = cur_ops[j - 1]
                cur_ops[j, 1] += 1
            else:
                cur_cost[j] = ins_cost
                cur_ops[j] = prev_ops[j]
                cur_ops[j, 0] += 1
        prev_cost, prev_ops = cur_cost, cur_ops
    ins, dels, subs = prev_ops[R]
    return int(ins), int(dels), int(subs)


def word_error_rate_detail(
    hypotheses: List[str],
    references: List[str],
    use_cer: bool = False,
) -> Tuple[float, int, float, float, float]:
    """Corpus-level WER (or CER) with error-type rates.

    Returns ``(wer, words, ins_rate, del_rate, sub_rate)`` where ``words`` is
    the total number of reference tokens and each rate is count/words.
    Mirrors the reference surface (``lcasr/run.py:119``).
    """
    if len(hypotheses) != len(references):
        raise ValueError(
            f"hypotheses ({len(hypotheses)}) and references ({len(references)}) "
            "must have the same length"
        )
    hyp_seqs = [list(h) if use_cer else h.split() for h in hypotheses]
    ref_seqs = [list(r) if use_cer else r.split() for r in references]

    lib = _native_lev()
    if lib is not None:
        table: dict = {}
        hflat, hlens = _intern(hyp_seqs, table)
        rflat, rlens = _intern(ref_seqs, table)
        out = np.zeros(4, np.int64)
        lib.lev_edit_ops_batch(
            hflat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            hlens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            rflat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rlens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(hyp_seqs),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        total_ins, total_del, total_sub, total_words = (int(v) for v in out)
    else:
        total_words = 0
        total_ins = total_del = total_sub = 0
        for h, r in zip(hyp_seqs, ref_seqs):
            total_words += len(r)
            i, d, s = _edit_ops(h, r)
            total_ins += i
            total_del += d
            total_sub += s
    if total_words == 0:
        wer = float("inf") if (total_ins + total_del + total_sub) else 0.0
        return wer, 0, float("nan"), float("nan"), float("nan")
    denom = float(total_words)
    wer = (total_ins + total_del + total_sub) / denom
    return wer, total_words, total_ins / denom, total_del / denom, total_sub / denom


def wer_counts(hypothesis: str, reference: str) -> np.ndarray:
    """Per-pair ``(ins, del, sub, ref_words)`` counts — the psum-able unit of
    corpus WER: summing these over records (host-side or via
    ``parallel.psum_wer_counts`` across a mesh) reproduces
    :func:`word_error_rate_detail` exactly."""
    h, r = hypothesis.split(), reference.split()
    i, d, s = _edit_ops(h, r)
    return np.array([i, d, s, len(r)], np.int64)


def cer(hypotheses: List[str], references: List[str]) -> float:
    """Corpus character error rate."""
    return word_error_rate_detail(hypotheses, references, use_cer=True)[0]
