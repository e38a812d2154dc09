"""Overlapping-window chunking of long spectrograms, jit-friendly.

Semantics match the reference chunker ``prepare_chunks``
(``lcasr/lib.py:128-145``):

- if the spectrogram fits in one window, a single full-length chunk is used
  (and overlap is treated as 0 by the engines);
- otherwise windows start every ``seq_len - overlap`` frames; iteration stops
  one window after the first window that came out shorter than its
  predecessor (the "kill trailing duplicate" rule), so exactly one shortened
  tail window is kept.

TPU-first difference: instead of a dict of ragged tensors, we return one
stacked, zero-padded ``[N, C, seq_len]`` array plus per-window lengths and
start offsets — static shapes for ``jit``/``scan``.  ``pad_num_chunks``
bucket-pads N so recompiles are bounded (powers-of-two buckets).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def chunk_starts_and_lengths(spec_n: int, seq_len: int, overlap: int) -> Tuple[List[int], List[int]]:
    """Host-side window plan with reference-equivalent stop rule."""
    if spec_n <= seq_len:
        return [0], [spec_n]
    stride = seq_len - overlap
    if stride <= 0:
        raise ValueError(f"overlap ({overlap}) must be < seq_len ({seq_len})")
    starts, lengths = [], []
    last_ulen = None
    kill_next = False
    for start in range(0, spec_n, stride):
        u_len = min(seq_len, spec_n - start)
        if kill_next:
            break
        if last_ulen is not None and u_len < last_ulen:
            kill_next = True
        last_ulen = u_len
        starts.append(start)
        lengths.append(u_len)
    return starts, lengths


def num_chunks(spec_n: int, seq_len: int, overlap: int) -> int:
    return len(chunk_starts_and_lengths(spec_n, seq_len, overlap)[0])


def pad_num_chunks(n: int, min_bucket: int = 4) -> int:
    """Round the window count up to a bucket (≥ min_bucket) to bound the
    number of distinct jit shapes across recordings.

    Buckets are 8 per power-of-two octave (granularity ``2**(⌊log2 n⌋-3)``),
    so the padded scan wastes ≤ 12.5% of its steps — vs up to ~2× with plain
    power-of-two buckets (e.g. a 196-window Earnings-22 recording padded to
    256 ran 60 dead ``lax.cond`` steps; now 208).  Shape count stays bounded:
    at most 8 distinct scan lengths per octave of recording length."""
    n = max(int(n), max(min_bucket, 1))
    step = 1 << max(0, n.bit_length() - 4)
    return -(-n // step) * step


def chunk_spectrogram(
    spec: np.ndarray,  # [C, T] or [1, C, T]
    seq_len: int,
    overlap: int,
    pad_to_bucket: bool = True,
    min_bucket: int = 4,
):
    """Slice a spectrogram into stacked, padded windows.

    Returns ``(windows [N, C, W], lengths [N], starts [N], n_real)`` where
    ``W = min(seq_len, T)`` if a single chunk suffices else ``seq_len``, and
    windows ``n_real..N-1`` are all-zero padding with length 0.
    """
    spec = np.asarray(spec)
    if spec.ndim == 3:
        spec = spec[0]
    C, T = spec.shape
    starts, lengths = chunk_starts_and_lengths(T, seq_len, overlap)
    n_real = len(starts)
    W = seq_len if T > seq_len else T
    N = pad_num_chunks(n_real, min_bucket) if pad_to_bucket else n_real
    windows = np.zeros((N, C, W), dtype=spec.dtype)
    for i, (s, L) in enumerate(zip(starts, lengths)):
        windows[i, :, :L] = spec[:, s : s + L]
    out_lengths = np.zeros((N,), dtype=np.int32)
    out_lengths[:n_real] = lengths
    out_starts = np.zeros((N,), dtype=np.int32)
    out_starts[:n_real] = starts
    # padded slots repeat the last start so downstream scatter is harmless
    if n_real < N:
        out_starts[n_real:] = starts[-1]
    return windows, out_lengths, out_starts, n_real
