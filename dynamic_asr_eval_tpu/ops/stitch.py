"""Overlap-averaged stitching of per-window probabilities.

Reference semantics (``lcasr/lib.py:615-629``): walk windows in order, each
placed ``ds_len - overlap_ds`` after the previous start, accumulate
``exp(log_probs)`` and a hit count per downsampled frame, then divide and take
``log``.  Trailing all-zero rows are dropped.

TPU-first: one scatter-add over a static index grid — no Python loop, no host
transfer; safely jittable with padded windows masked by per-window lengths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stitch_chunk_probs(
    probs: jnp.ndarray,  # [N, T_ds, V] probabilities (already exp'd), padded
    ds_lengths: jnp.ndarray,  # [N] true downsampled lengths (0 for pad windows)
    starts_ds: jnp.ndarray,  # [N] downsampled start offsets
    total_ds: int,  # static output length (>= max position); trailing zeros trimmed by caller
    eps: float = 1e-12,
):
    """Returns ``(stitched_log_probs [total_ds, V], frame_counts [total_ds])``.

    Positions with zero coverage have count 0 and log-prob ``log(eps)``; the
    caller trims with the returned counts (the reference drops zero-count
    rows, ``lcasr/lib.py:622-627``).
    """
    N, T_ds, V = probs.shape
    frame_idx = jnp.arange(T_ds)[None, :]  # [1, T_ds]
    mask = frame_idx < ds_lengths[:, None]  # [N, T_ds]
    positions = starts_ds[:, None] + frame_idx  # [N, T_ds]
    # out-of-range / masked → dropped by scatter mode="drop"
    positions = jnp.where(mask, positions, total_ds)

    flat_pos = positions.reshape(-1)
    flat_probs = (probs * mask[:, :, None]).reshape(-1, V)
    acc = jnp.zeros((total_ds + 1, V), dtype=probs.dtype).at[flat_pos].add(
        flat_probs, mode="drop"
    )[:total_ds]
    counts = jnp.zeros((total_ds + 1,), dtype=probs.dtype).at[flat_pos].add(
        mask.reshape(-1).astype(probs.dtype), mode="drop"
    )[:total_ds]
    avg = acc / jnp.maximum(counts[:, None], 1.0)
    log_avg = jnp.log(jnp.maximum(avg, eps))
    return log_avg, counts


def trim_stitched(log_probs, counts):
    """Host-side trim of zero-coverage tail rows (reference drops all
    zero-count rows; coverage is contiguous so this is the tail)."""
    import numpy as np

    counts = np.asarray(counts)
    keep = counts > 0
    return np.asarray(log_probs)[keep]
