"""CTC loss and greedy decoding as pure, jittable JAX ops.

The reference relies on ``torch.nn.CTCLoss`` (CUDA/cuDNN; ``lcasr/lib.py:492``)
and a host-side ``GreedyCTCDecoder`` (external lcasr package, used at
``lcasr/lib.py:498,559``) — the decode forces a device→host round-trip inside
the adaptation hot loop.  Here both are TPU-native:

- :func:`ctc_loss` — log-semiring forward (α) recursion as a ``lax.scan`` over
  time, batched over examples, arbitrary ``blank_id``, padded inputs/labels.
- :func:`greedy_labels` — argmax → collapse-repeats → drop-blank → left-compact
  into a fixed-width padded label tensor, entirely on device, so pseudo-label
  self-training needs no host transfer.

Blank convention follows the reference: ``blank_id = vocab_size`` (last class)
by default, configurable.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _ctc_alpha_scan(
    log_probs: jnp.ndarray,  # [T, S] per-frame log prob gathered on extended labels
    same_mask: jnp.ndarray,  # [S] allow transition from s-2?
    input_length: jnp.ndarray,  # scalar
) -> jnp.ndarray:
    """Run the α recursion for one example. Returns final α row [S]."""
    T, S = log_probs.shape
    alpha0 = jnp.full((S,), NEG_INF).at[0].set(log_probs[0, 0])
    alpha0 = alpha0.at[1].set(jnp.where(S > 1, log_probs[0, 1], NEG_INF))

    def step(alpha, inputs):
        t, lp = inputs
        prev1 = jnp.concatenate([jnp.array([NEG_INF]), alpha[:-1]])
        prev2 = jnp.concatenate([jnp.array([NEG_INF, NEG_INF]), alpha[:-2]])
        prev2 = jnp.where(same_mask, NEG_INF, prev2)
        new = jnp.logaddexp(jnp.logaddexp(alpha, prev1), prev2) + lp
        # freeze past the true input length (padding frames)
        new = jnp.where(t < input_length, new, alpha)
        return new, None

    ts = jnp.arange(1, T)
    # unroll: the per-step work is a tiny vector op; unrolling amortizes the
    # sequential-loop overhead on TPU (16x fewer loop iterations)
    alpha, _ = jax.lax.scan(step, alpha0, (ts, log_probs[1:]), unroll=16)
    return alpha


@partial(jax.jit, static_argnames=("blank_id",))
def ctc_loss(
    log_probs: jnp.ndarray,  # [B, T, V] log-softmax outputs
    input_lengths: jnp.ndarray,  # [B]
    labels: jnp.ndarray,  # [B, U] padded label ids
    label_lengths: jnp.ndarray,  # [B]
    blank_id: Optional[int] = None,
    sample_weights: Optional[jnp.ndarray] = None,  # [B] per-sample weights
) -> jnp.ndarray:
    """Summed negative log-likelihood over the batch (matches
    ``torch.nn.CTCLoss(reduction='sum')`` semantics used at
    ``lcasr/lib.py:492,575``).

    Zero-length labels contribute -sum log P(blank) like torch.  Labels are
    assumed valid ids in [0, V); padding positions are ignored via
    ``label_lengths``.
    """
    B, T, V = log_probs.shape
    U = labels.shape[1]
    if blank_id is None:
        blank_id = V - 1
    S = 2 * U + 1

    # extended label sequence: blank, l1, blank, l2, ..., blank
    ext = jnp.full((B, S), blank_id, dtype=labels.dtype)
    ext = ext.at[:, 1::2].set(labels)
    # positions beyond 2*label_len are padding; clamp gather, mask later
    pos = jnp.arange(S)[None, :]
    valid = pos < (2 * label_lengths[:, None] + 1)

    # same-label mask: ext[s] == ext[s-2] → s-2 transition forbidden
    ext_shift2 = jnp.concatenate(
        [jnp.full((B, 2), -1, dtype=ext.dtype), ext[:, :-2]], axis=1
    )
    same_mask = ext == ext_shift2
    # blanks always forbid the skip transition
    same_mask = same_mask | (ext == blank_id)

    # gather per-frame log probs on extended labels: [B, T, S]
    lp_ext = jnp.take_along_axis(
        log_probs, ext[:, None, :].astype(jnp.int32), axis=2
    )
    lp_ext = jnp.where(valid[:, None, :], lp_ext, NEG_INF)

    alpha_final = jax.vmap(_ctc_alpha_scan)(lp_ext, same_mask, input_lengths)

    end1 = jnp.clip(2 * label_lengths, 0, S - 1)  # final blank
    end2 = jnp.clip(2 * label_lengths - 1, 0, S - 1)  # last label
    a1 = jnp.take_along_axis(alpha_final, end1[:, None], axis=1)[:, 0]
    a2 = jnp.take_along_axis(alpha_final, end2[:, None], axis=1)[:, 0]
    a2 = jnp.where(label_lengths > 0, a2, NEG_INF)
    ll = jnp.logaddexp(a1, a2)
    if sample_weights is not None:
        ll = ll * sample_weights
    return -jnp.sum(ll)


def greedy_labels(
    log_probs: jnp.ndarray,  # [T, V]
    input_length: jnp.ndarray,  # scalar
    blank_id: int,
    max_tokens: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """On-device greedy CTC decode of one stream into a fixed-width padded
    label sequence: argmax → collapse repeats → strip blanks.

    Returns ``(labels [max_tokens], length)``.  Replaces the host round-trip
    of the reference's GreedyCTCDecoder call inside the TTA loop
    (``lcasr/lib.py:559``).
    """
    T = log_probs.shape[0]
    toks = jnp.argmax(log_probs, axis=-1)  # [T]
    prev = jnp.concatenate([jnp.array([-1], dtype=toks.dtype), toks[:-1]])
    frame_mask = jnp.arange(T) < input_length
    keep = (toks != prev) & (toks != blank_id) & frame_mask
    idx = jnp.cumsum(keep) - 1  # target position for each kept token
    length = jnp.minimum(jnp.sum(keep), max_tokens)
    scatter_to = jnp.where(keep & (idx < max_tokens), idx, max_tokens)
    labels = jnp.zeros((max_tokens + 1,), dtype=jnp.int32).at[scatter_to].set(
        toks.astype(jnp.int32), mode="drop"
    )[:max_tokens]
    return labels, length.astype(jnp.int32)


def greedy_decode(
    log_probs,
    tokenizer,
    blank_id: Optional[int] = None,
    input_length: Optional[int] = None,
) -> str:
    """Host-facing greedy decode to text (capability of the reference's
    ``GreedyCTCDecoder(tokenizer, blank_id)(log_probs)``)."""
    import numpy as np

    lp = np.asarray(log_probs)
    if lp.ndim == 3:
        lp = lp[0]
    T, V = lp.shape
    if blank_id is None:
        blank_id = V - 1
    if input_length is None:
        input_length = T
    toks = lp.argmax(axis=-1)[:input_length]
    out = []
    prev = -1
    for t in toks:
        if t != prev and t != blank_id:
            out.append(int(t))
        prev = t
    return tokenizer.decode(out)
