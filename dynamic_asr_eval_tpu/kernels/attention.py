"""Flash attention for the conformer (Pallas TPU).

The reference's optional ``flash_attn`` path is a CUDA extension disabled on
its hardware (``lcasr/lib.py:29-32``, "doesnt work with head size 128 on
A4500s!", ``lcasr160rb1.yaml:29``).  Here the TPU path uses JAX's maintained
Pallas TPU flash-attention kernels (fused online-softmax forward AND
backward — no [B, H, T, T] logit materialization in HBM), with padding
expressed as segment ids so padded frames never attend to valid ones.

Fallback policy: the XLA einsum implementation is used when the Pallas
kernel is unavailable (e.g. CPU tests) or rejects the shapes — but never
SILENTLY: the first fallback per process prints a warning naming the cause,
and ``DAE_STRICT_FLASH_ATTENTION=1`` turns any fallback into an error so a
kernel regression on TPU cannot hide behind the slower path.
"""

from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp

_warned = False


def _xla_attention(q, k, v, mask):
    D = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) * scale
    bias = jnp.where(mask[:, None, None, :], 0.0, -1e30)
    attn = jax.nn.softmax(logits + bias, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", attn, v)


def _note_fallback(exc: Exception):
    global _warned
    if os.environ.get("DAE_STRICT_FLASH_ATTENTION"):
        raise RuntimeError(
            "Pallas flash attention failed and DAE_STRICT_FLASH_ATTENTION is "
            "set — refusing the silent XLA fallback"
        ) from exc
    if not _warned:
        _warned = True
        msg = (
            f"Pallas flash attention unavailable ({type(exc).__name__}: {exc}); "
            f"falling back to XLA attention.  Set "
            f"DAE_STRICT_FLASH_ATTENTION=1 to make this an error."
        )
        print(f"WARNING: {msg}")
        warnings.warn(msg, stacklevel=3)


def flash_attention(q, k, v, mask):
    """q/k/v: [B, T, H, D]; mask: [B, T] valid-frame mask.  Returns
    [B, T, H, D]."""
    B, T, H, D = q.shape
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as _fa,
            SegmentIds,
        )

        qt = jnp.swapaxes(q, 1, 2)  # [B, H, T, D]
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        seg = mask.astype(jnp.int32)  # valid=1, pad=0: pads isolated
        out = _fa(
            qt, kt, vt,
            segment_ids=SegmentIds(q=seg, kv=seg),
            sm_scale=1.0 / (D ** 0.5),
        )
        return jnp.swapaxes(out, 1, 2).astype(q.dtype)
    except Exception as exc:
        _note_fallback(exc)
        return _xla_attention(q, k, v, mask)
