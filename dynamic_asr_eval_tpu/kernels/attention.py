"""Flash attention for the conformer (Pallas TPU).

The reference's optional ``flash_attn`` path is a CUDA extension disabled on
its hardware (``lcasr/lib.py:29-32``, "doesnt work with head size 128 on
A4500s!", ``lcasr160rb1.yaml:29``).  Here the TPU path uses JAX's maintained
Pallas TPU flash-attention kernels (fused online-softmax forward AND
backward — no [B, H, T, T] logit materialization in HBM), with padding
expressed as segment ids so padded frames never attend to valid ones.

Falls back to the XLA einsum implementation when the kernel is unavailable
(e.g. CPU tests) or shapes are unsupported.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
    except Exception:
        scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
        logits = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32) * scale
        bias = jnp.where(mask[:, None, None, :], 0.0, -1e30)
        attn = jax.nn.softmax(logits + bias, axis=-1).astype(q.dtype)
        return jnp.einsum("bhts,bshd->bthd", attn, v)
