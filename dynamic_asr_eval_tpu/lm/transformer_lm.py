"""Decoder-only transformer language model with a fixed-size KV cache.

Capability parity with the external ``lming.models.transformer.transformer_lm``
consumed by the reference's LM-fused beam search (``lcasr/ctc_beam_search.py:
45-87``): calls take ``(x, length, cache)`` and return ``(logits, _, new
cache)`` where the cache is ``{'cache': [L, 2, B, H, N, D], 'cache_lengths':
[B]}`` and may be trimmed to a maximum length (``trim_cache``, ``:174-181``).

TPU-first: the cache is a FIXED-length ring buffer (static shapes for jit /
scan).  ``step`` consumes one token per beam and returns next-token log-probs
— the primitive the tensorized beam search scans with.  Rotary positions use
the absolute position index so ring-buffer rotation is position-consistent.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class TransformerLMConfig:
    vocab_size: int = 4096
    n_layers: int = 6
    d_model: int = 512
    n_heads: int = 8
    max_cache_length: int = 128
    rotary_base: float = 10_000.0
    expansion_factor: int = 4
    compute_dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


def _rot(x, cos, sin):
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def _rope(pos: jnp.ndarray, head_dim: int, base: float):
    """pos [...,] → cos/sin [..., head_dim/2]."""
    inv = 1.0 / (base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    ang = pos[..., None].astype(jnp.float32) * inv
    return jnp.cos(ang), jnp.sin(ang)


class LMBlock(nn.Module):
    config: TransformerLMConfig

    @nn.compact
    def __call__(self, x, k_cache, v_cache, cache_pos, pos, write_mask=None):
        """Single-token step.  x [B, d]; k/v_cache [B, H, N, D]; cache_pos [B]
        (number of valid entries, == absolute position); pos [B] absolute
        position of this token.  ``write_mask`` [B] bool (None = all): rows
        with False leave the cache untouched (their ring write is dropped) —
        the beam search advances only emitting beams, and masking at the
        scatter is ~200 MB/step cheaper than where-merging full caches after
        the fact.  Returns (y, new_k, new_v)."""
        cfg = self.config
        H, D, N = cfg.n_heads, cfg.head_dim, cfg.max_cache_length
        h = nn.LayerNorm(dtype=x.dtype, param_dtype=jnp.float32, name="ln1")(x)
        qkv = nn.Dense(3 * H * D, use_bias=False, dtype=cfg.compute_dtype,
                       param_dtype=jnp.float32, name="qkv")(h)
        B = x.shape[0]
        q, k, v = jnp.split(qkv.reshape(B, 3, H, D), 3, axis=1)
        q, k, v = q[:, 0], k[:, 0], v[:, 0]  # [B, H, D]

        cos, sin = _rope(pos, D, cfg.rotary_base)  # [B, D/2]
        q = _rot(q, cos[:, None, :], sin[:, None, :])
        k = _rot(k, cos[:, None, :], sin[:, None, :])

        # ring-buffer write at slot pos % N (dropped for masked-off rows)
        slot = (pos % N).astype(jnp.int32)
        if write_mask is not None:
            slot = jnp.where(write_mask, slot, N)
        bidx = jnp.arange(B)
        new_k = k_cache.at[bidx, :, slot].set(k.astype(k_cache.dtype), mode="drop")
        new_v = v_cache.at[bidx, :, slot].set(v.astype(v_cache.dtype), mode="drop")

        # attention over valid cache slots + self
        # slot i holds absolute position: p_i such that p_i % N == i and
        # p_i in [pos-min(pos,N-?) ...]; valid if pos - p_i < N and p_i <= pos
        slots = jnp.arange(N)[None, :]  # [1, N]
        # absolute position stored in slot s: largest p <= pos with p % N == s
        abs_pos = pos[:, None] - ((pos[:, None] - slots) % N)
        valid = (abs_pos >= 0) & (abs_pos >= pos[:, None] - (N - 1)) & (
            abs_pos >= pos[:, None] - cache_pos[:, None]
        )
        logits = jnp.einsum("bhd,bhnd->bhn", q, new_k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(D)
        logits = jnp.where(valid[:, None, :], logits, -1e30)
        attn = jax.nn.softmax(logits, axis=-1).astype(cfg.compute_dtype)
        out = jnp.einsum("bhn,bhnd->bhd", attn, new_v).reshape(B, H * D)
        out = nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.compute_dtype,
                       param_dtype=jnp.float32, name="out")(out)
        x = x + out
        h2 = nn.LayerNorm(dtype=x.dtype, param_dtype=jnp.float32, name="ln2")(x)
        h2 = nn.Dense(cfg.d_model * cfg.expansion_factor, dtype=cfg.compute_dtype,
                      param_dtype=jnp.float32, name="ff_in")(h2)
        h2 = jax.nn.gelu(h2)
        h2 = nn.Dense(cfg.d_model, dtype=cfg.compute_dtype,
                      param_dtype=jnp.float32, name="ff_out")(h2)
        return x + h2, new_k, new_v


class TransformerLM(nn.Module):
    """Step-wise LM.  ``__call__(tokens [B], cache, positions [B]) →
    (log_probs [B, V], new_cache)`` where cache is a dict of stacked per-layer
    ring buffers ``{'k': [L, B, H, N, D], 'v': ..., 'lengths': [B]}``."""

    config: TransformerLMConfig

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, cache: Dict[str, jnp.ndarray],
                 write_mask=None):
        cfg = self.config
        pos = cache["lengths"]  # absolute position of this token
        x = nn.Embed(cfg.vocab_size, cfg.d_model, param_dtype=jnp.float32,
                     dtype=cfg.compute_dtype, name="embed")(tokens)
        new_ks, new_vs = [], []
        for i in range(cfg.n_layers):
            x, nk, nv = LMBlock(cfg, name=f"layer_{i}")(
                x, cache["k"][i], cache["v"][i], pos, pos, write_mask
            )
            new_ks.append(nk)
            new_vs.append(nv)
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name="ln_f")(x)
        logits = nn.Dense(cfg.vocab_size, dtype=cfg.compute_dtype,
                          param_dtype=jnp.float32, name="head")(x)
        new_lengths = pos + 1 if write_mask is None else pos + write_mask
        new_cache = {
            "k": jnp.stack(new_ks),
            "v": jnp.stack(new_vs),
            "lengths": new_lengths,
        }
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), new_cache


def empty_cache(config: TransformerLMConfig, batch: int) -> Dict[str, jnp.ndarray]:
    L, H, N, D = config.n_layers, config.n_heads, config.max_cache_length, config.head_dim
    return {
        "k": jnp.zeros((L, batch, H, N, D), config.compute_dtype),
        "v": jnp.zeros((L, batch, H, N, D), config.compute_dtype),
        "lengths": jnp.zeros((batch,), jnp.int32),
    }


def init_lm(config: TransformerLMConfig, rng) -> Tuple[TransformerLM, Dict]:
    model = TransformerLM(config)
    cache = empty_cache(config, 1)
    variables = jax.jit(model.init)({"params": rng}, jnp.zeros((1,), jnp.int32), cache)
    return model, variables


def lm_score_sequence(model, variables, tokens, config: TransformerLMConfig):
    """Teacher-forced log-prob of a token sequence (for rescoring tools).
    ``tokens`` [T] including BOS; returns per-step next-token log-prob [T-1]."""
    cache = empty_cache(config, 1)

    def step(cache, tok):
        lps, cache = model.apply(variables, tok[None], cache)
        return cache, lps[0]

    _, all_lps = jax.lax.scan(step, cache, tokens[:-1])
    idx = tokens[1:]
    return jnp.take_along_axis(all_lps, idx[:, None], axis=1)[:, 0]
