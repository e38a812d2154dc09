"""Encoder-decoder (attention) ASR model with a joint CTC branch.

Capability parity with the reference's enc-dec surface (external lcasr model,
consumed at ``lcasr/lib.py:1112-1322``):

- ``__call__(audio_signal)`` → ``{'a_hidden', 'length'}`` (encoder only);
- ``__call__(audio_signal, text_bos, text_lengths)`` → adds
  ``final_posteriors_ctc`` (log-softmax CTC branch) and
  ``final_posteriors_lm`` (decoder logits over text positions);
- ``ctc_loss_weight`` mixes CTC and CE objectives
  (``calc_loss_enc_dec``, ``lcasr/lib.py:1258-1322``);
- autoregressive generation (greedy or multinomial sampling) with per-sample
  EOS retirement (``generate_enc_dec``, ``lcasr/lib.py:1172-1226``) — here a
  fixed-length ``lax.scan`` with a self-attention KV cache and precomputed
  cross-attention keys, entirely on device.

The encoder is the SCConformer; the decoder is a standard pre-norm
transformer with causal self-attention + cross-attention on ``a_hidden``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dynamic_asr_eval_tpu.models.conformer import (
    LN_EPS,
    ConformerConfig,
    SCConformer,
    lengths_to_mask,
)


@dataclasses.dataclass(frozen=True)
class EncDecConfig:
    encoder: ConformerConfig = dataclasses.field(default_factory=ConformerConfig)
    decoder_layers: int = 4
    decoder_d_model: int = 512
    decoder_heads: int = 8
    decoder_ff_mult: int = 4
    max_text_len: int = 256
    bos_id: int = 0
    eos_id: int = 0
    ctc_loss_weight: float = 0.3
    dropout_emb: float = 0.0
    dropout_attn: float = 0.0
    dropout_post_ff: float = 0.0

    @property
    def vocab_size(self) -> int:
        return self.encoder.vocab_size

    @property
    def head_dim(self) -> int:
        return self.decoder_d_model // self.decoder_heads


class DecoderBlock(nn.Module):
    config: EncDecConfig

    @nn.compact
    def __call__(self, x, a_hidden, a_mask, self_mask, deterministic=True,
                 cache: Optional[Dict] = None, position: Optional[jnp.ndarray] = None):
        cfg = self.config
        H, D = cfg.decoder_heads, cfg.head_dim
        B, T, _ = x.shape

        # causal self-attention (with optional KV ring cache for generation)
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=x.dtype, param_dtype=jnp.float32, name="ln_self")(x)
        qkv = nn.Dense(3 * H * D, use_bias=False, dtype=x.dtype,
                       param_dtype=jnp.float32, name="self_qkv")(h)
        q, k, v = jnp.split(qkv.reshape(B, T, 3, H, D), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        new_cache = None
        if cache is not None:
            # generation step: T == 1; cache layout [B, N, H, D]
            N = cache["k"].shape[1]
            slot = jnp.clip(position, 0, N - 1).astype(jnp.int32)
            bidx = jnp.arange(B)
            ck = cache["k"].at[bidx, slot].set(k[:, 0].astype(cache["k"].dtype))
            cv = cache["v"].at[bidx, slot].set(v[:, 0].astype(cache["v"].dtype))
            new_cache = {"k": ck, "v": cv}
            slots = jnp.arange(N)[None, :]
            valid = slots <= position[:, None]
            logits = jnp.einsum("bhd,bnhd->bhn", q[:, 0], ck,
                                preferred_element_type=jnp.float32) / jnp.sqrt(D)
            logits = jnp.where(valid[:, None, :], logits, -1e30)
            attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhn,bnhd->bhd", attn, cv)
            out = out.reshape(B, 1, H * D)
        else:
            logits = jnp.einsum("bthd,bshd->bhts", q, k,
                                preferred_element_type=jnp.float32) / jnp.sqrt(D)
            causal = jnp.tril(jnp.ones((T, T), bool))
            mask = causal[None, None] & self_mask[:, None, None, :]
            logits = jnp.where(mask, logits, -1e30)
            attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            attn = nn.Dropout(cfg.dropout_attn)(attn, deterministic=deterministic)
            out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, H * D)
        out = nn.Dense(cfg.decoder_d_model, use_bias=False, dtype=x.dtype,
                       param_dtype=jnp.float32, name="self_out")(out)
        x = x + out

        # cross-attention
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=x.dtype, param_dtype=jnp.float32, name="ln_cross")(x)
        qc = nn.Dense(H * D, use_bias=False, dtype=x.dtype,
                      param_dtype=jnp.float32, name="cross_q")(h)
        kvc = nn.Dense(2 * H * D, use_bias=False, dtype=x.dtype,
                       param_dtype=jnp.float32, name="cross_kv")(a_hidden)
        Ta = a_hidden.shape[1]
        kc, vc = jnp.split(kvc.reshape(B, Ta, 2, H, D), 2, axis=2)
        kc, vc = kc[:, :, 0], vc[:, :, 0]
        qc = qc.reshape(B, -1, H, D)
        logits = jnp.einsum("bthd,bshd->bhts", qc, kc,
                            preferred_element_type=jnp.float32) / jnp.sqrt(D)
        logits = jnp.where(a_mask[:, None, None, :], logits, -1e30)
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, vc).reshape(B, qc.shape[1], H * D)
        out = nn.Dense(cfg.decoder_d_model, use_bias=False, dtype=x.dtype,
                       param_dtype=jnp.float32, name="cross_out")(out)
        x = x + out

        # FF
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=x.dtype, param_dtype=jnp.float32, name="ln_ff")(x)
        h = nn.Dense(cfg.decoder_d_model * cfg.decoder_ff_mult, dtype=x.dtype,
                     param_dtype=jnp.float32, name="ff_in")(h)
        h = jax.nn.gelu(h)
        h = nn.Dense(cfg.decoder_d_model, dtype=x.dtype,
                     param_dtype=jnp.float32, name="ff_out")(h)
        h = nn.Dropout(cfg.dropout_post_ff)(h, deterministic=deterministic)
        return x + h, new_cache


class LanguageModelDecoder(nn.Module):
    config: EncDecConfig

    @nn.compact
    def __call__(self, tokens, a_hidden, a_lengths, text_lengths=None,
                 deterministic=True, cache=None, position=None):
        cfg = self.config
        B, T = tokens.shape
        Ta = a_hidden.shape[1]
        a_mask = lengths_to_mask(a_lengths, Ta)
        if text_lengths is None:
            self_mask = jnp.ones((B, T), bool)
        else:
            self_mask = lengths_to_mask(text_lengths, T)
        x = nn.Embed(cfg.vocab_size, cfg.decoder_d_model,
                     param_dtype=jnp.float32, name="embed")(tokens)
        if position is None:
            pos = jnp.arange(T)
        else:
            pos = position[:, None] if position.ndim == 1 else position
        pe = nn.Embed(cfg.max_text_len + 1, cfg.decoder_d_model,
                      param_dtype=jnp.float32, name="pos_enc")(
            jnp.clip(pos, 0, cfg.max_text_len)
        )
        x = x + (pe if pe.ndim == x.ndim else pe[None])
        x = nn.Dropout(cfg.dropout_emb)(x, deterministic=deterministic)
        new_caches = []
        for i in range(cfg.decoder_layers):
            layer_cache = None if cache is None else jax.tree.map(lambda c: c[i], cache)
            x, nc = DecoderBlock(cfg, name=f"layer_{i}")(
                x, a_hidden, a_mask, self_mask, deterministic,
                cache=layer_cache,
                position=position,
            )
            if nc is not None:
                new_caches.append(nc)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32, param_dtype=jnp.float32, name="ln_f")(x)
        logits = nn.Dense(cfg.vocab_size, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="head")(x)
        out = {"logits": logits}
        if new_caches:
            out["cache"] = jax.tree.map(lambda *xs: jnp.stack(xs), *new_caches)
        return out


class EncDecConformer(nn.Module):
    config: EncDecConfig

    def setup(self):
        self.encoder = SCConformer(self.config.encoder)
        self.language_model_decoder = LanguageModelDecoder(self.config)

    def encode(self, audio_signal, length=None):
        return self.encoder(audio_signal, length=length)

    def __call__(self, audio_signal, text_bos=None, length=None,
                 text_lengths=None, deterministic=True):
        enc = self.encode(audio_signal, length)
        out = {
            "a_hidden": enc["a_hidden"],
            "length": enc["length"],
            "final_posteriors_ctc": enc["final_posteriors"],
        }
        if text_bos is not None:
            dec = self.language_model_decoder(
                text_bos, enc["a_hidden"], enc["length"], text_lengths,
                deterministic=deterministic,
            )
            out["final_posteriors_lm"] = dec["logits"]
        return out

    def decode_step(self, tokens, a_hidden, a_lengths, cache, position):
        """One AR step with KV cache: tokens [B], position [B]."""
        return self.language_model_decoder(
            tokens[:, None], a_hidden, a_lengths, cache=cache, position=position
        )


def generate_encdec(
    model: EncDecConformer,
    variables,
    audio_signal: jnp.ndarray,  # [1, F, T]
    config: EncDecConfig,
    rng: Optional[jax.Array] = None,
    sample: int = 1,
    greedy: bool = True,
    temperature: float = 1.0,
    max_generate: int = 256,
    length: Optional[jnp.ndarray] = None,
    encoder_out: Optional[Dict] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """AR generation as a fixed-length scan with per-sample EOS retirement
    (reference ``generate_enc_dec``, ``lcasr/lib.py:1172-1226``).

    Returns (tokens [sample, max_generate], lengths [sample], encoder_out).
    """
    if encoder_out is None:
        encoder_out = model.apply(variables, audio_signal, length=length,
                                  method=model.encode)
    a_hidden = jnp.repeat(encoder_out["a_hidden"], sample, axis=0)
    a_lengths = jnp.repeat(encoder_out["length"], sample, axis=0)
    B = sample
    H, D = config.decoder_heads, config.head_dim
    L = config.decoder_layers
    N = max_generate + 1
    cache = {
        "k": jnp.zeros((L, B, N, H, D), jnp.float32),
        "v": jnp.zeros((L, B, N, H, D), jnp.float32),
    }
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    def step(carry, i):
        tokens_prev, cache, finished, lengths, key = carry
        pos = jnp.full((B,), i, jnp.int32)
        out = model.apply(
            variables, tokens_prev, a_hidden, a_lengths, cache, pos,
            method=model.decode_step,
        )
        logits = out["logits"][:, 0, :] * temperature
        key, k2 = jax.random.split(key)
        if greedy and sample == 1:
            nxt = jnp.argmax(logits, axis=-1)
        else:
            nxt = jax.random.categorical(k2, logits, axis=-1)
        is_eos = (nxt == config.eos_id) | (i >= max_generate - 1)
        newly_finished = is_eos & (~finished)
        emit = ~finished & ~is_eos
        lengths = lengths + emit.astype(jnp.int32)
        finished = finished | is_eos
        nxt = jnp.where(finished & ~newly_finished, config.eos_id, nxt)
        return (nxt, out["cache"], finished, lengths, key), nxt

    init = (
        jnp.full((B,), config.bos_id, jnp.int32),
        cache,
        jnp.zeros((B,), bool),
        jnp.zeros((B,), jnp.int32),
        rng,
    )
    (_, _, _, lengths, _), toks = jax.lax.scan(
        step, init, jnp.arange(max_generate)
    )
    tokens = toks.T  # [B, max_generate]
    # zero out tokens beyond length
    mask = jnp.arange(max_generate)[None, :] < lengths[:, None]
    tokens = jnp.where(mask, tokens, 0)
    return tokens, lengths, encoder_out


def init_encdec(config: EncDecConfig, rng, example_T: int = 256):
    model = EncDecConformer(config)
    x = jnp.zeros((1, config.encoder.feat_in, example_T), jnp.float32)
    txt = jnp.zeros((1, 4), jnp.int32)
    variables = jax.jit(model.init)({"params": rng}, x, txt)
    return model, variables
