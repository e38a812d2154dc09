"""Waveform-domain augmentations, jittable under PRNG keys.

Capability parity with the reference's WavAugment ``EffectChain`` usage for
wav2vec2 TTA (``wav2vec2/lib.py:145-156``: ``time_dropout(max_seconds=0.3)``
applied ×100, additive noise at a random SNR, sox reverb) — without the
C++/sox host round-trip:

- :func:`time_dropout` — N random boxes of up to ``max_seconds`` zeroed;
- :func:`additive_noise` — white noise mixed at a uniform-random SNR (dB);
- :func:`simple_reverb` — a light feedback-comb + one-pole-damped IIR tail
  (a jittable approximation of sox reverb; documented divergence — WER-level
  parity is the bar, SURVEY.md §7.3 item 6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def time_dropout(
    wave: jnp.ndarray,  # [T]
    key: jax.Array,
    n_boxes: int = 100,
    max_seconds: float = 0.3,
    sample_rate: int = 16000,
) -> jnp.ndarray:
    T = wave.shape[-1]
    max_w = max(int(max_seconds * sample_rate), 1)
    k1, k2 = jax.random.split(key)
    widths = jax.random.randint(k1, (n_boxes,), 0, max_w)
    starts = jax.random.randint(k2, (n_boxes,), 0, max(T - 1, 1))
    idx = jnp.arange(T)[None, :]
    boxes = (idx >= starts[:, None]) & (idx < (starts + widths)[:, None])
    return jnp.where(boxes.any(axis=0), 0.0, wave)


def additive_noise(
    wave: jnp.ndarray,
    key: jax.Array,
    snr_db_min: float = 10.0,
    snr_db_max: float = 30.0,
) -> jnp.ndarray:
    k1, k2 = jax.random.split(key)
    snr_db = jax.random.uniform(k1, (), minval=snr_db_min, maxval=snr_db_max)
    sig_pow = jnp.mean(wave**2) + 1e-12
    noise_pow = sig_pow / (10.0 ** (snr_db / 10.0))
    noise = jax.random.normal(k2, wave.shape) * jnp.sqrt(noise_pow)
    return wave + noise


def simple_reverb(
    wave: jnp.ndarray,
    key: jax.Array,
    reverberance: float = 0.5,
    delay_ms: float = 40.0,
    sample_rate: int = 16000,
    n_taps: int = 6,
) -> jnp.ndarray:
    """Feedback-comb style tail: y = x + Σ_k g^k · delay(x, k·d).  Static
    shapes, pure adds/rolls — fuses into the surrounding jit."""
    d = max(int(delay_ms / 1000.0 * sample_rate), 1)
    g = jnp.clip(reverberance, 0.0, 0.95)
    out = wave
    T = wave.shape[-1]
    for k in range(1, n_taps + 1):
        shift = k * d
        delayed = jnp.where(
            jnp.arange(T) >= shift, jnp.roll(wave, shift), 0.0
        )
        out = out + (g ** k) * delayed
    return out / (1.0 + g)


def wav_augment_pipeline(
    wave: jnp.ndarray,  # [T] or [B, T]
    key: jax.Array,
    n_time_dropout: int = 100,
    max_dropout_seconds: float = 0.3,
    noise: bool = True,
    reverb: bool = True,
    sample_rate: int = 16000,
) -> jnp.ndarray:
    """The reference chain: time_dropout ×N → additive noise → reverb
    (``wav2vec2/lib.py:146-156``)."""
    if wave.ndim == 2:
        keys = jax.random.split(key, wave.shape[0])
        return jax.vmap(
            lambda w, k: wav_augment_pipeline(
                w, k, n_time_dropout, max_dropout_seconds, noise, reverb, sample_rate
            )
        )(wave, keys)
    k1, k2, k3 = jax.random.split(key, 3)
    out = time_dropout(wave, k1, n_time_dropout, max_dropout_seconds, sample_rate)
    if noise:
        out = additive_noise(out, k2)
    if reverb:
        out = simple_reverb(out, k3)
    return out
