"""Spectrogram-domain augmentations, fully jittable under explicit PRNG keys.

TPU-first re-design of the reference's augmentation family used inside the
TTA hot loop (``lcasr/lib.py:539-545``):

- SpecAugment frequency/time masks (external ``lcasr.utils.augmentation``
  usage; config knobs at ``lcasr/lib.py:102-112``: ``n_time_masks``,
  ``n_freq_masks``, ``freq_mask_param``, ``time_mask_param``, ``min_p``,
  ``zero_masking``).  ``time_mask_param == -1`` selects proportional widths
  drawn from ``[min_p, max_p]·T / n_time_masks``.
- ``cutout`` rectangles with zero / per-rectangle-mean / recording-mean fill
  (``lcasr/lib.py:384-417``); rectangle count scales with the actual/seq_len
  ratio like the reference.
- ``frame_shuffle`` over time and/or frequency (``lcasr/lib.py:81-84``)
- ``add_random_noise`` scaled by the spectrogram std (``lcasr/lib.py:379-382``)

All functions take ``spec [..., F, T]`` and a PRNG key; masking uses dense
index comparisons (no dynamic shapes), so every op fuses into the surrounding
jit — the augmentations add no host synchronization to the adaptation scan.

Divergence note (documented per SURVEY.md §7.3 item 6): under jit,
per-rectangle means for ``cutout`` are computed against the *original*
spectrogram even when rectangles overlap (the reference applies them
sequentially); parity is at the WER level, not the sample level.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dynamic_asr_eval_tpu.config import CutoutConfig, FrameShuffleConfig, SpecAugmentConfig


def _band_mask(key, size: int, max_width, n_masks: int, proportional_widths=None):
    """Return a bool [size] mask with n_masks random bands set True."""
    k1, k2 = jax.random.split(key)
    if proportional_widths is not None:
        widths = proportional_widths
    else:
        widths = jax.random.randint(k1, (n_masks,), 0, max(int(max_width), 1))
    starts = jax.random.randint(k2, (n_masks,), 0, max(size - 1, 1))
    idx = jnp.arange(size)[None, :]
    bands = (idx >= starts[:, None]) & (idx < (starts + widths)[:, None])
    return bands.any(axis=0)


def spec_augment(
    spec: jnp.ndarray,  # [F, T] or [B, F, T]
    key: jax.Array,
    config: SpecAugmentConfig,
) -> jnp.ndarray:
    if spec.ndim == 3:
        keys = jax.random.split(key, spec.shape[0])
        return jax.vmap(lambda s, k: spec_augment(s, k, config))(spec, keys)
    F, T = spec.shape
    fill = 0.0 if config.zero_masking else spec.mean()
    out = spec
    kf, kt, kw = jax.random.split(key, 3)
    if config.n_freq_masks > 0:
        fmask = _band_mask(kf, F, config.freq_mask_param, config.n_freq_masks)
        out = jnp.where(fmask[:, None], fill, out)
    if config.n_time_masks > 0:
        if config.time_mask_param and config.time_mask_param > 0:
            tmask = _band_mask(kt, T, config.time_mask_param, config.n_time_masks)
        else:
            # proportional widths in [min_p, max_p] · T / n_masks
            props = jax.random.uniform(
                kw, (config.n_time_masks,), minval=config.min_p, maxval=config.max_p
            )
            widths = (props * T / config.n_time_masks).astype(jnp.int32)
            tmask = _band_mask(kt, T, None, config.n_time_masks, proportional_widths=widths)
        out = jnp.where(tmask[None, :], fill, out)
    return out


def replace_with_frame(spec: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Replace every frame with one randomly chosen frame
    (``replace_with_frame``, ``lcasr/lib.py:74-79``)."""
    if spec.ndim == 3:
        keys = jax.random.split(key, spec.shape[0])
        return jax.vmap(replace_with_frame)(spec, keys)
    T = spec.shape[-1]
    idx = jax.random.randint(key, (), 0, T)
    return jnp.broadcast_to(spec[:, idx][:, None], spec.shape)


def frame_shuffle(
    spec: jnp.ndarray, key: jax.Array, config: FrameShuffleConfig
) -> jnp.ndarray:
    if not (config.time_dimension or config.freq_dimension):
        return spec
    if spec.ndim == 3:
        keys = jax.random.split(key, spec.shape[0])
        return jax.vmap(lambda s, k: frame_shuffle(s, k, config))(spec, keys)
    kt, kf = jax.random.split(key)
    out = spec
    if config.time_dimension:
        out = out[:, jax.random.permutation(kt, out.shape[-1])]
    if config.freq_dimension:
        out = out[jax.random.permutation(kf, out.shape[-2]), :]
    return out


def add_random_noise(spec: jnp.ndarray, key: jax.Array, noise_factor: float) -> jnp.ndarray:
    if noise_factor == 0.0:
        return spec
    noise = jax.random.normal(key, spec.shape, spec.dtype) * spec.std()
    return spec + noise * noise_factor


def cutout(
    spec: jnp.ndarray,  # [F, T] or [B, F, T]
    key: jax.Array,
    config: CutoutConfig,
    actual_len: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    if config.num_rectangles == 0:
        return spec
    if spec.ndim == 3:
        keys = jax.random.split(key, spec.shape[0])
        return jax.vmap(lambda s, k: cutout(s, k, config, actual_len))(spec, keys)
    F, T = spec.shape
    n = config.num_rectangles
    # reference scales rectangle count by spec_len/seq_len; emulate with a
    # per-rectangle keep mask so shapes stay static
    L = T if actual_len is None else actual_len
    n_active = jnp.floor(n * (L / config.seq_len)).astype(jnp.int32)
    kws = jax.random.split(key, 5)
    widths = jax.random.randint(kws[0], (n,), 1, max(config.max_width, 2))
    heights = jax.random.randint(kws[1], (n,), 1, max(config.max_height, 2))
    xs = jax.random.randint(kws[2], (n,), 0, T)
    ys = jax.random.randint(kws[3], (n,), 0, F)
    active = jnp.arange(n) < n_active

    tt = jnp.arange(T)[None, None, :]
    ff = jnp.arange(F)[None, :, None]
    rect = (
        (tt >= xs[:, None, None])
        & (tt < jnp.minimum(xs + widths, T)[:, None, None])
        & (ff >= ys[:, None, None])
        & (ff < jnp.minimum(ys + heights, F)[:, None, None])
        & active[:, None, None]
    )  # [n, F, T]

    if config.cutout_val == "zero":
        fills = jnp.zeros((n,), spec.dtype)
    elif config.cutout_val == "mean_recording":
        fills = jnp.full((n,), spec.mean(), spec.dtype)
    elif config.cutout_val == "mean":
        denom = jnp.maximum(rect.sum((1, 2)), 1)
        fills = (spec[None] * rect).sum((1, 2)) / denom
    else:
        raise ValueError(f"unknown cutout value mode {config.cutout_val}")

    out = spec
    # later rectangles overwrite earlier ones, matching sequential application
    for i in range(n):
        out = jnp.where(rect[i], fills[i], out)
    return out


def apply_augmentation_pipeline(
    spec: jnp.ndarray,  # [B, F, T] augmented copies only
    key: jax.Array,
    spec_augment_config: SpecAugmentConfig,
    frame_shuffle_config: FrameShuffleConfig,
    cutout_config: CutoutConfig,
    random_noise: float = 0.0,
    actual_len: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """The reference's augmentation order for the TTA student copies
    (``lcasr/lib.py:541-545``): SpecAugment → frame shuffle → noise → cutout.
    (Entropy augmentation needs the model and lives in the engine.)"""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    out = spec_augment(spec, k1, spec_augment_config)
    out = frame_shuffle(out, k2, frame_shuffle_config)
    out = add_random_noise(out, k3, random_noise)
    out = cutout(out, k4, cutout_config, actual_len)
    return out
