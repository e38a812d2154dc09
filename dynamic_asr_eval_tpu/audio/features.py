"""Jittable log-mel featurization — the TPU-native ``processing_chain``.

The reference featurizes on the host through the external
``lcasr.utils.audio_tools.processing_chain(path) -> spec [1, 80, T]``
(ffmpeg decode → log-mel → normalize; used by every dataset adapter, e.g.
``lcasr/earnings22/run.py:63-75``).  Here decode stays on host
(:mod:`dynamic_asr_eval_tpu.audio.io`) but the DSP is a fused JAX pipeline:

  frame (gather) → Hann window → rFFT power → mel filterbank (one MXU
  matmul) → log → optional per-feature normalization

Defaults match the standard 16 kHz / 25 ms / 10 ms / 80-mel setup the lcasr
models were trained with (hop 160 ⇒ ~100 frames/s, consistent with the
reference's 4159.9 s recording → ~416 k frame spectrograms,
``launch_scripts/timeit_earnings22.sh``).

Also provides :func:`zero_out_spectrogram` for TEDLIUM's
``ignore_time_segment_in_scoring`` regions (``lcasr/tedlium/run.py:30-51``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FeaturizerConfig:
    sample_rate: int = 16000
    n_fft: int = 512
    win_length: int = 400
    hop_length: int = 160
    n_mels: int = 80
    fmin: float = 0.0
    fmax: Optional[float] = None  # defaults to sample_rate / 2
    log_offset: float = 1e-5
    normalize: bool = True  # per-feature mean/std over time


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def mel_filterbank(config: FeaturizerConfig) -> np.ndarray:
    """[n_mels, n_fft//2 + 1] triangular HTK-mel filterbank."""
    fmax = config.fmax or config.sample_rate / 2
    n_bins = config.n_fft // 2 + 1
    fft_freqs = np.linspace(0, config.sample_rate / 2, n_bins)
    mel_pts = np.linspace(hz_to_mel(config.fmin), hz_to_mel(fmax), config.n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((config.n_mels, n_bins), dtype=np.float32)
    for i in range(config.n_mels):
        lo, ctr, hi = hz_pts[i], hz_pts[i + 1], hz_pts[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
    return fb


@partial(jax.jit, static_argnums=(1,))
def _log_mel(audio: jnp.ndarray, config: FeaturizerConfig) -> jnp.ndarray:
    n = audio.shape[-1]
    pad = config.n_fft // 2
    x = jnp.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (n // config.hop_length)
    idx = (
        jnp.arange(n_frames)[:, None] * config.hop_length
        + jnp.arange(config.n_fft)[None, :]
    )
    frames = x[idx]  # [T, n_fft]
    window = jnp.asarray(np.hanning(config.win_length + 1)[:-1].astype(np.float32))
    wpad = (config.n_fft - config.win_length) // 2
    window = jnp.pad(window, (wpad, config.n_fft - config.win_length - wpad))
    spec = jnp.fft.rfft(frames * window, n=config.n_fft, axis=-1)
    power = jnp.abs(spec) ** 2  # [T, bins]
    fb = jnp.asarray(mel_filterbank(config))  # [mels, bins]
    mel = power @ fb.T  # MXU matmul
    logmel = jnp.log(mel + config.log_offset)  # [T, mels]
    out = logmel.T  # [mels, T]
    if config.normalize:
        mean = out.mean(axis=1, keepdims=True)
        std = out.std(axis=1, keepdims=True)
        out = (out - mean) / (std + 1e-8)
    return out


def log_mel_spectrogram(
    audio: np.ndarray, config: FeaturizerConfig = FeaturizerConfig()
) -> np.ndarray:
    """waveform [n] → log-mel spec [1, n_mels, T] (reference layout)."""
    out = _log_mel(jnp.asarray(audio, jnp.float32), config)
    return np.asarray(out)[None]


def make_featurizer(config: FeaturizerConfig = FeaturizerConfig()):
    """Return a jitted featurizer closure (waveform → [n_mels, T])."""
    return lambda audio: _log_mel(jnp.asarray(audio, jnp.float32), config)


def zero_out_spectrogram(
    spec: np.ndarray,  # [1, F, T] or [F, T]
    regions_seconds,
    config: FeaturizerConfig = FeaturizerConfig(),
) -> np.ndarray:
    """Zero the frames covering each (start_s, end_s) region — TEDLIUM's
    ignore-segment handling (``lcasr/tedlium/run.py:41-51``)."""
    spec = np.array(spec, copy=True)
    frames_per_second = config.sample_rate / config.hop_length
    T = spec.shape[-1]
    for start_s, end_s in regions_seconds:
        a = int(np.floor(start_s * frames_per_second))
        b = int(np.ceil(end_s * frames_per_second))
        spec[..., max(a, 0) : min(b, T)] = 0.0
    return spec
