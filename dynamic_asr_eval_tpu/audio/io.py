"""Host-side audio decode (C++ stays host-side: ffmpeg / wave / scipy).

The reference decodes mp3/sph/wav through ffmpeg inside
``lcasr.utils.audio_tools.processing_chain`` and torchaudio
(``lcasr/chime6/run.py:53``, ``lcasr/run_seq_eval.py:33-35``).  This image has
no soundfile/librosa, so:

- WAV: stdlib ``wave`` + numpy (any PCM width), or scipy fallback;
- MP3 / SPH / anything else: the ``ffmpeg`` binary if present (decode to
  16-bit PCM on stdout);
- resampling: polyphase via scipy.

Everything returns float32 mono in [-1, 1].
"""

from __future__ import annotations

import os
import shutil
import subprocess
import wave
from typing import Optional, Tuple

import numpy as np


def _ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def load_via_ffmpeg(path: str, target_sr: int = 16000) -> Tuple[np.ndarray, int]:
    if not _ffmpeg_available():
        raise RuntimeError(
            f"ffmpeg not available to decode {path!r}; provide WAV input instead"
        )
    cmd = [
        "ffmpeg", "-v", "error", "-i", path,
        "-f", "s16le", "-acodec", "pcm_s16le", "-ac", "1",
        "-ar", str(target_sr), "-",
    ]
    out = subprocess.run(cmd, capture_output=True, check=True).stdout
    x = np.frombuffer(out, dtype="<i2").astype(np.float32) / 32768.0
    return x, target_sr


def resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return x
    from scipy.signal import resample_poly
    from math import gcd

    g = gcd(orig_sr, target_sr)
    return resample_poly(x, target_sr // g, orig_sr // g).astype(np.float32)


def load_audio(path: str, target_sr: int = 16000) -> np.ndarray:
    """Decode any supported file to float32 mono at ``target_sr``."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        try:
            x, sr = load_wav(path)
        except Exception:
            x, sr = load_via_ffmpeg(path, target_sr)
    else:
        x, sr = load_via_ffmpeg(path, target_sr)
    return resample(x, sr, target_sr)


def audio_duration_seconds(path: str) -> Optional[float]:
    """Duration probe (the seq-scaling driver filters ≥60-min recordings this
    way, ``lcasr/run_seq_eval.py:33-35``)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        try:
            with wave.open(path, "rb") as w:
                return w.getnframes() / w.getframerate()
        except Exception:
            pass
    if shutil.which("ffprobe"):
        try:
            out = subprocess.run(
                ["ffprobe", "-v", "error", "-show_entries", "format=duration",
                 "-of", "default=noprint_wrappers=1:nokey=1", path],
                capture_output=True, check=True,
            ).stdout
            return float(out.strip())
        except Exception:
            return None
    return None
