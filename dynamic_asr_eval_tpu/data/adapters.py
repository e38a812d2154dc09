"""Dataset adapters: TEDLIUM, Earnings-22, CHiME-6, Rev16 (+ synthetic).

Capability parity with the reference's per-dataset ``run.py`` adapters, all of
which expose ``get_text_and_audio(split) -> [records]`` where each record has
``{'id', 'text', 'audio', 'process_fn'}`` and ``process_fn(rec) ->
(spec [1, 80, T], normalized_gold_text)``:

- Earnings-22 — mp3 dir + one JSON of transcripts; tag-stripping transcript
  normalizer (``lcasr/earnings22/run.py:26-75``)
- TEDLIUM — sph+stm pairs; STM parsing with ``ignore_time_segment_in_scoring``
  → zero-out of those spectrogram regions; apostrophe re-joining
  (``lcasr/tedlium/run.py:30-113``); utterance segmentation helper
- CHiME-6 — multi-mic array: all S*_U01.CH*.wav channels, per-channel mean
  downmix, per-channel spectrograms averaged then re-normalized per freq row,
  trimmed to first/last word times from the JSON
  (``lcasr/chime6/run.py:48-128``)
- Rev16 — id list file → mp3 + txt transcripts (``lcasr/rev16/run.py:23-57``)
- synthetic — generated sine/noise recordings with known texts for tests and
  machines without the datasets.

Paths come from ``paths.yaml`` (``config.load_paths``), same schema as the
reference's ``paths_template.yaml``.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional

import numpy as np

from dynamic_asr_eval_tpu.audio.features import (
    FeaturizerConfig,
    log_mel_spectrogram,
    zero_out_spectrogram,
)
from dynamic_asr_eval_tpu.audio.io import load_audio
from dynamic_asr_eval_tpu.config import load_paths
from dynamic_asr_eval_tpu.text.normalizer import normalize

_FEAT = FeaturizerConfig()


def _spec_from_path(path: str) -> np.ndarray:
    return log_mel_spectrogram(load_audio(path, _FEAT.sample_rate), _FEAT)


# ---------------------------------------------------------------------------
# Earnings-22
# ---------------------------------------------------------------------------


def preprocess_earnings_transcript(text: str) -> str:
    """Tag stripping per the reference (``lcasr/earnings22/run.py:45-59``)."""
    text = text.lower()
    for tag in ("<silence>", "<inaudible>", "<laugh>", "<noise>",
                "<affirmative>", "<crosstalk>", "…"):
        text = text.replace(tag, "")
    text = text.replace(",", "").replace("-", " ").replace(".", "").replace("?", "")
    text = re.sub(" +", " ", text)
    return normalize(text)


def _earnings22(split: str, paths=None) -> List[Dict]:
    paths = paths or load_paths()
    audio_path = paths.get_path(f"datasets.earnings.{split}")
    text_path = paths.get_path("datasets.earnings.text")
    if not audio_path or not text_path:
        raise FileNotFoundError("paths.yaml missing datasets.earnings entries")
    with open(text_path, "r") as f:
        all_text = json.load(f)

    def process_fn(rec):
        return _spec_from_path(rec["audio"]), preprocess_earnings_transcript(rec["text"])

    out = []
    for fname in sorted(os.listdir(audio_path)):
        if not fname.endswith(".mp3"):
            continue
        meeting = fname[: -len(".mp3")]
        out.append({
            "id": meeting,
            "text": all_text[meeting],
            "audio": os.path.join(audio_path, fname),
            "process_fn": process_fn,
        })
    return out


# ---------------------------------------------------------------------------
# TEDLIUM
# ---------------------------------------------------------------------------


def proc_stm_and_timings(stm_path: str):
    """Parse an STM file → (joined text, kept timings, ignore timings), with
    the reference's apostrophe re-join and whitespace collapse
    (``lcasr/tedlium/run.py:30-51``)."""
    with open(stm_path, "r") as f:
        lines = f.read().split("\n")
    all_text = ""
    timings, remove_timings = [], []
    for line in lines:
        sline = line.split(" ")
        if len(sline) < 6:
            continue
        _, _, _, start, end, _ = sline[:6]
        text = " ".join(sline[6:])
        if text == "ignore_time_segment_in_scoring":
            remove_timings.append((float(start), float(end)))
            continue
        all_text += text + " "
        timings.append((float(start), float(end)))
    all_text = all_text.strip()
    all_text = re.sub(r" '([a-z])", r"'\1", all_text)
    all_text = re.sub(r" +", r" ", all_text)
    return all_text, timings, remove_timings


def fetch_utterances(stm_path: str, spec: np.ndarray):
    """Utterance segmentation over an existing spectrogram
    (``lcasr/tedlium/run.py:53-77``)."""
    fps = _FEAT.sample_rate / _FEAT.hop_length
    with open(stm_path, "r") as f:
        lines = f.read().split("\n")
    utterances = []
    for line in lines:
        sline = line.split(" ")
        if len(sline) < 6:
            continue
        _, _, _, start, end, _ = sline[:6]
        text = " ".join(sline[6:])
        if text == "ignore_time_segment_in_scoring":
            continue
        sf, ef = int(float(start) * fps), int(float(end) * fps)
        utterances.append({
            "start": float(start), "end": float(end), "text": text,
            "start_frame": sf, "end_frame": ef,
            "spectrogram": spec[..., sf:ef],
        })
    all_text = " ".join(u["text"] for u in utterances)
    all_text = re.sub(r" '([a-z])", r"'\1", all_text)
    all_text = re.sub(r" +", r" ", all_text)
    return utterances, all_text


def _tedlium(split: str, paths=None) -> List[Dict]:
    paths = paths or load_paths()
    data_path = paths.get_path(f"datasets.tedlium.{split}")
    if not data_path:
        raise FileNotFoundError("paths.yaml missing datasets.tedlium entries")
    sph_dir = os.path.join(data_path, "sph")
    stm_dir = os.path.join(data_path, "stm")
    audio_files = sorted(
        os.path.join(sph_dir, f) for f in os.listdir(sph_dir) if f.endswith(".sph")
    )
    text_files = sorted(
        os.path.join(stm_dir, f) for f in os.listdir(stm_dir) if f.endswith(".stm")
    )
    assert len(audio_files) == len(text_files), "sph/stm count mismatch"

    def process_fn(rec):
        gold, _, remove_timings = proc_stm_and_timings(rec["text"])
        spec = _spec_from_path(rec["audio"])
        spec = zero_out_spectrogram(spec, remove_timings, _FEAT)
        return spec, normalize(gold)

    return [
        {"id": a, "text": t, "audio": a, "process_fn": process_fn}
        for a, t in zip(audio_files, text_files)
    ]


# ---------------------------------------------------------------------------
# CHiME-6
# ---------------------------------------------------------------------------


def _hms_to_seconds(s: str) -> float:
    h, m, sec = s.split(":")
    return int(h) * 3600 + int(m) * 60 + float(sec)


def combine_and_load_audio(audio_files: List[str], stime: float, etime: float) -> np.ndarray:
    """Average per-channel spectrograms of the U01 array, trim to word times,
    re-normalize per frequency row (``lcasr/chime6/run.py:48-70``)."""
    fps = _FEAT.sample_rate / _FEAT.hop_length
    waves = [load_audio(p, _FEAT.sample_rate) for p in audio_files]
    max_len = max(w.shape[-1] for w in waves)
    waves = [np.pad(w, (0, max_len - w.shape[-1])) for w in waves]
    cfg = FeaturizerConfig(normalize=False)
    specs = [log_mel_spectrogram(w, cfg) for w in waves]
    sf, ef = int(stime * fps), int(etime * fps)
    specs = [s[..., sf:ef] for s in specs]
    spec = np.stack(specs, axis=0).mean(axis=0)
    spec = (spec - spec.mean(-1, keepdims=True)) / (spec.std(-1, keepdims=True) + 1e-8)
    return spec


def _chime6(split: str, paths=None) -> List[Dict]:
    paths = paths or load_paths()
    base = paths.get_path(f"datasets.chime6.{split}")
    if not base:
        raise FileNotFoundError("paths.yaml missing datasets.chime6 entries")
    text_dir = base["text"] if isinstance(base, dict) else os.path.join(base, "transcriptions")
    audio_dir = base["audio"] if isinstance(base, dict) else os.path.join(base, "audio")

    text_files, stimes, etimes = {}, {}, {}
    for fname in os.listdir(text_dir):
        if not fname.endswith(".json"):
            continue
        with open(os.path.join(text_dir, fname), "r") as f:
            j = json.load(f)
        scene = fname[: -len(".json")]
        text_files[scene] = " ".join(el["words"] for el in j)
        stimes[scene] = _hms_to_seconds(j[0]["start_time"])
        etimes[scene] = _hms_to_seconds(j[-1]["end_time"])

    audio_names = [
        f for f in os.listdir(audio_dir) if re.match(r"S\d+_U01\.CH\d+\.wav", f)
    ]
    scenes = sorted({f.split("_")[0] for f in audio_names})
    audio_files = {
        s: sorted(os.path.join(audio_dir, f) for f in audio_names if f.startswith(s + "_"))
        for s in scenes
    }
    assert set(audio_files) == set(text_files), "CHiME-6 scene keys mismatch"

    def process_fn(rec):
        spec = combine_and_load_audio(rec["audio"], rec["stimes"], rec["etimes"])
        return spec, normalize(rec["text"])

    return [
        {
            "id": s, "text": text_files[s], "audio": audio_files[s],
            "stimes": stimes[s], "etimes": etimes[s], "process_fn": process_fn,
        }
        for s in scenes
    ]


# ---------------------------------------------------------------------------
# Rev16
# ---------------------------------------------------------------------------


def _rev16(split: str, paths=None) -> List[Dict]:
    paths = paths or load_paths()
    base = paths.get_path("datasets.rev16.path")
    ids_file = paths.get_path("datasets.rev16.ids")
    if not base or not ids_file:
        raise FileNotFoundError("paths.yaml missing datasets.rev16 entries")
    with open(ids_file, "r") as f:
        ids = [el.strip() for el in f.read().strip().split(" ") if el.strip()]

    def process_fn(rec):
        return _spec_from_path(rec["audio"]), normalize(rec["text"])

    out = []
    for i in ids:
        with open(os.path.join(base, "transcripts", i + ".txt"), "r") as f:
            text = f.read().strip()
        out.append({
            "id": i,
            "text": text,
            "audio": os.path.join(base, "audio", i + ".mp3"),
            "process_fn": process_fn,
        })
    return out


# ---------------------------------------------------------------------------
# Synthetic (tests / dataless machines)
# ---------------------------------------------------------------------------


def _synthetic(split: str, paths=None, n_records: int = 3, seconds: float = 4.0) -> List[Dict]:
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "speech recognition systems adapt at test time",
        "long context models stitch overlapping windows",
    ]

    def process_fn(rec):
        rng = np.random.default_rng(rec["seed"])
        n = int(seconds * _FEAT.sample_rate)
        t = np.arange(n) / _FEAT.sample_rate
        wave = 0.1 * np.sin(2 * np.pi * (200 + 50 * rec["seed"]) * t)
        wave += 0.01 * rng.standard_normal(n)
        return log_mel_spectrogram(wave.astype(np.float32), _FEAT), normalize(rec["text"])

    return [
        {"id": f"synthetic_{i}", "text": texts[i % len(texts)], "audio": None,
         "seed": i, "process_fn": process_fn}
        for i in range(n_records)
    ]


def _synthetic_spec(split: str, paths=None) -> List[Dict]:
    """Spectrogram-level synthetic corpus for timing benches (bench.py corpus
    mode): per-record FRAME counts from ``DAE_SYNTH_SPEC_FRAMES`` (comma
    list), spectrograms generated directly — no waveform synthesis or log-mel
    pass — so a timed driver run measures exactly the adapt → stitched decode
    → normalize → WER → pickle path (the corpus north-star surface,
    BASELINE.md; reference single-recording analogue:
    ``launch_scripts/timeit_earnings22.sh``)."""
    frames = [int(x) for x in os.environ.get(
        "DAE_SYNTH_SPEC_FRAMES", "3000,6000").split(",")]
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "speech recognition systems adapt at test time",
        "long context models stitch overlapping windows",
    ]

    def process_fn(rec):
        rng = np.random.default_rng(rec["seed"])
        spec = rng.standard_normal(
            (1, 80, rec["frames"]), dtype=np.float32)
        return spec, normalize(rec["text"])

    return [
        {"id": f"synthetic_spec_{i}_{t}", "text": texts[i % len(texts)],
         "audio": None, "seed": i, "frames": t, "process_fn": process_fn}
        for i, t in enumerate(frames)
    ]


datasets_functions = {
    "earnings22": _earnings22,
    "tedlium": _tedlium,
    "chime6": _chime6,
    "rev16": _rev16,
    "synthetic": _synthetic,
    "synthetic_spec": _synthetic_spec,
}


def get_dataset(name: str, split: str, paths: Optional[object] = None) -> List[Dict]:
    if name not in datasets_functions:
        raise KeyError(f"unknown dataset {name!r}; have {sorted(datasets_functions)}")
    return datasets_functions[name](split, paths=paths)
