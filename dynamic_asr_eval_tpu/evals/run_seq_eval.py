"""NSTI sequence-length scaling driver.

Capability parity with ``lcasr/run_seq_eval.py:37-195``: keep only long
recordings (≥ ``--min_duration`` seconds, duration probe ``:33-35``), split
each into outer chunks of ``--nsti_seq_len``, run the full NSTI engine on
each outer chunk independently (inner windows ``seq_len``/``overlap``), then
second-level-stitch the per-chunk stitched probabilities (``:104-146``).
``epochs=0`` degrades to a single whole-recording windowed eval (``:101-103``).
"""

from __future__ import annotations

import argparse

import numpy as np

from dynamic_asr_eval_tpu.config import apply_args
from dynamic_asr_eval_tpu.data import get_dataset
from dynamic_asr_eval_tpu.evals.common import (
    build_engine,
    evaluate_records,
    load_model_and_tokenizer,
    save_result_pickle,
)
from dynamic_asr_eval_tpu.ops.chunk import chunk_starts_and_lengths
from dynamic_asr_eval_tpu.ops.ctc import greedy_decode
from dynamic_asr_eval_tpu.text import normalize


def seq_eval_one(engine, variables, spec, args, ds: int, vocab_plus: int) -> np.ndarray:
    spec = np.asarray(spec)
    if spec.ndim == 3:
        spec = spec[0]
    spec_n = spec.shape[-1]
    outer_len = args.nsti_seq_len if args.nsti_seq_len != -1 else spec_n
    outer_overlap = args.nsti_overlap
    if args.__dict__.get("epochs", 1) == 0:
        outer_len, outer_overlap = spec_n, 0

    starts, lens = chunk_starts_and_lengths(spec_n, outer_len, outer_overlap)
    total = spec_n // ds + outer_len // ds + 8
    acc = np.zeros((total, vocab_plus), np.float64)
    counts = np.zeros((total,), np.float64)
    pos = 0
    for k, (s, L) in enumerate(zip(starts, lens)):
        sub = spec[:, s : s + L]
        out = engine(variables, sub, args.seq_len, args.overlap)
        lp = out.numpy_logits()
        ds_len = lp.shape[0]
        overlap_ds = int(outer_overlap / (L / ds_len)) if L else 0
        pos -= overlap_ds if k != 0 else 0
        acc[pos : pos + ds_len] += np.exp(lp)
        counts[pos : pos + ds_len] += 1
        pos += ds_len
    nz = counts > 0
    return np.log(np.maximum(acc[nz] / counts[nz, None], 1e-12)).astype(np.float32)


def main(args) -> float:
    model, variables, tokenizer, cfg = load_model_and_tokenizer(args)
    engine = build_engine(args, model, cfg)
    records = get_dataset(args.dataset, args.split)

    # duration filter (run_seq_eval.py:33-35); synthetic/spec-only records
    # fall back to spectrogram length after processing
    min_dur = getattr(args, "min_duration", 0.0)
    if min_dur > 0:
        from dynamic_asr_eval_tpu.audio.io import audio_duration_seconds

        kept = []
        for rec in records:
            if rec.get("audio") and isinstance(rec["audio"], str):
                d = audio_duration_seconds(rec["audio"])
                if d is not None and d < min_dur:
                    continue
            kept.append(rec)
        records = kept

    def run_one(rec):
        spec, gold = rec["process_fn"](rec)
        logits = seq_eval_one(engine, variables, spec, args, cfg.subsampling_factor, cfg.n_classes)
        return normalize(greedy_decode(logits, tokenizer, cfg.blank_id)), gold

    wer, detail = evaluate_records(records, run_one, verbose=not getattr(args, "quiet", False))
    print(f"WER: {wer}")
    if getattr(args, "save_path", ""):
        save_result_pickle(args.save_path, detail, args, 0, 1)
    return wer


def cli(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-d", "--dataset", type=str, default="synthetic")
    parser.add_argument("--nsti_seq_len", type=int, default=-1)
    parser.add_argument("--nsti_overlap", type=int, default=0)
    parser.add_argument("--min_duration", type=float, default=0.0,
                        help="keep only recordings at least this long (seconds)")
    parser.add_argument("-s", "--save_path", type=str, default="")
    parser.add_argument("--tokenizer", type=str, default="")
    parser.add_argument("--quiet", action="store_true")
    args = apply_args(parser, argv)
    return main(args)


if __name__ == "__main__":
    cli()
