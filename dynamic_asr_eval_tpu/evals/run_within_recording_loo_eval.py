"""Within-recording leave-one-out driver.

Capability parity with ``lcasr/run_within_recording_loo_eval.py:26-236``:
two-level chunking — outer LOO chunks (default 65536/57344) over the usual
inner TTA windows (16384/14336).  For each outer chunk i: adapt on it, then
run windowed inference ONLY on outer chunks j that are audio-disjoint from i
(``loo_eval``, ``:103-181``); contributions accumulate at downsampled
positions; uncovered-gap warning before decode; fallbacks when <2 chunks or
no disjoint pairs.
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np

from dynamic_asr_eval_tpu.config import apply_args
from dynamic_asr_eval_tpu.data import get_dataset
from dynamic_asr_eval_tpu.evals.common import (
    build_engine,
    decode_output,
    evaluate_records,
    load_model_and_tokenizer,
    save_result_pickle,
)
from dynamic_asr_eval_tpu.ops.chunk import chunk_starts_and_lengths
from dynamic_asr_eval_tpu.text import normalize
from dynamic_asr_eval_tpu.tta import DynamicEvalEngine


def loo_eval(engine, eval_engine, variables, spec, args, ds: int, vocab_plus: int):
    spec = np.asarray(spec)
    if spec.ndim == 3:
        spec = spec[0]
    spec_n = spec.shape[-1]
    starts, lens = chunk_starts_and_lengths(spec_n, args.loo_seq_len, args.loo_overlap)
    n_chunks = len(starts)

    def windowed(vars_, sub):
        return eval_engine(vars_, sub, args.seq_len, args.overlap)

    if n_chunks <= 1:
        out = windowed(variables, spec)
        return out.numpy_logits(), {"n_chunks": n_chunks, "mode": "fallback_windowed_eval"}

    def disjoint(i, j):
        return starts[j] >= starts[i] + lens[i] or starts[i] >= starts[j] + lens[j]

    valid = {i: [j for j in range(n_chunks) if disjoint(i, j)] for i in range(n_chunks)}
    pairs = sum(len(v) for v in valid.values())
    if pairs == 0:
        out = windowed(variables, spec)
        return out.numpy_logits(), {"n_chunks": n_chunks, "mode": "fallback_no_disjoint_pairs"}

    usable = [i for i in range(n_chunks) if valid[i]]
    print(f"  {n_chunks} LOO chunks -> {len(usable)} adaptations + {pairs} "
          f"windowed inferences (audio-disjoint LOO)")

    total = spec_n // ds + args.loo_seq_len
    acc = np.zeros((total, vocab_plus), np.float64)
    counts = np.zeros((total,), np.float64)

    for i in usable:
        sub_i = spec[:, starts[i] : starts[i] + lens[i]]
        adapted = engine(variables, sub_i, args.seq_len, args.overlap, return_params=True).params
        adapted_vars = dict(variables)
        adapted_vars["params"] = adapted
        for j in valid[i]:
            sub_j = spec[:, starts[j] : starts[j] + lens[j]]
            lp = windowed(adapted_vars, sub_j).numpy_logits()
            pos = starts[j] // ds
            acc[pos : pos + lp.shape[0]] += np.exp(lp)
            counts[pos : pos + lp.shape[0]] += 1

    nz = counts > 0
    idx = np.flatnonzero(nz)
    if idx.size == 0:
        raise RuntimeError("LOO stitching produced no coverage at any position.")
    span = idx[-1] - idx[0] + 1
    if idx.size != span:
        print(f"  WARNING: audio-disjoint LOO stitching has {span - idx.size} "
              f"uncovered position(s) inside covered span [{idx[0]}, {idx[-1]}]; "
              "uncovered positions are dropped before decoding.")
    logits = np.log(np.maximum(acc[nz] / counts[nz, None], 1e-12)).astype(np.float32)
    return logits, {"n_chunks": n_chunks, "mode": "loo"}


def main(args) -> float:
    model, variables, tokenizer, cfg = load_model_and_tokenizer(args)
    engine = build_engine(args, model, cfg)
    eval_cfg = dataclasses.replace(engine.config, epochs=0, online=False, shuffle=False)
    eval_engine = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor, eval_cfg)
    records = get_dataset(args.dataset, args.split)
    verbose = not getattr(args, "quiet", False)

    from dynamic_asr_eval_tpu.ops.ctc import greedy_decode

    def run_one(rec):
        spec, gold = rec["process_fn"](rec)
        logits, meta = loo_eval(
            engine, eval_engine, variables, spec, args,
            cfg.subsampling_factor, cfg.n_classes,
        )
        text = greedy_decode(logits, tokenizer, cfg.blank_id)
        return normalize(text), gold

    wer, detail = evaluate_records(records, run_one, verbose=verbose)
    print(f"WER: {wer}")
    if getattr(args, "save_path", ""):
        save_result_pickle(args.save_path, detail, args, 0, 1)
    return wer


def cli(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-d", "--dataset", type=str, default="synthetic")
    parser.add_argument("--loo_seq_len", type=int, default=65536)
    parser.add_argument("--loo_overlap", type=int, default=57344)
    parser.add_argument("-s", "--save_path", type=str, default="")
    parser.add_argument("--tokenizer", type=str, default="")
    parser.add_argument("--quiet", action="store_true")
    args = apply_args(parser, argv)
    return main(args)


if __name__ == "__main__":
    cli()
