"""Half-concat adaptation driver.

Capability parity with ``lcasr/run_half_concat_eval.py:43-353``: split the
dataset's recordings into two halves, concatenate one half's spectrograms on
the time axis, run an adapt-ONLY pass on the concatenation (no stitched-logit
allocation, ``adapt_on_concat_only`` ``:64-160``), then evaluate the held-out
half with the adapted weights; repeat with halves swapped; also report the
no-adapt baseline.  ``--adapt_overlap`` decouples adapt vs eval overlap.
"""

from __future__ import annotations

import argparse
import dataclasses
import pickle

import numpy as np

from dynamic_asr_eval_tpu.config import apply_args
from dynamic_asr_eval_tpu.data import get_dataset
from dynamic_asr_eval_tpu.evals.common import (
    build_engine,
    decode_output,
    evaluate_records,
    load_model_and_tokenizer,
)
from dynamic_asr_eval_tpu.text import normalize
from dynamic_asr_eval_tpu.tta import DynamicEvalEngine


def split_records(records, fold: int):
    """Deterministic half split (``run_half_concat_eval.py:43-55``)."""
    half = len(records) // 2
    if fold == 0:
        return records[:half], records[half:]
    return records[half:], records[:half]


def concatenate_specs(specs):
    """Time-axis concatenation (``run_half_concat_eval.py:58-61``)."""
    specs = [np.asarray(s)[0] if np.asarray(s).ndim == 3 else np.asarray(s) for s in specs]
    return np.concatenate(specs, axis=-1)


def adapt_on_concat(engine, variables, records, seq_len, adapt_overlap):
    specs = []
    for rec in records:
        spec, _ = rec["process_fn"](rec)
        specs.append(spec)
    concat = concatenate_specs(specs)
    out = engine(
        variables, concat, seq_len, adapt_overlap,
        return_params=True, adapt_only=True,
    )
    return out.params


def main(args):
    model, variables, tokenizer, cfg = load_model_and_tokenizer(args)
    engine = build_engine(args, model, cfg)
    eval_cfg = dataclasses.replace(engine.config, epochs=0, online=False, shuffle=False)
    eval_engine = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor, eval_cfg)
    records = get_dataset(args.dataset, args.split)
    adapt_overlap = getattr(args, "adapt_overlap", -1)
    if adapt_overlap == -1:
        adapt_overlap = args.overlap
    verbose = not getattr(args, "quiet", False)

    def eval_with(vars_, recs):
        def run_one(rec):
            spec, gold = rec["process_fn"](rec)
            out = eval_engine(vars_, spec, args.seq_len, args.overlap)
            return normalize(decode_output(out, tokenizer)), gold

        return evaluate_records(recs, run_one, verbose=verbose)

    results = {"folds": [], "baseline": None}
    base_wer, base_detail = eval_with(variables, records)
    results["baseline"] = base_detail
    print(f"baseline WER: {base_wer}")

    for fold in (0, 1):
        adapt_half, eval_half = split_records(records, fold)
        adapted = adapt_on_concat(engine, variables, adapt_half, args.seq_len, adapt_overlap)
        adapted_vars = dict(variables)
        adapted_vars["params"] = adapted
        wer, detail = eval_with(adapted_vars, eval_half)
        results["folds"].append({"fold": fold, "wer": wer, "detail": detail})
        print(f"fold {fold}: adapted-on {len(adapt_half)} recs, eval WER {wer}")

    mean_wer = sum(f["wer"] for f in results["folds"]) / 2
    print(f"mean half-concat WER: {mean_wer} (baseline {base_wer})")
    if getattr(args, "save_path", ""):
        results["args_dict"] = vars(args)
        with open(args.save_path, "wb") as f:
            pickle.dump(results, f)
    return mean_wer


def cli(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-d", "--dataset", type=str, default="synthetic")
    parser.add_argument("-s", "--save_path", type=str, default="")
    parser.add_argument("-ao", "--adapt_overlap", type=int, default=-1)
    parser.add_argument("--tokenizer", type=str, default="")
    parser.add_argument("--quiet", action="store_true")
    args = apply_args(parser, argv)
    return main(args)


if __name__ == "__main__":
    cli()
