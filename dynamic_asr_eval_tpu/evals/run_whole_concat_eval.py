"""Whole-concat adaptation driver (upper bound).

Capability parity with ``lcasr/run_whole_concat_eval.py:43-192``: concatenate
the spectrograms of the ENTIRE test set, adapt for N epochs on the
concatenation (adapt-only pass, reusing the half-concat machinery, ``:19``),
then re-evaluate every recording with the adapted weights.
"""

from __future__ import annotations

import argparse
import dataclasses
import pickle

from dynamic_asr_eval_tpu.config import apply_args
from dynamic_asr_eval_tpu.data import get_dataset
from dynamic_asr_eval_tpu.evals.common import (
    build_engine,
    decode_output,
    evaluate_records,
    load_model_and_tokenizer,
)
from dynamic_asr_eval_tpu.evals.run_half_concat_eval import adapt_on_concat
from dynamic_asr_eval_tpu.text import normalize
from dynamic_asr_eval_tpu.tta import DynamicEvalEngine


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

    adapted = adapt_on_concat(engine, variables, records, args.seq_len, adapt_overlap)
    adapted_vars = dict(variables)
    adapted_vars["params"] = adapted

    def run_one(rec):
        spec, gold = rec["process_fn"](rec)
        out = eval_engine(adapted_vars, spec, args.seq_len, args.overlap)
        return normalize(decode_output(out, tokenizer)), gold

    wer, detail = evaluate_records(records, run_one, verbose=verbose)
    print(f"whole-concat WER: {wer}")
    if getattr(args, "save_path", ""):
        detail["args_dict"] = vars(args)
        with open(args.save_path, "wb") as f:
            pickle.dump(detail, f)
    return wer


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
