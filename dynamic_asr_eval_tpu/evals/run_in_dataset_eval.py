"""In-dataset transfer driver: adapt on record 0, evaluate records 1..N with
the adapted (frozen) weights.

Capability parity with ``lcasr/run_in_dataset_eval.py:34-166``: the engine is
called with ``return_params=True`` on the first record, the adapted params are
installed, and the remaining records run through the *same* engine with
``epochs=0`` (pure windowed inference — the reference's clone-args trick at
``:96-99``).  ``--adapt_overlap`` decouples the adaptation overlap from the
evaluation overlap (``-ao`` in the reference).
"""

from __future__ import annotations

import argparse
import dataclasses

from dynamic_asr_eval_tpu.config import TTAConfig, apply_args
from dynamic_asr_eval_tpu.data import get_dataset
from dynamic_asr_eval_tpu.evals.common import (
    append_log,
    build_engine,
    decode_output,
    evaluate_records,
    load_model_and_tokenizer,
    save_result_pickle,
)
from dynamic_asr_eval_tpu.text import normalize
from dynamic_asr_eval_tpu.tta import DynamicEvalEngine


def main(args) -> float:
    model, variables, tokenizer, cfg = load_model_and_tokenizer(args)
    engine = build_engine(args, model, cfg)
    records = get_dataset(args.dataset, args.split)
    adapt_overlap = getattr(args, "adapt_overlap", -1)
    if adapt_overlap == -1:
        adapt_overlap = args.overlap

    # adapt on the first record
    spec0, _ = records[0]["process_fn"](records[0])
    adapted = engine(
        variables, spec0, args.seq_len, adapt_overlap, return_params=True
    ).params
    adapted_vars = dict(variables)
    adapted_vars["params"] = adapted

    # epochs=0 evaluation engine over the rest
    eval_cfg = dataclasses.replace(engine.config, epochs=0, online=False, shuffle=False)
    eval_engine = DynamicEvalEngine(
        model, cfg.blank_id, cfg.subsampling_factor, eval_cfg
    )

    def run_one(rec):
        spec, gold = rec["process_fn"](rec)
        out = eval_engine(adapted_vars, spec, args.seq_len, args.overlap)
        return normalize(decode_output(out, tokenizer)), gold

    wer, detail = evaluate_records(records[1:], run_one, verbose=not getattr(args, "quiet", False))
    print(f"WER: {wer}")
    append_log(getattr(args, "log", ""), f"in_dataset\t{args.dataset}\tWER: {wer}")
    if getattr(args, "save_path", ""):
        save_result_pickle(args.save_path, detail, args, 0, 1)
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
