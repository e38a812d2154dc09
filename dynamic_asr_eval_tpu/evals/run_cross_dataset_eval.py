"""Cross-dataset transfer driver.

Capability parity with ``lcasr/run_cross_dataset_eval.py:32-218``: compute
A/B no-adapt baselines, then for each recording A[i]: adapt on it, evaluate
the adapted weights on all of B (``a_to_b``) and on A∖{i} (``a_to_a_loo``),
then restore (implicit — params are immutable pytrees).  Emits per-source
WERs and the aggregate pickle.
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
from dynamic_asr_eval_tpu.text import normalize
from dynamic_asr_eval_tpu.tta import DynamicEvalEngine


def main(args):
    model, variables, tokenizer, cfg = load_model_and_tokenizer(args)
    engine = build_engine(args, model, cfg)
    eval_cfg = dataclasses.replace(engine.config, epochs=0, online=False, shuffle=False)
    eval_engine = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor, eval_cfg)

    data_a = get_dataset(args.dataset_a, args.split)
    data_b = get_dataset(args.dataset_b, args.split)
    verbose = not getattr(args, "quiet", False)

    def eval_with(vars_, records):
        def run_one(rec):
            spec, gold = rec["process_fn"](rec)
            out = eval_engine(vars_, spec, args.seq_len, args.overlap)
            return normalize(decode_output(out, tokenizer)), gold

        return evaluate_records(records, run_one, verbose=verbose)

    results = {"a_to_b": [], "a_to_a_loo": [], "baselines": {}}
    wer_a, _ = eval_with(variables, data_a)
    wer_b, _ = eval_with(variables, data_b)
    results["baselines"] = {"a": wer_a, "b": wer_b}
    print(f"baseline A WER: {wer_a}  baseline B WER: {wer_b}")

    for i, rec in enumerate(data_a):
        spec, _ = rec["process_fn"](rec)
        adapted = engine(variables, spec, args.seq_len, args.overlap, return_params=True).params
        adapted_vars = dict(variables)
        adapted_vars["params"] = adapted

        wer_ab, _ = eval_with(adapted_vars, data_b)
        loo = [r for j, r in enumerate(data_a) if j != i]
        wer_loo, _ = eval_with(adapted_vars, loo) if loo else (float("nan"), None)
        results["a_to_b"].append({"adapt_on": rec["id"], "wer": wer_ab})
        results["a_to_a_loo"].append({"adapt_on": rec["id"], "wer": wer_loo})
        print(f"[{i}] adapt {rec['id']}: a_to_b {wer_ab}  a_to_a_loo {wer_loo}")

    if getattr(args, "save_path", ""):
        results["args_dict"] = vars(args)
        with open(args.save_path, "wb") as f:
            pickle.dump(results, f)
    mean_ab = sum(r["wer"] for r in results["a_to_b"]) / max(len(results["a_to_b"]), 1)
    print(f"mean a_to_b WER: {mean_ab}")
    return results


def cli(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-da", "--dataset_a", type=str, default="synthetic")
    parser.add_argument("-db", "--dataset_b", type=str, default="synthetic")
    parser.add_argument("-s", "--save_path", type=str, default="")
    parser.add_argument("--tokenizer", type=str, default="")
    parser.add_argument("--quiet", action="store_true")
    args = apply_args(parser, argv)
    return main(args)


if __name__ == "__main__":
    cli()
