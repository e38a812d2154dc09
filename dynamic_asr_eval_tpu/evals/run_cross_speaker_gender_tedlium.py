"""Cross-gender transfer driver (TEDLIUM speaker manifest).

Capability parity with ``lcasr/run_cross_speaker_gender_tedlium.py:26-305``:
load a speaker manifest (``{"female": [{"talk_id": ...}], "male": [...]}``,
e.g. ``results/gender_eval_tedlium/speaker_manifest_15x15.json``), filter the
dataset to manifested talks, compute per-gender no-adapt baselines, then for
each speaker: adapt on their recording → evaluate same-gender leave-one-out
and all cross-gender recordings → restore (implicit).  Emits M→M, M→F, F→F,
F→M WER tables.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
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


def load_speaker_manifest(path: str):
    with open(path, "r") as f:
        manifest = json.load(f)
    gender = {}
    for row in manifest.get("female", []):
        gender[row["talk_id"]] = "F"
    for row in manifest.get("male", []):
        gender[row["talk_id"]] = "M"
    return manifest, gender


def main(args):
    model, variables, tokenizer, cfg = load_model_and_tokenizer(args)
    engine = build_engine(args, model, cfg)
    eval_cfg = dataclasses.replace(engine.config, epochs=0, online=False, shuffle=False)
    eval_engine = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor, eval_cfg)
    verbose = not getattr(args, "quiet", False)

    if getattr(args, "speaker_manifest", ""):
        manifest, gender_of = load_speaker_manifest(args.speaker_manifest)
        records = get_dataset(args.dataset, args.split)

        def base_id(rec):
            rid = os.path.basename(str(rec["id"]))
            return rid[:-len(".sph")] if rid.endswith(".sph") else rid

        records = [r for r in records if base_id(r) in gender_of]
        males = [r for r in records if gender_of[base_id(r)] == "M"]
        females = [r for r in records if gender_of[base_id(r)] == "F"]
    else:
        # no manifest (synthetic smoke): alternate records into two groups
        records = get_dataset(args.dataset, args.split)
        males = records[0::2]
        females = records[1::2]

    print(f"Male data: {len(males)}  Female data: {len(females)}")
    adapt_overlap = getattr(args, "adapt_overlap", -1)
    if adapt_overlap == -1:
        adapt_overlap = args.overlap

    def eval_with(vars_, recs):
        def run_one(rec):
            spec, gold = rec["process_fn"](rec)
            out = eval_engine(vars_, spec, args.seq_len, args.overlap)
            return normalize(decode_output(out, tokenizer)), gold

        return evaluate_records(recs, run_one, verbose=verbose)

    results = {"baselines": {}, "m_to_m": [], "m_to_f": [], "f_to_f": [], "f_to_m": []}
    wer_m, _ = eval_with(variables, males) if males else (float("nan"), None)
    wer_f, _ = eval_with(variables, females) if females else (float("nan"), None)
    results["baselines"] = {"male": wer_m, "female": wer_f}
    print(f"Male baseline WER: {wer_m}  Female baseline WER: {wer_f}")

    def transfer(adapt_set, same_key, cross_key, cross_set):
        for i, rec in enumerate(adapt_set):
            spec, _ = rec["process_fn"](rec)
            adapted = engine(
                variables, spec, args.seq_len, adapt_overlap, return_params=True
            ).params
            adapted_vars = dict(variables)
            adapted_vars["params"] = adapted
            same = [r for j, r in enumerate(adapt_set) if j != i]
            if same:
                wer, _ = eval_with(adapted_vars, same)
                results[same_key].append({"adapt_on": rec["id"], "wer": wer})
            if cross_set:
                wer, _ = eval_with(adapted_vars, cross_set)
                results[cross_key].append({"adapt_on": rec["id"], "wer": wer})

    transfer(males, "m_to_m", "m_to_f", females)
    transfer(females, "f_to_f", "f_to_m", males)

    for k in ("m_to_m", "m_to_f", "f_to_f", "f_to_m"):
        vals = [r["wer"] for r in results[k]]
        if vals:
            print(f"{k}: mean WER {sum(vals) / len(vals):.5f} over {len(vals)} speakers")

    if getattr(args, "save_path", ""):
        results["args_dict"] = vars(args)
        with open(args.save_path, "wb") as f:
            pickle.dump(results, f)
    return results


def cli(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-d", "--dataset", type=str, default="tedlium")
    parser.add_argument("--speaker_manifest", type=str, default="")
    parser.add_argument("-ao", "--adapt_overlap", type=int, default=-1)
    parser.add_argument("-s", "--save_path", type=str, default="")
    parser.add_argument("--tokenizer", type=str, default="")
    parser.add_argument("--quiet", action="store_true")
    args = apply_args(parser, argv)
    return main(args)


if __name__ == "__main__":
    cli()
