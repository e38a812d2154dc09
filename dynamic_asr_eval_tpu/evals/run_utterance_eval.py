"""Utterance-level TTA evaluation driver.

Capability parity with the lcasr_nemo backend's per-utterance evaluation
(``lcasr_nemo/lib.py:81-172`` driven by its dataset ``run.py``s): recordings
are segmented into utterances (TEDLIUM: STM timings via
``data.adapters.fetch_utterances``; others/synthetic: fixed-length segments),
the utterance TTA engine adapts over them with gradient accumulation, and the
adapted per-utterance outputs are greedy-decoded and concatenated for WER.
"""

from __future__ import annotations

import argparse

import numpy as np

from dynamic_asr_eval_tpu.config import TTAConfig, apply_args
from dynamic_asr_eval_tpu.data import get_dataset
from dynamic_asr_eval_tpu.evals.common import (
    append_log,
    evaluate_records,
    load_model_and_tokenizer,
    save_result_pickle,
)
from dynamic_asr_eval_tpu.ops.ctc import greedy_decode
from dynamic_asr_eval_tpu.text import normalize
from dynamic_asr_eval_tpu.tta.utterance import UtteranceTTAEngine


def segment_spec(spec: np.ndarray, segment_frames: int):
    spec = np.asarray(spec)
    if spec.ndim == 3:
        spec = spec[0]
    return [
        {"spectrogram": spec[:, i : i + segment_frames]}
        for i in range(0, spec.shape[1], segment_frames)
        if spec[:, i : i + segment_frames].shape[1] > 8
    ]


def main(args) -> float:
    model, variables, tokenizer, cfg = load_model_and_tokenizer(args)
    tta = TTAConfig.from_args(args)
    engine = UtteranceTTAEngine(
        model, cfg.blank_id, cfg.subsampling_factor, tta,
        accumulate_gradients=int(vars(args).get("accumulate_gradients", 1)),
        prob_collection=str(vars(args).get("prob_collection", "online")),
    )
    records = get_dataset(args.dataset, args.split)
    seg_frames = int(vars(args).get("segment_frames", 512))

    def run_one(rec):
        spec, gold = rec["process_fn"](rec)
        if args.dataset == "tedlium" and isinstance(rec.get("text"), str):
            # true utterance boundaries from the STM
            from dynamic_asr_eval_tpu.data.adapters import fetch_utterances

            utts, _ = fetch_utterances(rec["text"], np.asarray(spec))
            utterances = [
                {"spectrogram": u["spectrogram"]}
                for u in utts if u["spectrogram"].shape[-1] > 8
            ]
        else:
            utterances = segment_spec(spec, seg_frames)
        outs, _, _ = engine(variables, utterances)
        texts = [greedy_decode(o, tokenizer, cfg.blank_id) for o in outs]
        return normalize(" ".join(texts)), gold

    wer, detail = evaluate_records(records, run_one, verbose=not getattr(args, "quiet", False))
    print(f"WER: {wer}")
    append_log(getattr(args, "log", ""), f"utterance_eval\t{args.dataset}\tWER: {wer}")
    if getattr(args, "save_path", ""):
        save_result_pickle(args.save_path, detail, args, 0, 1)
    return wer


def cli(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-d", "--dataset", type=str, default="synthetic")
    parser.add_argument("--segment_frames", type=int, default=512)
    parser.add_argument("--accumulate_gradients", type=int, default=1)
    parser.add_argument("--prob_collection", choices=["online", "final"],
                        default="online",
                        help="'online' = reference semantics (per-utterance "
                             "probs from the visit-time weights, mid-loop); "
                             "'final' = re-infer with fully adapted weights")
    parser.add_argument("-s", "--save_path", type=str, default="")
    parser.add_argument("--tokenizer", type=str, default="")
    parser.add_argument("--quiet", action="store_true")
    args = apply_args(parser, argv)
    return main(args)


if __name__ == "__main__":
    cli()
