"""Encoder-decoder RL-TTA evaluation driver.

Capability parity with ``lcasr/enc_dec_dynamic_eval_test.py:34-149``:
per-recording TTA with ``--training_mode {grpo, maxrl, teacher_ce}`` plus
the full teacher-filter flag family (``enc_dec_teacher_filters.py:7-116``);
``--breaks`` single-recording debug mode (``:136``).
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from dynamic_asr_eval_tpu.config import TTAConfig, apply_args
from dynamic_asr_eval_tpu.data import get_dataset
from dynamic_asr_eval_tpu.evals.common import append_log, evaluate_records, save_result_pickle
from dynamic_asr_eval_tpu.evals.enc_dec_inference_test import load_encdec_from_args
from dynamic_asr_eval_tpu.text import load_tokenizer, normalize
from dynamic_asr_eval_tpu.tta.encdec_rl import EncDecDynamicEvalEngine
from dynamic_asr_eval_tpu.tta.filters import TeacherFilterConfig


def add_teacher_filter_args(parser: argparse.ArgumentParser):
    """Reference flag family (``enc_dec_teacher_filters.py:7-116``)."""
    parser.add_argument("--teacher_filter_max_length", action="store_true")
    parser.add_argument("--teacher_min_frames_per_token", type=int, default=8)
    parser.add_argument("--teacher_filter_max_consecutive_token_repeat", action="store_true")
    parser.add_argument("--teacher_max_consecutive_token_repeat", type=int, default=3)
    parser.add_argument("--teacher_filter_repeated_token_ngrams", action="store_true")
    parser.add_argument("--teacher_repeated_token_ngram_sizes", type=int, nargs="+", default=[2, 3])
    parser.add_argument("--teacher_repeated_token_ngram_min_repeats", type=int, default=2)
    parser.add_argument("--teacher_filter_decode_agreement", action="store_true")
    parser.add_argument("--teacher_decode_agreement_temperature", type=float, default=0.7)
    parser.add_argument("--teacher_decode_agreement_min_similarity", type=float, default=0.65)
    parser.add_argument("--teacher_filter_low_confidence", action="store_true")
    parser.add_argument("--teacher_min_mean_max_prob", type=float, default=0.35)
    parser.add_argument("--teacher_max_mean_entropy", type=float, default=2.5)
    parser.add_argument("--teacher_filter_repeated_words", action="store_true")
    parser.add_argument("--teacher_max_consecutive_word_repeat", type=int, default=3)
    parser.add_argument("--teacher_filter_ctc_agreement", action="store_true")
    parser.add_argument("--teacher_ctc_agreement_min_similarity", type=float, default=0.5)
    return parser


def main(args) -> float:
    tokenizer = load_tokenizer(getattr(args, "tokenizer", None) or None)
    model, variables, cfg = load_encdec_from_args(args, tokenizer)
    records = get_dataset(args.dataset, args.split)
    if getattr(args, "breaks", False):
        records = records[:1]

    tta = TTAConfig.from_args(args)
    engine = EncDecDynamicEvalEngine(
        model, variables, cfg, tta,
        filter_config=TeacherFilterConfig.from_args(args),
        training_mode=getattr(args, "training_mode", "grpo"),
    )

    def run_one(rec):
        spec, gold = rec["process_fn"](rec)
        transcript, _, _ = engine(variables, spec, args.seq_len, tokenizer)
        return normalize(transcript), gold

    wer, detail = evaluate_records(records, run_one, verbose=not getattr(args, "quiet", False))
    print(f"WER: {wer}")
    append_log(getattr(args, "log", ""), f"enc_dec_tta\t{args.training_mode}\tWER: {wer}")
    if getattr(args, "save_path", ""):
        save_result_pickle(args.save_path, detail, args, 0, 1)
    return wer


def cli(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-d", "--dataset", type=str, default="synthetic")
    parser.add_argument("--training_mode", type=str, default="grpo",
                        choices=["grpo", "maxrl", "teacher_ce"])
    parser.add_argument("--breaks", action="store_true", help="single-recording debug mode")
    parser.add_argument("-s", "--save_path", type=str, default="")
    parser.add_argument("--tokenizer", type=str, default="")
    parser.add_argument("--quiet", action="store_true")
    add_teacher_filter_args(parser)
    args = apply_args(parser, argv)
    return main(args)


if __name__ == "__main__":
    cli()
