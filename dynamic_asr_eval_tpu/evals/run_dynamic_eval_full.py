"""Per-recording dynamic evaluation with engine dispatch.

Capability parity with ``lcasr/run_dynamic_eval_full.py:31-149``: same shape
as the base driver plus ``--consistency`` dispatch to the per-chunk
parameter-collection engine (``:67-72``) and ``--awmc`` for the anchor/leader
engine.
"""

from __future__ import annotations

import argparse

from dynamic_asr_eval_tpu.config import TTAConfig, apply_args
from dynamic_asr_eval_tpu.data import get_dataset
from dynamic_asr_eval_tpu.evals.common import (
    append_log,
    decode_output,
    evaluate_records,
    load_model_and_tokenizer,
    save_result_pickle,
)
from dynamic_asr_eval_tpu.text import normalize
from dynamic_asr_eval_tpu.tta import AWMCEngine, ConsistencyEngine, DynamicEvalEngine


def main(args) -> float:
    model, variables, tokenizer, cfg = load_model_and_tokenizer(args)
    tta = TTAConfig.from_args(args)
    if getattr(args, "consistency", False):
        engine_cls = ConsistencyEngine
    elif getattr(args, "awmc", False):
        engine_cls = AWMCEngine
    else:
        engine_cls = DynamicEvalEngine
    engine = engine_cls(model, cfg.blank_id, cfg.subsampling_factor, tta)
    records = get_dataset(args.dataset, args.split)

    wers = []
    repeats = getattr(args, "repeats", 1)
    seed = getattr(args, "seed", None)
    base_seed = 0 if seed is None else int(seed)
    for repeat in range(repeats):
        # distinct seed per repeat, like evals/run.py — repeats exist to
        # average stochastic-TTA noise (lcasr/run.py:76,148)
        import jax
        import numpy as np

        repeat_rng = jax.random.PRNGKey(base_seed * 1000 + repeat)
        repeat_shuffle = np.random.default_rng(base_seed * 1000 + repeat)
        rec_counter = iter(range(len(records)))

        def run_one(rec):
            spec, gold = rec["process_fn"](rec)
            # per-record key split, like evals/run.py — the reference's
            # global RNG advances across recordings (lcasr/run.py:76)
            rec_rng = jax.random.fold_in(repeat_rng, next(rec_counter))
            out = engine(variables, spec, args.seq_len, args.overlap,
                         rng=rec_rng, shuffle_rng=repeat_shuffle)
            return normalize(decode_output(out, tokenizer, beams=getattr(args, "beams", 1))), gold

        wer, detail = evaluate_records(records, run_one, verbose=not getattr(args, "quiet", False))
        print(f"WER: {wer}")
        append_log(getattr(args, "log", ""),
                   f"{engine_cls.__name__}\t{args.dataset}\tWER: {wer}")
        if getattr(args, "save_path", ""):
            save_result_pickle(args.save_path, detail, args, repeat, repeats)
        wers.append(wer)
    mean_wer = sum(wers) / len(wers)
    print(f"Average WER: {mean_wer}")
    return mean_wer


def cli(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-d", "--dataset", type=str, default="synthetic")
    parser.add_argument("-r", "--repeats", type=int, default=1)
    parser.add_argument("-s", "--save_path", type=str, default="")
    parser.add_argument("--awmc", action="store_true")
    parser.add_argument("--consistency", action="store_true")
    parser.add_argument("--tokenizer", type=str, default="")
    parser.add_argument("--quiet", action="store_true")
    args = apply_args(parser, argv)
    return main(args)


if __name__ == "__main__":
    cli()
