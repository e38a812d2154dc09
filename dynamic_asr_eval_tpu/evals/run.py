"""Per-recording dynamic evaluation driver.

Capability parity with ``lcasr/run.py`` and ``run_dynamic_eval_full.py``:
TTA each recording independently (restore between recordings is implicit —
parameters are immutable), repeats for stochastic-noise control, greedy or LM
beam final decode, per-recording wall time, WER + log + result pickle.

CLI: ``python -m dynamic_asr_eval_tpu.evals.run -d synthetic -kwargs
optim_lr=9e-5 epochs=1 online=true``
"""

from __future__ import annotations

import argparse

import numpy as np

from dynamic_asr_eval_tpu.config import apply_args
from dynamic_asr_eval_tpu.data import get_dataset
from dynamic_asr_eval_tpu.evals.common import (
    append_log,
    build_engine,
    decode_output,
    evaluate_records,
    evaluate_records_grouped,
    load_model_and_tokenizer,
    maybe_shard_variables,
    save_result_pickle,
)
from dynamic_asr_eval_tpu.text import normalize


def main(args) -> float:
    engine_kind = "awmc" if getattr(args, "awmc", False) else "dynamic_eval"
    if engine_kind == "awmc" and getattr(args, "dp_records", False):
        # AWMCEngine inherits DynamicEvalEngine but does not override
        # batched(): --dp_records would silently run NSTI adaptation on the
        # record groups instead of the anchor/leader scheme.  Fail loudly.
        raise SystemExit(
            "--dp_records is not implemented for the AWMC engine "
            "(records-DP batching currently covers the NSTI engine only)")
    model, variables, tokenizer, cfg = load_model_and_tokenizer(args)
    records = get_dataset(args.dataset, args.split)

    beam_search_fn, lm_adapter, batched_decode_fn = None, None, None
    decode_batch = int(getattr(args, "decode_batch", 1) or 1)
    if getattr(args, "language_model", ""):
        from dynamic_asr_eval_tpu.lm.loader import (
            load_beamsearch,
            load_beamsearch_batched,
            load_lm_adapter,
        )

        # one adapter serves both the final stitched decode and (when
        # lm_tta_beams > 0) the in-TTA pseudo-label beam (lcasr/lib.py:515)
        lm_adapter = load_lm_adapter(args.language_model, tokenizer)
        lm_kwargs = dict(
            alpha=vars(args).get("lm_alpha", 0.45),
            beta=vars(args).get("lm_beta", 1.53),
            prune_less_than_val=vars(args).get("lm_prune_less_than_val", 3.17),
            top_am_threshold=vars(args).get("lm_top_am_threshold", -6.0),
        )
        beam_search_fn = load_beamsearch(
            args.language_model, tokenizer, adapter=lm_adapter, **lm_kwargs)
        if decode_batch > 1:
            # batch final LM decodes across recordings: one device program
            # decodes `decode_batch` stitched posterior streams (exact per
            # stream to bf16 noise; NOTE at stitched-scale emission density
            # the single-stream path measures FASTER even in aggregate —
            # PERF.md round-4 item 3 — keep 1 unless streams are sparse)
            batched_decode_fn = load_beamsearch_batched(
                args.language_model, tokenizer, adapter=lm_adapter,
                pad_streams=decode_batch, **lm_kwargs)

    engine = build_engine(args, model, cfg, engine_kind, lm_adapter=lm_adapter,
                          tokenizer=tokenizer)
    variables = maybe_shard_variables(engine, variables)

    wers = []
    repeats = getattr(args, "repeats", 1)
    seed = getattr(args, "seed", None)
    base_seed = 0 if seed is None else int(seed)
    for repeat in range(repeats):
        # distinct seed per repeat — repeats exist to average stochastic-TTA
        # noise (lcasr/run.py:76,148); identical seeds would make -r N run N
        # bit-identical evaluations
        import jax

        repeat_rng = jax.random.PRNGKey(base_seed * 1000 + repeat)
        repeat_shuffle = np.random.default_rng(base_seed * 1000 + repeat)
        rec_counter = iter(range(len(records)))

        def adapt_one(rec):
            spec, gold = rec["process_fn"](rec)
            # fold the record index into the key: the reference's global RNG
            # advances across recordings (lcasr/run.py:76) — a shared per-
            # repeat key would give every recording identical augmentation
            # noise sequences
            rec_rng = jax.random.fold_in(repeat_rng, next(rec_counter))
            out = engine(
                variables, spec, args.seq_len, args.overlap,
                rng=rec_rng, shuffle_rng=repeat_shuffle,
            )
            return out, gold

        def run_one(rec):
            out, gold = adapt_one(rec)
            hyp = normalize(decode_output(
                out, tokenizer, beam_search_fn=beam_search_fn,
                beams=getattr(args, "beams", 1),
            ))
            return hyp, gold

        def run_group(group):
            # adapt serially (the engine is per-recording online SGD), then
            # decode the group's stitched posteriors in one device program
            outs = [adapt_one(rec) for rec in group]
            hyps = batched_decode_fn(
                [o.numpy_logits() for o, _ in outs],
                beam_width=getattr(args, "beams", 1),
            )
            return [(normalize(h), gold) for h, (_, gold) in zip(hyps, outs)]

        import contextlib

        # -profile DIR writes a jax.profiler (TensorBoard/XProf) trace of the
        # whole repeat — the TPU-native deepening of the reference's
        # `print_runtimes` wall-clock switch (lcasr/lib.py:520-522): per-op
        # device timelines instead of three timestamps.
        profile_dir = getattr(args, "profile", "")
        trace_ctx = (
            jax.profiler.trace(profile_dir)
            if profile_dir and repeat == 0 else contextlib.nullcontext()
        )
        with trace_ctx:
            verbose = not getattr(args, "quiet", False)
            if getattr(args, "dp_records", False):
                from dynamic_asr_eval_tpu.evals.common import run_records_dp

                wer, detail = run_records_dp(
                    engine, variables, records, tokenizer, args,
                    repeat_rng, repeat_shuffle, rec_counter,
                    beam_search_fn=beam_search_fn, verbose=verbose)
            elif batched_decode_fn is not None and getattr(args, "beams", 1) > 1:
                wer, detail = evaluate_records_grouped(
                    records, run_group, decode_batch, verbose=verbose)
            else:
                wer, detail = evaluate_records(records, run_one, verbose=verbose)
        print(f"WER: {wer}")
        append_log(
            getattr(args, "log", ""),
            f"{getattr(args, 'checkpoint', '')}\t overlap: {args.overlap}\t "
            f"seq_len: {args.seq_len}\t WER: {wer}",
        )
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
    parser.add_argument("--awmc", action="store_true", help="use the AWMC engine")
    parser.add_argument("--dp", action="store_true",
                        help="data-parallel windowed inference over all devices")
    parser.add_argument("--dp_records", action="store_true",
                        help="records-level data parallelism: adapt one "
                             "recording(-group) per dp slice simultaneously; "
                             "corpus WER reduced on the mesh via psum")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree of the device mesh (with --dp)")
    parser.add_argument("--decode_batch", type=int, default=1,
                        help="batch final LM beam decodes across this many "
                             "recordings per device program (exact per "
                             "recording; wins only for sparse streams — "
                             "PERF.md round-4 item 3)")
    parser.add_argument("--tokenizer", type=str, default="")
    parser.add_argument("--profile", type=str, default="",
                        help="write a jax.profiler trace of repeat 0 to this dir")
    parser.add_argument("--quiet", action="store_true")
    args = apply_args(parser, argv)
    return main(args)


if __name__ == "__main__":
    cli()
