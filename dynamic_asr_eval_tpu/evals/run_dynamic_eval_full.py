"""Per-recording dynamic evaluation with engine dispatch.

Capability parity with ``lcasr/run_dynamic_eval_full.py:31-149``: same shape
as the base driver plus ``--consistency`` dispatch to the per-chunk
parameter-collection engine (``:67-72``) and ``--awmc`` for the anchor/leader
engine.  Like the reference (``:56-65,94-104``), ``-lm`` enables the LM
shallow-fusion final beam decode (and, for the NSTI engine, LM-fused TTA
pseudo-labels via ``lm_tta_beams``); ``--decode_batch`` batches final decodes
across recordings like the base driver.
"""

from __future__ import annotations

import argparse

from dynamic_asr_eval_tpu.config import TTAConfig, apply_args
from dynamic_asr_eval_tpu.data import get_dataset
from dynamic_asr_eval_tpu.evals.common import (
    append_log,
    decode_output,
    evaluate_records,
    evaluate_records_grouped,
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

    beam_search_fn, lm_adapter, batched_decode_fn = None, None, None
    decode_batch = int(getattr(args, "decode_batch", 1) or 1)
    engine_kwargs = {}
    if getattr(args, "language_model", ""):
        from dynamic_asr_eval_tpu.lm.loader import (
            load_beamsearch,
            load_beamsearch_batched,
            load_lm_adapter,
        )

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
            batched_decode_fn = load_beamsearch_batched(
                args.language_model, tokenizer, adapter=lm_adapter,
                pad_streams=decode_batch, **lm_kwargs)
        if engine_cls is DynamicEvalEngine and tta.lm_tta_beams > 0:
            # LM-fused pseudo-labels are NSTI-only, matching the reference
            # (AWMC/consistency always decode teachers greedily)
            engine_kwargs = {"lm_adapter": lm_adapter,
                             "lm_beam_kwargs": lm_kwargs}

    if engine_cls is DynamicEvalEngine:
        # tokenizer rides along for the opt-in reference-exact pseudo-label
        # round-trip (lcasr/lib.py:558-571) and the print_pseudo_labels
        # debug affordance
        engine_kwargs["tokenizer"] = tokenizer
    import jax.numpy as jnp

    if cfg.compute_dtype == jnp.bfloat16 and not bool(
            vars(args).get("f32_transfer", False)):
        # bf16 spec upload for bf16-compute models (see common.build_engine)
        engine_kwargs["transfer_dtype"] = jnp.bfloat16

    if getattr(args, "dp_records", False):
        if engine_cls is not DynamicEvalEngine:
            raise ValueError("--dp_records supports only the NSTI engine "
                             "(drop --awmc/--consistency)")
        from dynamic_asr_eval_tpu.parallel import make_mesh

        engine_kwargs["mesh"] = make_mesh(tp=int(getattr(args, "tp", 1) or 1))

    engine = engine_cls(model, cfg.blank_id, cfg.subsampling_factor, tta,
                        **engine_kwargs)
    # with --tp > 1 the params must actually be sharded over the mesh tp axis
    # (otherwise the dp axis silently shrinks N-fold with the params still
    # fully replicated — see common.maybe_shard_variables)
    from dynamic_asr_eval_tpu.evals.common import maybe_shard_variables

    variables = maybe_shard_variables(engine, variables)
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

        def adapt_one(rec):
            spec, gold = rec["process_fn"](rec)
            # per-record key split, like evals/run.py — the reference's
            # global RNG advances across recordings (lcasr/run.py:76)
            rec_rng = jax.random.fold_in(repeat_rng, next(rec_counter))
            out = engine(variables, spec, args.seq_len, args.overlap,
                         rng=rec_rng, shuffle_rng=repeat_shuffle)
            return out, gold

        def run_one(rec):
            out, gold = adapt_one(rec)
            hyp = normalize(decode_output(
                out, tokenizer, beam_search_fn=beam_search_fn,
                beams=getattr(args, "beams", 1)))
            return hyp, gold

        def run_group(group):
            outs = [adapt_one(rec) for rec in group]
            hyps = batched_decode_fn(
                [o.numpy_logits() for o, _ in outs],
                beam_width=getattr(args, "beams", 1))
            return [(normalize(h), gold) for h, (_, gold) in zip(hyps, outs)]

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
    parser.add_argument("--dp_records", action="store_true",
                        help="records-level data parallelism (NSTI only): "
                             "one recording(-group) per dp slice; corpus WER "
                             "reduced on the mesh via psum")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree of the mesh (with --dp_records)")
    parser.add_argument("--decode_batch", type=int, default=1,
                        help="batch final LM beam decodes across this many "
                             "recordings per device program")
    parser.add_argument("--tokenizer", type=str, default="")
    parser.add_argument("--quiet", action="store_true")
    args = apply_args(parser, argv)
    return main(args)


if __name__ == "__main__":
    cli()
