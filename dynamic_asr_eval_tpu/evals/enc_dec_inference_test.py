"""Encoder-decoder inference evaluation driver.

Capability parity with ``lcasr/enc_dec_inference_test.py:38-129``: chunked
greedy AR decode of each recording (``-mode default``) or joint CTC-branch
beam decode (``-mode joint``, the reference's ``model.ctc_beam_search`` path
— here the on-device CTC beam search over ``final_posteriors_ctc``).
Deterministic, so no repeats needed (reference note at ``:110``).
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from dynamic_asr_eval_tpu.config import apply_args
from dynamic_asr_eval_tpu.data import get_dataset
from dynamic_asr_eval_tpu.evals.common import append_log, evaluate_records, save_result_pickle
from dynamic_asr_eval_tpu.text import load_tokenizer, normalize
from dynamic_asr_eval_tpu.tta.encdec_rl import enc_dec_inference


def load_encdec_from_args(args, tokenizer):
    import jax.numpy as jnp

    from dynamic_asr_eval_tpu.models.conformer import ConformerConfig
    from dynamic_asr_eval_tpu.models.encdec import EncDecConfig, init_encdec

    enc = ConformerConfig(
        feat_in=80, n_layers=2, d_model=64, n_heads=2, head_dim=32,
        vocab_size=tokenizer.vocab_size(), subsampling_factor=4,
        subsampling_conv_channels=8, conv_kernel_size=5,
        compute_dtype=jnp.float32,
    )
    cfg = EncDecConfig(encoder=enc, decoder_layers=2, decoder_d_model=64,
                       decoder_heads=2)
    if getattr(args, "checkpoint", ""):
        from dynamic_asr_eval_tpu.models.checkpoint import load_encdec_torch_checkpoint

        # reference enc-dec torch pickle → oracle-proven conversion
        # (convert_encdec_checkpoint, tests/test_encdec_oracle.py)
        return load_encdec_torch_checkpoint(args.checkpoint)
    model, variables = init_encdec(cfg, jax.random.PRNGKey(int(getattr(args, "seed", 0) or 0)))
    return model, variables, cfg


def main(args) -> float:
    tokenizer = load_tokenizer(getattr(args, "tokenizer", None) or None)
    model, variables, cfg = load_encdec_from_args(args, tokenizer)
    records = get_dataset(args.dataset, args.split)
    mode = getattr(args, "mode", "default")

    def run_one(rec):
        spec, gold = rec["process_fn"](rec)
        spec = np.asarray(spec)
        if spec.ndim == 3:
            spec = spec[0]
        if mode == "joint":
            from dynamic_asr_eval_tpu.ops.beam_search import (
                UniformLMAdapter, beam_search_device,
            )
            import jax.numpy as jnp

            out = model.apply(variables, jnp.asarray(spec)[None])
            lp = out["final_posteriors_ctc"][0]
            toks, lens, _ = beam_search_device(
                lp, UniformLMAdapter(cfg.vocab_size),
                beam_width=getattr(args, "beams", 10) or 10,
                alpha=vars(args).get("lm_alpha", 0.45),
                beta=vars(args).get("lm_beta", 1.53),
                prune_less_than_val=vars(args).get("lm_prune_less_than_val", 3.17),
            )
            text = tokenizer.decode([int(x) for x in np.asarray(toks[0])[: int(lens[0])]])
        else:
            text = enc_dec_inference(model, variables, spec, args.seq_len, tokenizer, cfg)
        return normalize(text), gold

    wer, detail = evaluate_records(records, run_one, verbose=not getattr(args, "quiet", False))
    print(f"WER: {wer}")
    append_log(getattr(args, "log", ""), f"enc_dec_inference\t{mode}\tWER: {wer}")
    if getattr(args, "save_path", ""):
        save_result_pickle(args.save_path, detail, args, 0, 1)
    return wer


def cli(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-d", "--dataset", type=str, default="synthetic")
    parser.add_argument("-mode", "--mode", type=str, default="default", choices=["default", "joint"])
    parser.add_argument("-s", "--save_path", type=str, default="")
    parser.add_argument("--tokenizer", type=str, default="")
    parser.add_argument("--quiet", action="store_true")
    args = apply_args(parser, argv)
    return main(args)


if __name__ == "__main__":
    cli()
