"""wav2vec2 waveform-domain evaluation driver.

Capability parity with the reference's wav2vec2 backend drivers
(``wav2vec2/{tedlium,earnings22,...}/run.py`` + ``wav2vec2/lib.py``):
waveform-domain TTA with the WavAugment-style chain, full-recording chunked
mode (``dynamic_eval_ctc_loss``, ``wav2vec2/lib.py:41-235``) or per-utterance
mode with gradient accumulation (``dynamic_eval_ctc_loss_su``, ``:293-462``).

The dataset adapters provide spectrogram ``process_fn``s; this driver loads
the raw waveform instead (wav2vec2 consumes audio directly).  Without real
datasets, ``-d synthetic`` synthesizes waveforms.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from dynamic_asr_eval_tpu.config import TTAConfig, apply_args
from dynamic_asr_eval_tpu.evals.common import append_log, evaluate_records, save_result_pickle
from dynamic_asr_eval_tpu.text import CharTokenizer, normalize
from dynamic_asr_eval_tpu.tta import DynamicEvalEngine
from dynamic_asr_eval_tpu.tta.utterance import UtteranceTTAEngine


def _wave_records(args):
    if args.dataset == "synthetic":
        sr = 16000
        texts = ["the quick brown fox", "adaptation at test time"]
        out = []
        for i, t in enumerate(texts):
            rng = np.random.default_rng(i)
            n = int(4.0 * sr)
            wave = (0.1 * np.sin(2 * np.pi * (180 + 60 * i) * np.arange(n) / sr)
                    + 0.01 * rng.standard_normal(n)).astype(np.float32)
            out.append({"id": f"synthetic_{i}", "text": t, "wave": wave})
        return out
    from dynamic_asr_eval_tpu.audio.io import load_audio
    from dynamic_asr_eval_tpu.data import get_dataset

    records = get_dataset(args.dataset, args.split)
    out = []
    for rec in records:
        if not isinstance(rec.get("audio"), str):
            continue
        out.append({
            "id": rec["id"], "text": rec["text"], "audio": rec["audio"],
            "_orig": rec,
        })
    return out


def main(args) -> float:
    from dynamic_asr_eval_tpu.augment.waveform import wav_augment_pipeline
    from dynamic_asr_eval_tpu.models.wav2vec2 import Wav2Vec2Config, init_wav2vec2

    tokenizer = CharTokenizer()
    # the reference runs every window/utterance through the HF processor's
    # feature extractor (zero-mean/unit-var, ``wav2vec2/lib.py:161,406``);
    # the model-level flag reproduces that inside the jitted forward.
    # ``--raw_input`` opts out.
    norm_in = not getattr(args, "raw_input", False)
    if getattr(args, "full_size", False):
        cfg = Wav2Vec2Config(vocab_size=tokenizer.vocab_size() + 1,
                             normalize_input=norm_in)
    else:
        cfg = Wav2Vec2Config(
            vocab_size=tokenizer.vocab_size() + 1, hidden=64, n_layers=2,
            n_heads=2, ff_dim=128, conv_dim=32, pos_conv_kernel=16,
            pos_conv_groups=4, normalize_input=norm_in,
        )
    blank = 0  # HF convention
    model, variables = init_wav2vec2(
        cfg, jax.random.PRNGKey(int(getattr(args, "seed", 0) or 0)), example_T=8000
    )
    if getattr(args, "checkpoint", ""):
        from dynamic_asr_eval_tpu.models.checkpoint import load_torch_checkpoint
        from dynamic_asr_eval_tpu.models.wav2vec2 import load_hf_weights

        state, _ = load_torch_checkpoint(args.checkpoint)
        variables = load_hf_weights(state, cfg)

    def aug(batch, key, length):  # [B, 1, W]
        return wav_augment_pipeline(
            batch[:, 0, :], key, n_time_dropout=int(vars(args).get("n_time_dropout", 100))
        )[:, None, :]

    # seq/overlap are SAMPLE counts for waveform models; remap the frame-domain
    # CLI defaults (16384/14336) to sample-domain ones (multiples of 320)
    if args.seq_len == 16384 and args.overlap == 14336:
        args.seq_len, args.overlap = 48000, 16000
    tta = TTAConfig.from_args(args)
    per_utterance = getattr(args, "per_utterance", False)
    records = _wave_records(args)

    if per_utterance:
        engine = UtteranceTTAEngine(
            model, blank, cfg.downsampling_factor, tta, augment_fn=aug,
            accumulate_gradients=int(vars(args).get("accumulate_gradients", 1)),
            prob_collection=str(vars(args).get("prob_collection", "online")),
            # the reference per-utterance loop runs CTCLoss(reduction='mean')
            # with the frame division commented out (wav2vec2/lib.py:351,434)
            loss_norm=str(vars(args).get("loss_norm", "ctc_mean")),
            clip_norm=float(vars(args).get("clip_norm", 10.0)),
        )

        def run_one(rec):
            wave = rec.get("wave")
            if wave is None:
                from dynamic_asr_eval_tpu.audio.io import load_audio

                wave = load_audio(rec["audio"])
            # treat the full recording as one utterance here; real utterance
            # splits come from the dataset adapter's segmentation helpers
            outs, _, _ = engine(variables, [{"spectrogram": wave[None]}])
            from dynamic_asr_eval_tpu.ops.ctc import greedy_decode

            return normalize(greedy_decode(outs[0], tokenizer, blank)), normalize(rec["text"])
    else:
        from dynamic_asr_eval_tpu.models.wav2vec2 import feat_extract_output_lengths

        engine = DynamicEvalEngine(
            model, blank, cfg.downsampling_factor, tta, augment_fn=aug,
            out_len_fn=lambda W: int(feat_extract_output_lengths(cfg, W)),
            n_classes=cfg.vocab_size,
        )

        def run_one(rec):
            wave = rec.get("wave")
            if wave is None:
                from dynamic_asr_eval_tpu.audio.io import load_audio

                wave = load_audio(rec["audio"])
            out = engine(variables, wave[None], args.seq_len, args.overlap)
            ids = out.greedy_ids()
            return normalize(tokenizer.decode([int(i) for i in ids])), normalize(rec["text"])

    wer, detail = evaluate_records(records, run_one, verbose=not getattr(args, "quiet", False))
    print(f"WER: {wer}")
    append_log(getattr(args, "log", ""), f"wav2vec2\t{args.dataset}\tWER: {wer}")
    if getattr(args, "save_path", ""):
        save_result_pickle(args.save_path, detail, args, 0, 1)
    return wer


def cli(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-d", "--dataset", type=str, default="synthetic")
    parser.add_argument("--per_utterance", action="store_true",
                        help="utterance-level TTA with gradient accumulation")
    parser.add_argument("--full_size", action="store_true",
                        help="wav2vec2-base dimensions (default: tiny)")
    parser.add_argument("-s", "--save_path", type=str, default="")
    parser.add_argument("--prob_collection", choices=["online", "final"],
                        default="online")
    parser.add_argument("--loss_norm", choices=["frames", "ctc_mean"],
                        default="ctc_mean",
                        help="per-utterance CTC loss normalization: the "
                             "reference's CTCLoss(reduction='mean') "
                             "(ctc_mean) or frames x negatives (frames)")
    parser.add_argument("--clip_norm", type=float, default=10.0,
                        help="grad-norm clip for per-utterance TTA "
                             "(reference clips at 10.0)")
    parser.add_argument("--raw_input", action="store_true",
                        help="skip the HF-processor-equivalent per-sequence "
                             "zero-mean/unit-var input normalization")
    parser.add_argument("--quiet", action="store_true")
    args = apply_args(parser, argv)
    return main(args)


if __name__ == "__main__":
    cli()
