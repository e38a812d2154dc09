"""Joint CTC-branch beam-decode evaluation driver.

Capability parity with ``lcasr/enc_dec_ctc_beam_inference_test.py:34-108``:
thin front-end over :mod:`enc_dec_inference_test` pinned to ``-mode joint``
(the enc-dec model's CTC branch decoded with the on-device beam search,
α/β/prune from the LM-fusion flags).
"""

from __future__ import annotations

import argparse

from dynamic_asr_eval_tpu.config import apply_args
from dynamic_asr_eval_tpu.evals.enc_dec_inference_test import main as _main


def main(args) -> float:
    args.mode = "joint"
    return _main(args)


def cli(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-d", "--dataset", type=str, default="synthetic")
    parser.add_argument("-s", "--save_path", type=str, default="")
    parser.add_argument("--tokenizer", type=str, default="")
    parser.add_argument("--quiet", action="store_true")
    args = apply_args(parser, argv)
    return main(args)


if __name__ == "__main__":
    cli()
