"""Per-checkpoint evaluation loop.

Capability parity with ``lcasr/tedlium/bin/eval_for_each_cpt.py``: iterate
every checkpoint in a folder and run the per-recording driver on each —
used to sweep a finetuning run's saved checkpoints for the best dev WER.

Accepts both this repo's native ``.ckpt`` msgpack checkpoints and reference
``.pt`` torch pickles (converted on load by ``load_model_and_tokenizer``).

CLI: ``python -m dynamic_asr_eval_tpu.evals.eval_for_each_cpt -cf ckpts/
-d tedlium --split dev``
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Tuple

from dynamic_asr_eval_tpu.config import apply_args
from dynamic_asr_eval_tpu.evals import run as run_mod


def main(args) -> List[Tuple[str, float]]:
    names = sorted(os.listdir(args.checkpoint_folder))
    results: List[Tuple[str, float]] = []
    for name in names:
        if not name.endswith((".pt", ".ckpt")):
            continue
        path = os.path.join(args.checkpoint_folder, name)
        print(f"Evaluating checkpoint: {path}")
        args.checkpoint = path
        wer = run_mod.main(args)
        results.append((name, wer))
    if results:
        best = min(results, key=lambda r: r[1])
        print("\nPer-checkpoint WERs:")
        for name, wer in results:
            marker = "  <- best" if name == best[0] else ""
            print(f"  {name}\tWER: {wer:.5f}{marker}")
    return results


def cli(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-cf", "--checkpoint_folder", type=str, required=True)
    parser.add_argument("-d", "--dataset", type=str, default="synthetic")
    parser.add_argument("-r", "--repeats", type=int, default=1)
    parser.add_argument("-s", "--save_path", type=str, default="")
    parser.add_argument("--tokenizer", type=str, default="")
    parser.add_argument("--quiet", action="store_true")
    args = apply_args(parser, argv)
    return main(args)


if __name__ == "__main__":
    cli()
