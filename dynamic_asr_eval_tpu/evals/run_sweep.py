"""Hyperparameter sweep runner.

Capability parity with ``lcasr/run_sweep.py:11-63``: a sweep YAML names a
run script and a parameter space; each agent run overrides args and logs the
resulting WER.  With wandb available it uses ``wandb.agent`` Bayesian sweeps
exactly like the reference; without it (this image), it falls back to
grid/random search with the same YAML schema and writes a JSONL of results.

Sweep YAML schema (wandb-style)::

    method: bayes | grid | random
    metric: {name: WER, goal: minimize}
    parameters:
      optim_lr: {values: [1e-5, 9e-5]}        # or {min: ..., max: ...}
      spec_augment_n_freq_masks: {values: [2, 6]}

Runs force the dev split like the reference (``run_sweep.py:40``).
"""

from __future__ import annotations

import argparse
import itertools
import json
import random
from typing import Any, Dict, List

import yaml

RUN_SCRIPTS = {}


def _register_run_scripts():
    from dynamic_asr_eval_tpu.evals import run as run_mod
    from dynamic_asr_eval_tpu.evals import enc_dec_dynamic_eval_test as ed_tta
    from dynamic_asr_eval_tpu.evals import enc_dec_inference_test as ed_inf

    def _joint_beam_main(args):
        # the joint-CTC-beam driver IS enc_dec_inference_test pinned to
        # mode="joint" — sweeping it must not fall back to plain AR decode
        args.mode = "joint"
        return ed_inf.main(args)

    RUN_SCRIPTS.update({
        "main": run_mod.main,
        "enc_dec_dynamic_eval_test": ed_tta.main,
        "enc_dec_inference_test": ed_inf.main,
        "enc_dec_ctc_beam_inference_test": _joint_beam_main,
    })


def _coerce(v):
    # PyYAML 1.1 parses "1e-5" (no dot) as a string — normalize scalars
    from dynamic_asr_eval_tpu.config import parse_kwarg_value

    return parse_kwarg_value(v) if isinstance(v, str) else v


def coerce_parameters(params: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, spec in params.items():
        spec = dict(spec)
        if "values" in spec:
            spec["values"] = [_coerce(v) for v in spec["values"]]
        for bound in ("min", "max"):
            if bound in spec:
                spec[bound] = _coerce(spec[bound])
        out[k] = spec
    return out


def expand_parameters(params: Dict[str, Any], method: str, n_random: int = 20,
                      seed: int = 0) -> List[Dict[str, Any]]:
    coerce = _coerce
    keys, spaces = [], []
    rng = random.Random(seed)
    for k, spec in params.items():
        keys.append(k)
        if "values" in spec:
            spaces.append([coerce(v) for v in spec["values"]])
        elif "min" in spec and "max" in spec:
            lo, hi = spec["min"], spec["max"]
            if method == "grid":
                spaces.append([lo + (hi - lo) * i / 4 for i in range(5)])
            else:
                spaces.append(("range", lo, hi))
        else:
            raise ValueError(f"parameter {k}: need 'values' or 'min'/'max'")

    if method == "grid":
        return [dict(zip(keys, combo)) for combo in itertools.product(*spaces)]
    out = []
    for _ in range(n_random):
        pick = {}
        for k, sp in zip(keys, spaces):
            if isinstance(sp, tuple):
                pick[k] = rng.uniform(sp[1], sp[2])
            else:
                pick[k] = rng.choice(sp)
        out.append(pick)
    return out


def main(args):
    _register_run_scripts()
    with open(args.sweep_config, "r") as f:
        sweep = yaml.safe_load(f)

    run_fn = RUN_SCRIPTS[args.run_script]
    method = sweep.get("method", "grid")

    try:
        import wandb  # noqa: F401

        have_wandb = not args.no_wandb
    except ImportError:
        have_wandb = False

    if have_wandb:
        import wandb

        sweep_id = wandb.sweep(sweep, project=sweep.get("project", "dae_tpu_sweep"))

        def agent_run():
            wandb.init()
            overrides = dict(wandb.config)
            run_args = argparse.Namespace(**{**vars(args.base_args), **overrides})
            run_args.split = "dev"
            wer = run_fn(run_args)
            wandb.log({"WER": wer})

        wandb.agent(sweep_id, function=agent_run, count=args.count)
        return

    # offline fallback — grid / random are exhaustive lists; bayes runs the
    # native TPE surrogate (evals/hpo.py), the same sequential
    # suggest→run→observe loop wandb's service performs for the reference
    parameters = coerce_parameters(sweep.get("parameters", {}))
    maximize = (sweep.get("metric") or {}).get("goal", "minimize") == "maximize"
    results = []

    def run_trial(i, n, overrides):
        run_args = argparse.Namespace(**{**vars(args.base_args), **overrides})
        run_args.split = "dev"
        print(f"[sweep {i + 1}/{n}] {overrides}")
        wer = run_fn(run_args)
        rec = {"overrides": overrides, "WER": wer}
        results.append(rec)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return wer

    if method == "bayes":
        from dynamic_asr_eval_tpu.evals.hpo import TPESampler

        tpe = TPESampler(parameters, seed=getattr(args, "seed", 0) or 0,
                         maximize=maximize)
        for i in range(args.count):
            overrides = tpe.suggest()
            tpe.observe(overrides, run_trial(i, args.count, overrides))
    else:
        combos = expand_parameters(parameters, method, args.count)
        for i, overrides in enumerate(combos):
            run_trial(i, len(combos), overrides)
    best = min(results, key=lambda r: (-1 if maximize else 1) * r["WER"])
    print(f"best: WER={best['WER']} with {best['overrides']}")
    return best


def cli(argv=None):
    from dynamic_asr_eval_tpu.config import apply_args

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-sc", "--sweep_config", type=str, required=True)
    parser.add_argument("-run_script", "--run_script", type=str, default="main",
                        choices=["main", "enc_dec_dynamic_eval_test",
                                 "enc_dec_inference_test",
                                 "enc_dec_ctc_beam_inference_test"])
    parser.add_argument("--count", type=int, default=20)
    parser.add_argument("--out", type=str, default="")
    parser.add_argument("--no_wandb", action="store_true")
    parser.add_argument("-d", "--dataset", type=str, default="synthetic")
    parser.add_argument("--tokenizer", type=str, default="")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--training_mode", type=str, default="grpo")
    parser.add_argument("--breaks", action="store_true")
    parser.add_argument("-s", "--save_path", type=str, default="")
    parser.add_argument("-r", "--repeats", type=int, default=1)
    parser.add_argument("-mode", "--mode", type=str, default="default")
    args = apply_args(parser, argv)
    args.base_args = args
    return main(args)


if __name__ == "__main__":
    cli()
