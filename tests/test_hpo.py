"""Offline Bayesian HPO (evals/hpo.py TPE) — the no-wandb replacement for the
reference's server-side ``method: bayes`` sweeps (``lcasr/run_sweep.py:18-34``).

The correctness bar: on a known objective the surrogate must (a) respect the
sweep-YAML schema (categoricals, int ranges, float ranges), (b) concentrate
proposals near the optimum, and (c) beat same-budget random search.
"""

import math
import random

from dynamic_asr_eval_tpu.evals.hpo import TPESampler

QUAD_SPACE = {
    "x": {"min": -5.0, "max": 5.0},
    "y": {"min": -5.0, "max": 5.0},
}


def _quadratic(cfg):
    return (cfg["x"] - 1.7) ** 2 + (cfg["y"] + 0.3) ** 2


def _best_after(sampler_factory, objective, budget):
    tpe = sampler_factory()
    best = math.inf
    for _ in range(budget):
        cfg = tpe.suggest()
        val = objective(cfg)
        tpe.observe(cfg, val)
        best = min(best, val)
    return best


def test_tpe_beats_random_on_quadratic():
    budget, seeds = 40, range(5)
    tpe_best, rand_best = [], []
    for seed in seeds:
        tpe_best.append(_best_after(
            lambda: TPESampler(QUAD_SPACE, seed=seed), _quadratic, budget))
        rng = random.Random(seed)
        best = math.inf
        for _ in range(budget):
            cfg = {"x": rng.uniform(-5, 5), "y": rng.uniform(-5, 5)}
            best = min(best, _quadratic(cfg))
        rand_best.append(best)
    assert sum(tpe_best) < sum(rand_best), (tpe_best, rand_best)
    # and it should actually localize the optimum, not just edge out random
    assert min(tpe_best) < 0.1, tpe_best


def test_tpe_respects_schema_types():
    space = {
        "epochs": {"min": 1, "max": 5},          # int range
        "lr": {"min": 1e-6, "max": 1e-4},        # float range
        "bitfit": {"values": [True, False]},     # categorical
        "cutout_value": {"values": ["mean", "zero"]},
    }
    tpe = TPESampler(space, seed=3)
    for i in range(20):
        cfg = tpe.suggest()
        assert isinstance(cfg["epochs"], int) and 1 <= cfg["epochs"] <= 5
        assert 1e-6 <= cfg["lr"] <= 1e-4
        assert cfg["bitfit"] in (True, False)
        assert cfg["cutout_value"] in ("mean", "zero")
        tpe.observe(cfg, float(i % 7))


def test_tpe_concentrates_on_good_category():
    space = {"choice": {"values": ["a", "b", "c", "d"]}}
    tpe = TPESampler(space, seed=0, n_startup=8)
    rng = random.Random(1)
    for _ in range(40):
        cfg = tpe.suggest()
        # "b" is the clear winner; everything else is bad with noise
        val = 0.1 if cfg["choice"] == "b" else 1.0 + rng.random()
        tpe.observe(cfg, val)
    picks = [tpe.suggest()["choice"] for _ in range(30)]
    assert picks.count("b") > 15, picks


def test_sweep_cli_bayes_uses_tpe(tmp_path, monkeypatch):
    """`method: bayes` through the real sweep CLI must run the TPE loop (not
    fall back to random) and converge toward the stubbed objective's optimum."""
    import dynamic_asr_eval_tpu.evals.run as run_mod
    from dynamic_asr_eval_tpu.evals.run_sweep import cli

    calls = []

    def fake_main(args):
        wer = float((args.optim_lr - 3.0) ** 2 + 0.01)
        calls.append((args.optim_lr, wer))
        return wer

    monkeypatch.setattr(run_mod, "main", fake_main)
    cfg = tmp_path / "sweep.yaml"
    cfg.write_text(
        "method: bayes\n"
        "metric: {name: WER, goal: minimize}\n"
        "parameters:\n"
        "  optim_lr: {min: -10.0, max: 10.0}\n"
    )
    out = tmp_path / "results.jsonl"
    best = cli(["-sc", str(cfg), "--no_wandb", "--count", "30",
                "--out", str(out), "--quiet", "-d", "synthetic"])
    assert len(calls) == 30
    assert abs(best["overrides"]["optim_lr"] - 3.0) < 2.0
    # later proposals must cluster tighter around the optimum than the
    # startup prior draws — evidence the surrogate is steering
    early = [abs(lr - 3.0) for lr, _ in calls[:5]]
    late = [abs(lr - 3.0) for lr, _ in calls[-10:]]
    assert sorted(late)[len(late) // 2] < sorted(early)[len(early) // 2]


def test_sweep_wandb_agent_path(tmp_path, monkeypatch):
    """The wandb-online branch (run_sweep.py:119-133, mirroring
    lcasr/run_sweep.py:18-34) driven by an injected fake ``wandb`` module:
    sweep registration gets the YAML, the agent function pulls overrides from
    ``wandb.config``, forces the dev split, and logs WER."""
    import argparse
    import sys
    import types

    import yaml

    from dynamic_asr_eval_tpu.evals import run_sweep

    sweep = {
        "method": "bayes",
        "metric": {"name": "WER", "goal": "minimize"},
        "project": "dae_test",
        "parameters": {"optim_lr": {"values": [1e-5, 9e-5]}},
    }
    cfg_path = tmp_path / "sweep.yaml"
    cfg_path.write_text(yaml.safe_dump(sweep))

    seen = []

    def fake_run(run_args):
        seen.append(run_args)
        return 0.5 - 0.1 * len(seen)

    monkeypatch.setattr(run_sweep, "_register_run_scripts", lambda: None)
    monkeypatch.setitem(run_sweep.RUN_SCRIPTS, "fake", fake_run)

    state = {"sweep": None, "inits": 0, "logged": []}
    cfgs = [{"optim_lr": 1e-5}, {"optim_lr": 9e-5}]
    fake = types.ModuleType("wandb")

    def fake_sweep(s, project=None):
        state["sweep"] = (s, project)
        return "sweep-id-1"

    def fake_agent(sweep_id, function, count):
        assert sweep_id == "sweep-id-1"
        for i in range(count):
            fake.config = cfgs[i % len(cfgs)]
            function()

    fake.sweep = fake_sweep
    fake.agent = fake_agent
    fake.init = lambda *a, **k: state.__setitem__("inits", state["inits"] + 1)
    fake.log = lambda d: state["logged"].append(d)
    monkeypatch.setitem(sys.modules, "wandb", fake)

    base = argparse.Namespace(dataset="synthetic", split="test")
    args = argparse.Namespace(
        sweep_config=str(cfg_path), run_script="fake", count=2, out="",
        no_wandb=False, base_args=base,
    )
    run_sweep.main(args)

    assert state["sweep"] == (sweep, "dae_test")
    assert state["inits"] == 2
    assert [a.optim_lr for a in seen] == [1e-5, 9e-5]
    assert all(a.split == "dev" for a in seen)  # run_sweep.py:128 / ref :40
    assert [d["WER"] for d in state["logged"]] == [0.4, 0.3]
