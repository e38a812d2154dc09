"""Driver-level golden run (VERDICT r3 ask #2).

The loop-level torch oracles (tests/test_reference_oracle.py) prove the
ENGINE matches the reference's ``dynamic_eval_ctc_loss`` control flow; this
test closes the last untested seam between that and "the product emits
reference WER": a real torch pickle goes through the ACTUAL CLI
(``evals/run.py --checkpoint ref.pt -d synthetic``, one online NSTI epoch,
greedy decode, normalizer, corpus WER) while a torch mini-driver — oracle
model + oracle NSTI loop + greedy + the same tokenizer/normalizer/WER — runs
the same records from the same pristine weights.  Transcripts and WER must be
identical.

Reference surface: ``lcasr/run.py:33-149`` (checkpoint → chunked TTA →
decode → normalize → WER → pickle).
"""

import pytest

pytestmark = pytest.mark.slow  # drives the full CLI + a torch loop per record

import os
import pickle
import sys

import numpy as np

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
from test_reference_oracle import _greedy_ids, torch_dynamic_eval  # noqa: E402
from torch_oracles import TorchSCConformer  # noqa: E402

# synthetic records are 80-mel spectrograms (data/adapters.py _FEAT)
DIMS = dict(feat_in=80, n_layers=2, d_model=32, n_heads=2, head_dim=16,
            vocab_size=32, subsampling_factor=8,
            subsampling_conv_channels=8, conv_kernel_size=9)
SEQ_LEN, OVERLAP, LR = 256, 128, 1e-3


def _ref_config():
    """lcasr160rb1.yaml-shaped checkpoint config (torch-only extras incl.)."""
    model = dict(DIMS)
    model.update(flash_attn=False, subsampling="dw_striding",
                 default_norm="layer_norm", use_rotary=True,
                 self_conditioning=True, decoder_norm=True)
    return {"model": model, "model_class": "SCConformerXL",
            "training": {"dtype": "float32"}}


def _make_ckpt(tmp_path, seed=0):
    torch.manual_seed(seed)
    tm = TorchSCConformer(**DIMS).eval()
    ckpt = str(tmp_path / "ref.pt")
    torch.save({"model": tm.state_dict(), "config": _ref_config()}, ckpt)
    return tm, ckpt


def _torch_mini_driver(tm, loop_fn):
    """Run ``loop_fn(model, spec_t) -> stitched`` over the synthetic records
    from pristine weights (per-recording restore, lcasr/run.py:94) and
    return (hyps, golds) through the same tokenizer/normalizer the CLI uses."""
    from dynamic_asr_eval_tpu.data import get_dataset
    from dynamic_asr_eval_tpu.text import load_tokenizer, normalize

    tokenizer = load_tokenizer(None)
    state = {k: v.clone() for k, v in tm.state_dict().items()}
    hyps, golds = [], []
    for rec in get_dataset("synthetic", "test"):
        spec, gold = rec["process_fn"](rec)
        model = TorchSCConformer(**DIMS).eval()
        model.load_state_dict(state)
        spec_t = torch.from_numpy(np.asarray(spec, np.float32))
        if spec_t.ndim == 2:
            spec_t = spec_t[None]
        stitched = loop_fn(model, spec_t)
        ids = _greedy_ids(torch.from_numpy(stitched), DIMS["vocab_size"])
        hyps.append(normalize(tokenizer.decode([int(i) for i in ids])))
        golds.append(gold)
    return hyps, golds


def test_driver_golden_matches_torch_mini_driver(tmp_path):
    from dynamic_asr_eval_tpu.data import get_dataset
    from dynamic_asr_eval_tpu.evals.run import cli
    from dynamic_asr_eval_tpu.text import (
        load_tokenizer,
        normalize,
        word_error_rate_detail,
    )

    tm, ckpt = _make_ckpt(tmp_path)

    # --- the actual product CLI on the torch pickle ----------------------
    wer = cli([
        "-d", "synthetic", "--quiet", "--checkpoint", ckpt,
        "-s", str(tmp_path / "golden" / "r.pkl"),
        "-kwargs", "epochs=1", "online=true", f"seq_len={SEQ_LEN}",
        f"overlap={OVERLAP}", "lm_tta_beams=0", f"optim_lr={LR}",
    ])
    pkls = [f for f in os.listdir(tmp_path / "golden") if f.endswith(".pkl")]
    with open(tmp_path / "golden" / pkls[0], "rb") as f:
        detail = pickle.load(f)

    # --- torch mini-driver: same records, same pristine weights ----------
    tokenizer = load_tokenizer(None)
    records = get_dataset("synthetic", "test")
    state = {k: v.clone() for k, v in tm.state_dict().items()}
    hyps, golds = [], []
    for rec in records:
        spec, gold = rec["process_fn"](rec)
        model = TorchSCConformer(**DIMS).eval()
        model.load_state_dict(state)  # per-recording restore (lcasr/run.py:94)
        spec_t = torch.from_numpy(np.asarray(spec, np.float32))
        if spec_t.ndim == 2:
            spec_t = spec_t[None]
        stitched, _ = torch_dynamic_eval(
            model, spec_t, SEQ_LEN, OVERLAP, LR, 1, True)
        ids = _greedy_ids(torch.from_numpy(stitched), DIMS["vocab_size"])
        hyps.append(normalize(tokenizer.decode([int(i) for i in ids])))
        golds.append(gold)

    t_wer = word_error_rate_detail(hypotheses=hyps, references=golds)[0]

    assert detail["model_output"] == hyps, (
        "CLI transcripts diverge from the torch mini-driver:\n"
        f"  cli:   {detail['model_output']}\n  torch: {hyps}")
    assert detail["gold"] == golds
    np.testing.assert_allclose(wer, t_wer, rtol=0, atol=1e-12)


def test_awmc_driver_golden_matches_torch_mini_driver(tmp_path):
    """Same seam for the AWMC engine: `evals/run.py --awmc --checkpoint`
    vs the torch AWMC loop oracle (anchor/leader EMA label banks,
    tests/test_reference_oracle.py::torch_awmc)."""
    from dynamic_asr_eval_tpu.evals.run import cli
    from dynamic_asr_eval_tpu.text import word_error_rate_detail
    from test_reference_oracle import torch_awmc

    ema = 0.9
    lr = 5e-4  # gentler than the NSTI golden: AWMC's dual-bank EMA
    # trajectory amplifies fp noise into greedy argmax flips at 1e-3
    tm, ckpt = _make_ckpt(tmp_path, seed=2)
    wer = cli([
        "-d", "synthetic", "--quiet", "--awmc", "--checkpoint", ckpt,
        "-s", str(tmp_path / "golden" / "r.pkl"),
        "-kwargs", "epochs=1", "online=true", f"seq_len={SEQ_LEN}",
        f"overlap={OVERLAP}", "lm_tta_beams=0", f"optim_lr={lr}",
        f"ema_decay={ema}",
    ])
    pkls = [f for f in os.listdir(tmp_path / "golden") if f.endswith(".pkl")]
    with open(tmp_path / "golden" / pkls[0], "rb") as f:
        detail = pickle.load(f)

    hyps, golds = _torch_mini_driver(
        tm, lambda m, s: torch_awmc(m, s, SEQ_LEN, OVERLAP, lr, 1, ema)[0])
    t_wer = word_error_rate_detail(hypotheses=hyps, references=golds)[0]

    assert detail["model_output"] == hyps, (
        "--awmc CLI transcripts diverge from the torch AWMC mini-driver:\n"
        f"  cli:   {detail['model_output']}\n  torch: {hyps}")
    np.testing.assert_allclose(wer, t_wer, rtol=0, atol=1e-12)
