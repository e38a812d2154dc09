"""Torch mini-oracle for the utterance-level TTA loop.

Reference control flow (wav2vec2 ``dynamic_eval_ctc_loss_su``,
``wav2vec2/lib.py:351-462``; lcasr_nemo variant ``lcasr_nemo/lib.py:81-172``):
loop utterances, forward ``[augmented, clean]`` (augmentation off here — the
aug copy equals the clean copy), greedy pseudo-labels from the clean stream,
CTC loss on the augmented stream normalized sum/(N·B) (the lcasr_nemo
convention, ``lcasr_nemo/lib.py:110,154`` — the wav2vec2 ``_su`` variant's
``reduction='mean'`` is a per-utterance label-length rescale of the same
gradient direction and is unified on this convention, see COMPONENTS.md),
grad-norm clip at 10.0 (``wav2vec2/lib.py:446``), MADGRAD step per utterance
(the reference hardcodes ``accumulate_for = 1``, ``wav2vec2/lib.py:365``),
and per-utterance probabilities collected MID-LOOP from the visit's own
forward (``utterances[idx]['probs']``, ``wav2vec2/lib.py:455-456`` /
``lcasr_nemo/lib.py:166-167``) — not from a final uniform pass.

Run against ``UtteranceTTAEngine`` (which pads utterances to power-of-two
buckets and length-masks — equality across that difference is part of what
this oracle proves) with identical tiny weights via the value-proven
converter; assert the per-utterance log-probs and the adapted parameters
agree to fp32 tolerance.
"""

import pytest  # noqa: E402 (marker needs it first)

pytestmark = pytest.mark.slow  # torch utterance-loop oracle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dynamic_asr_eval_tpu.config import TTAConfig
from dynamic_asr_eval_tpu.models.conformer import SCConformer
from dynamic_asr_eval_tpu.tta.utterance import UtteranceTTAEngine

from test_reference_oracle import (
    DS,
    TorchMadgrad,
    _greedy_ids,
    _param_delta,
    _setup,
)

PARAM_TOL = 1e-4
LP_TOL = 2e-3


def torch_utterance_tta(model, utts, lr, epochs, clip=None, accumulate=1):
    """Reference loop with ragged utterances.  ``accumulate > 1`` follows the
    ENGINE's documented generalization (grad mean over the accumulation
    window) — the reference hardcodes ``accumulate_for = 1``."""
    blank = model.decoder.num_classes - 1
    ctc = torch.nn.CTCLoss(blank=blank, reduction="sum")
    optimizer = TorchMadgrad(model.parameters(), lr=lr)
    model.eval()
    probs = {}
    n_acc = 0
    for _epoch in range(epochs):
        for idx, utt in enumerate(utts):
            audio = torch.from_numpy(utt)[None].repeat(2, 1, 1)  # [aug, clean]
            out = model(audio_signal=audio)["final_posteriors"]
            pseudo = _greedy_ids(out[-1].detach(), blank)
            probs[idx] = out[-1].detach().numpy()  # mid-loop collection
            if not pseudo:
                continue
            targets = torch.LongTensor(pseudo).unsqueeze(0)
            aug_outs = out[:1]
            N, B = aug_outs.shape[1], aug_outs.shape[0]
            loss = ctc(
                aug_outs.transpose(0, 1), targets,
                torch.LongTensor([N]), torch.LongTensor([targets.shape[1]]),
            ) / (N * B)
            # engine semantics: grads averaged over the accumulation window,
            # clip applied to the averaged grads, one step per window
            (loss / accumulate).backward()
            n_acc += 1
            if n_acc >= accumulate:
                if clip is not None:
                    torch.nn.utils.clip_grad_norm_(model.parameters(), clip)
                optimizer.step()
                optimizer.zero_grad()
                n_acc = 0
    if n_acc:
        if clip is not None:
            # trailing partial window: the engine divides by the ACTUAL count
            for p in model.parameters():
                if p.grad is not None:
                    p.grad *= accumulate / n_acc
            torch.nn.utils.clip_grad_norm_(model.parameters(), clip)
        else:
            for p in model.parameters():
                if p.grad is not None:
                    p.grad *= accumulate / n_acc
        optimizer.step()
        optimizer.zero_grad()
    return probs, model


def _run_engine(cfg, variables, utts, lr, epochs, clip=None, accumulate=1):
    engine = UtteranceTTAEngine(
        SCConformer(cfg), cfg.blank_id, cfg.subsampling_factor,
        TTAConfig(epochs=epochs, shuffle=False, optim_args={"lr": lr}),
        num_negatives=1, clip_norm=clip, accumulate_gradients=accumulate,
    )
    outs, params, _ = engine(
        variables, [{"spectrogram": u} for u in utts], return_params=True
    )
    return outs, params


def _make_utts(seed, lengths):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((16, t)).astype(np.float32) for t in lengths]


def _assert_probs_match(outs, t_probs):
    assert len(outs) == len(t_probs)
    for i, o in enumerate(outs):
        assert o.shape == t_probs[i].shape, (i, o.shape, t_probs[i].shape)
        assert np.abs(o - t_probs[i]).max() < LP_TOL, \
            (i, np.abs(o - t_probs[i]).max())


@pytest.mark.parametrize("epochs", [1, 2])
def test_utterance_loop_parity(epochs):
    """Ragged utterance lengths (different padding buckets on the engine
    side), per-utterance MADGRAD steps, mid-loop prob collection."""
    tm, cfg, variables = _setup(seed=3)
    utts = _make_utts(3, [40, 100, 64, 300])
    lr = 1e-3

    outs, j_params = _run_engine(cfg, variables, utts, lr, epochs)
    t_probs, tm = torch_utterance_tta(tm, utts, lr, epochs)

    _assert_probs_match(outs, t_probs)
    moved = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        variables["params"], j_params)))
    assert moved > 1e-6, "adaptation did not change parameters"
    assert _param_delta(tm, j_params) < PARAM_TOL


def test_utterance_loop_parity_with_active_clip():
    """clip_norm small enough that the grad-norm clip actually rescales:
    the engine's min(1, c/‖g‖) must match torch's clip_grad_norm_."""
    tm, cfg, variables = _setup(seed=4)
    utts = _make_utts(4, [48, 120])
    lr = 1e-3

    outs, j_params = _run_engine(cfg, variables, utts, lr, 1, clip=1e-3)
    t_probs, tm = torch_utterance_tta(tm, utts, lr, 1, clip=1e-3)

    _assert_probs_match(outs, t_probs)
    assert _param_delta(tm, j_params) < PARAM_TOL


def test_utterance_loop_parity_grad_accumulation():
    """accumulate_gradients=2 over 3 utterances (one trailing partial
    window): the engine's mean-over-window generalization, matched on the
    torch side."""
    tm, cfg, variables = _setup(seed=5)
    utts = _make_utts(5, [64, 96, 80])
    lr = 1e-3

    outs, j_params = _run_engine(cfg, variables, utts, lr, 1, accumulate=2)
    t_probs, tm = torch_utterance_tta(tm, utts, lr, 1, accumulate=2)

    _assert_probs_match(outs, t_probs)
    assert _param_delta(tm, j_params) < PARAM_TOL
