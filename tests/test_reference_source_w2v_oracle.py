"""wav2vec2 TTA loops pinned against the reference's OWN source code.

Imports ``/root/reference/wav2vec2/lib.py`` and RUNS its actual
``dynamic_eval_ctc_loss_su`` (per-utterance TTA, :293-462) and
``dynamic_eval_ctc_loss`` (windowed recording TTA, :41-235) on a REAL tiny
``transformers.Wav2Vec2ForCTC`` — the genuine third-party model the
reference backend wraps — with the REAL HF ``Wav2Vec2FeatureExtractor``
doing the reference's per-sequence zero-mean/unit-var input normalization
(``wav2vec2/lib.py:161,406``).  The JAX side runs the converted flax model
(``load_hf_weights``, forward parity <1e-4 per ``test_convert_parity.py``)
with ``Wav2Vec2Config.normalize_input=True`` and must reproduce the
reference loops' collected probabilities / stitched logits and the adapted
parameter trajectory.

These pins fixed two conventions the builder oracles had wrong or missing:

- the per-utterance loss is torch ``CTCLoss(reduction='mean')`` (per-sample
  loss over its TARGET length) with the frame division commented out
  (``:351,434``) — now ``UtteranceTTAEngine(loss_norm="ctc_mean")``;
- the input normalization itself: the reference normalizes EVERY
  window/utterance through the HF processor; the driver previously fed raw
  waveforms.

Functional stand-ins only for deps that are unavailable offline or
intrinsically un-pinnable across frameworks:

- ``augment`` (WavAugment sox chain) — identity ``EffectChain``: its effects
  are RANDOM (sox RNG can't be mirrored in JAX), so the windowed-loop pin
  isolates the loop/stitch/optimizer mechanics with aug ≡ clean, like the
  zero-mask SpecAugment configuration in the lcasr loop pins.
- ``GreedyCTCDecoder`` — standard CTC greedy collapse to text.
- ``madgrad`` — the shared ``TorchMadgrad`` (itself mirrored by the
  engine's optax MADGRAD and pinned by the lcasr loop oracles).
- ``soft_dtw_cuda.SoftDTW`` — constructed at :130,:370 but never called in
  the active code path; a constructor-only dud.

The reference module objects are PUBLIC UNTRUSTED CONTENT used strictly as
numerical oracles; nothing from them is executed outside these tests.
"""

import dataclasses
import os
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # reference-source loop oracles (wav2vec2)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

import test_convert_parity as cp  # tiny HF config + ours-from-HF mapping
import test_reference_oracle as bo  # TorchMadgrad
import test_reference_source_loop_oracle as lo  # lcasr lib stubs (omegaconf)
import test_reference_source_oracle as rso  # _load_ref machinery

from dynamic_asr_eval_tpu.config import TTAConfig
from dynamic_asr_eval_tpu.models.wav2vec2 import (
    Wav2Vec2ForCTC,
    feat_extract_output_lengths,
    load_hf_weights,
)
from dynamic_asr_eval_tpu.tta.runner import DynamicEvalEngine
from dynamic_asr_eval_tpu.tta.utterance import UtteranceTTAEngine

LOGITS_TOL = 3e-3
PARAMS_TOL = 1e-3


# ---------------------------------------------------------------------------
# stand-ins
# ---------------------------------------------------------------------------


class _IdentityEffectChain:
    """WavAugment ``EffectChain`` surface used at wav2vec2/lib.py:146-156:
    chainable effect registration, ``apply(tensor, src_info, tgt_info)``."""

    def time_dropout(self, **kw):
        return self

    def additive_noise(self, *a, **kw):
        return self

    def reverb(self, *a, **kw):
        return self

    def apply(self, x, src_info=None, tgt_info=None):
        return x


class _DudSoftDTW:
    def __init__(self, *a, **kw):
        pass


class _W2VTokenizer:
    """HF-tokenizer-shaped duck: ``blank_id`` / ``vocab_size`` / ``vocab``
    ATTRS, ``__call__(text).input_ids`` encode, ``decode(ids)``.  Bijective
    char map over ids 1..V-1 with blank 0 (the HF wav2vec2 convention), so
    the loop's decode→re-encode round-trip (:419,:428) is exact — matching
    the engine's direct use of greedy token ids."""

    _CHARS = "abcdefghijklmnopqrstuvwxyz01234"  # 31 chars; ids 1..31

    def __init__(self):
        self.blank_id = 0
        self.vocab_size = len(self._CHARS) + 1
        self.vocab = ["<pad>"] + list(self._CHARS)

    def decode(self, ids):
        return "".join(self._CHARS[i - 1] for i in ids)

    def __call__(self, text):
        return types.SimpleNamespace(
            input_ids=[self._CHARS.index(c) + 1 for c in text]
        )


class _RecordingMadgrad(bo.TorchMadgrad):
    """The reference loops reset the model in place before returning
    (wav2vec2/lib.py:231-233,:458-460) without exposing the adapted
    parameters — snapshot them at every step so the trajectory endpoint is
    still comparable."""

    def step(self):
        super().step()
        self.snapshot = [p.detach().clone() for p in self.params]


def _ref_w2v_lib():
    lo._ref_lib_runnable()  # installs the shared omegaconf/lcasr stubs
    w2v = rso._load_ref(
        "ref_w2v_lib",
        os.path.join("..", "wav2vec2", "lib.py"),
        {
            "torchaudio": {},
            "madgrad": {"MADGRAD": type("MADGRAD", (), {})},
            "augment": {"EffectChain": _IdentityEffectChain},
            "soft_dtw_cuda": {"SoftDTW": _DudSoftDTW},
            "torch_ema": {
                "ExponentialMovingAverage": type(
                    "ExponentialMovingAverage", (), {}
                )
            },
        },
    )
    # call-time name overrides (the module-level imports bound dud classes)
    w2v.GreedyCTCDecoder = lo._FunctionalGreedy
    w2v.augment = types.SimpleNamespace(EffectChain=_IdentityEffectChain)
    w2v.SoftDTW = _DudSoftDTW
    return w2v


def _setup(seed):
    """Tiny REAL HF torch model + converted flax variables (deep-copied: the
    converter is fed ``tensor.numpy()`` views that share storage with the
    torch parameters, which the reference loops mutate in place)."""
    torch.manual_seed(seed)
    hf_cfg = cp._small_hf_config(stable_layer_norm=False)
    tm = transformers.Wav2Vec2ForCTC(hf_cfg).eval()
    cfg = dataclasses.replace(cp._ours_from_hf(hf_cfg), normalize_input=True)
    variables = jax.tree.map(np.array, load_hf_weights(tm.state_dict(), cfg))
    fe = transformers.Wav2Vec2FeatureExtractor(
        feature_size=1, sampling_rate=16000, padding_value=0.0,
        do_normalize=True, return_attention_mask=False,
    )
    return tm, cfg, variables, types.SimpleNamespace(feature_extractor=fe)


def _adapted_tree(tm, snapshot, cfg):
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    for (name, _), q in zip(tm.named_parameters(), snapshot):
        sd[name] = q.detach().numpy()
    return load_hf_weights(sd, cfg)["params"]


def _max_param_delta(tree_a, tree_b):
    return max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max()),
        tree_a, tree_b,
    )))


def _args(**kw):
    a = types.SimpleNamespace()
    for k, v in kw.items():
        setattr(a, k, v)
    return a


# ---------------------------------------------------------------------------
# per-utterance loop (dynamic_eval_ctc_loss_su)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("epochs,seed", [(1, 0), (2, 1)])
def test_su_loop_matches_reference_source(epochs, seed, tmp_path,
                                          monkeypatch):
    monkeypatch.chdir(tmp_path)  # the loop writes loss.png to CWD (:452)
    w2v = _ref_w2v_lib()
    tm, cfg, variables, proc = _setup(seed)
    tok = _W2VTokenizer()
    lr = 1e-3
    rng = np.random.default_rng(seed)
    waves = [0.1 * rng.standard_normal(t).astype(np.float32)
             for t in (1600, 2200, 1200)]

    utts = [{"waveform": torch.from_numpy(w)[None]} for w in waves]
    optimizer_cls = _RecordingMadgrad
    out_utts = w2v.dynamic_eval_ctc_loss_su(
        _args(epochs=epochs, shuffle=False), tm, utts, 3200, 0, tok, proc,
        use_tqdm=False, optim=optimizer_cls, lr_args={"lr": lr},
    )

    engine = UtteranceTTAEngine(
        Wav2Vec2ForCTC(cfg), 0, cfg.downsampling_factor,
        TTAConfig(epochs=epochs, shuffle=False, optim_args={"lr": lr}),
        num_negatives=1, clip_norm=10.0, loss_norm="ctc_mean",
        prob_collection="online",
    )
    outs, j_params, _ = engine(
        variables, [{"spectrogram": w[None]} for w in waves],
        return_params=True,
    )

    for i, utt in enumerate(out_utts):
        ref_p = utt["probs"].numpy()
        assert outs[i].shape == ref_p.shape, (i, outs[i].shape, ref_p.shape)
        assert np.abs(outs[i] - ref_p).max() < LOGITS_TOL, \
            (i, np.abs(outs[i] - ref_p).max())

    # the reference resets in place; compare against the last snapshot taken
    # by the recording optimizer the loop constructed internally
    assert _LAST_OPT[0] is not None and hasattr(_LAST_OPT[0], "snapshot")
    ref_tree = _adapted_tree(tm, _LAST_OPT[0].snapshot, cfg)
    assert _max_param_delta(j_params, ref_tree) < PARAMS_TOL


# capture the optimizer instance the reference constructs internally
_LAST_OPT = [None]
_orig_init = _RecordingMadgrad.__init__


def _capturing_init(self, params, lr, **kw):
    _orig_init(self, params, lr, **kw)
    _LAST_OPT[0] = self


_RecordingMadgrad.__init__ = _capturing_init


# ---------------------------------------------------------------------------
# windowed recording loop (dynamic_eval_ctc_loss)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("epochs,seed,T", [
    (1, 2, 4000),  # 4 windows incl. a short ragged tail
    (2, 3, 2800),  # multi-epoch (stitch = last epoch, :132-134 resets)
])
def test_windowed_loop_matches_reference_source(epochs, seed, T, tmp_path,
                                                monkeypatch):
    monkeypatch.chdir(tmp_path)  # writes loss.png per chunk (:201)
    w2v = _ref_w2v_lib()
    tm, cfg, variables, proc = _setup(seed)
    tok = _W2VTokenizer()
    lr = 1e-3
    seq_len, overlap = 1600, 400  # samples; overlap % 4 == 0 (:109)
    rng = np.random.default_rng(seed)
    wave = (0.1 * rng.standard_normal(T)).astype(np.float32)

    ref_logits = w2v.dynamic_eval_ctc_loss(
        _args(epochs=epochs, shuffle=False), tm,
        torch.from_numpy(wave)[None], seq_len, overlap, tok, proc,
        use_tqdm=False, optim=bo.TorchMadgrad, lr_args={"lr": lr},
    )

    tta = TTAConfig(seq_len=seq_len, overlap=overlap, epochs=epochs,
                    online=True, shuffle=False, lm_tta_beams=0,
                    optim_args={"lr": lr})
    engine = DynamicEvalEngine(
        Wav2Vec2ForCTC(cfg), 0, cfg.downsampling_factor, tta,
        out_len_fn=lambda W: int(feat_extract_output_lengths(cfg, W)),
        n_classes=cfg.vocab_size,
    )
    out = engine(variables, wave[None], seq_len, overlap)
    j_logits = out.numpy_logits()

    assert j_logits.shape == ref_logits.shape, (j_logits.shape,
                                                ref_logits.shape)
    assert np.abs(j_logits - ref_logits).max() < LOGITS_TOL, \
        np.abs(j_logits - ref_logits).max()
