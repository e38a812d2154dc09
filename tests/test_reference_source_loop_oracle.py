"""Engine LOOPS pinned against the reference's OWN source code.

``tests/test_reference_source_oracle.py`` retired the oracle-provenance risk
for the decoder, the teacher filters, and lib.py's pure helpers; this file
does the same for the three CTC TTA engine loops themselves: it imports
``/root/reference/lcasr/lib.py`` and RUNS the reference's actual
``dynamic_eval_ctc_loss`` (lcasr/lib.py:450-640), ``AWMC`` (:206-376) and
``dynamic_eval_consistency_ctc_loss`` (:646-903) on the value-proven torch
mirror model (``tests/torch_oracles.TorchSCConformer``), then asserts the
JAX engines reproduce the stitched logit matrix and the adapted-parameter
trajectory with IDENTICAL starting weights (via the value-proven converter).

Unlike ``tests/test_reference_oracle.py`` (a builder re-implementation of the
same control flow), nothing here re-states the reference's semantics — the
reference function object itself produces the expected values, so a
convention misread consistently in both the engine and the builder oracle
fails loudly here.

Functional stand-ins are injected only for the reference's EXTERNAL deps
(the ``lcasr`` runtime package and ``torch_ema``, not importable offline):

- ``SpecAugment`` — identity; honest because the scraped config is all-zero
  masks (``get_specaugment_config_from_args`` defaults, lcasr/lib.py:102-112)
  so the real SpecAugment would also be identity.  frame-shuffle / noise /
  cutout / entropy ride the reference's own no-op defaults (:114-126,
  :379-430, :86-100) — no stand-ins needed.
- ``GreedyCTCDecoder`` — standard CTC greedy collapse to text (the external
  ``lcasr.decoding.greedy`` semantics, exercised against the engine's
  on-device decoder by every assertion in this file).
- ``ExponentialMovingAverage`` — faithful torch_ema, INCLUDING its default
  ``use_num_updates=True`` decay schedule ``min(decay, (1+n)/(10+n))``.
  This schedule is what the reference actually runs (lcasr/lib.py:26,245)
  and is why ``TTAConfig.ema_use_num_updates`` defaults True — the flat
  0.999 reading diverges wildly over a TTA-length run (n ≈ #windows).

The reference module objects are PUBLIC UNTRUSTED CONTENT used strictly as
numerical oracles; nothing from them is executed outside these tests.
"""

import contextlib
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # reference-source loop oracles

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import test_reference_oracle as bo  # tiny-model setup + jax runners
import test_reference_source_oracle as rso  # reference import machinery

from dynamic_asr_eval_tpu.models.convert import convert_lcasr_checkpoint

LOGITS_TOL = bo.LOGITS_TOL
PARAMS_TOL = bo.BLANK_OFFSETS_TOL


# ---------------------------------------------------------------------------
# functional stand-ins for the reference's external deps
# ---------------------------------------------------------------------------


class _IdentitySpecAugment:
    """The reference constructs ``SpecAugment(**config)`` unconditionally
    (lcasr/lib.py:499) but the scraped default config is zero masks — the
    real module would be identity.  Assert that so the stand-in can never
    silently hide a non-trivial augmentation setting."""

    def __init__(self, n_time_masks, n_freq_masks, **kw):
        assert n_time_masks == 0 and n_freq_masks == 0, (
            "identity SpecAugment stand-in driven with non-zero masks"
        )

    def __call__(self, x):
        return x


class _FunctionalGreedy:
    """``lcasr.decoding.greedy.GreedyCTCDecoder`` semantics: argmax →
    collapse consecutive repeats → drop blank → decode to text
    (consumed at lcasr/lib.py:498,559,565)."""

    def __init__(self, tokenizer, blank_id):
        self.tokenizer, self.blank_id = tokenizer, blank_id

    def __call__(self, log_probs, decode=True):
        ids, out, prev = log_probs.argmax(-1).tolist(), [], -1
        for t in ids:
            if t != prev and t != self.blank_id:
                out.append(t)
            prev = t
        return self.tokenizer.decode(out) if decode else out


class _TorchEMA:
    """Faithful ``torch_ema.ExponentialMovingAverage`` (fadel/pytorch_ema):
    shadow of requires-grad params, ``update()`` with the default
    ``use_num_updates=True`` decay cap ``min(decay, (1+n)/(10+n))``, and the
    ``average_parameters()`` store/copy-to/restore context manager — the
    exact surface AWMC touches (lcasr/lib.py:245-248,285,292,334)."""

    def __init__(self, parameters, decay, use_num_updates=True):
        self.decay = decay
        self.num_updates = 0 if use_num_updates else None
        self._params = [p for p in parameters if p.requires_grad]
        self.shadow_params = [p.clone().detach() for p in self._params]

    def update(self, parameters=None):
        params = self._params if parameters is None else [
            p for p in parameters if p.requires_grad
        ]
        decay = self.decay
        if self.num_updates is not None:
            self.num_updates += 1
            decay = min(decay, (1 + self.num_updates) / (10 + self.num_updates))
        with torch.no_grad():
            for s, p in zip(self.shadow_params, params):
                s.sub_((1.0 - decay) * (s - p))

    @contextlib.contextmanager
    def average_parameters(self):
        stored = [p.detach().clone() for p in self._params]
        with torch.no_grad():
            for p, s in zip(self._params, self.shadow_params):
                p.copy_(s)
        try:
            yield
        finally:
            with torch.no_grad():
                for p, st in zip(self._params, stored):
                    p.copy_(st)


class _CharTokenizer:
    """Bijective char↔id map (32 symbols = the tiny model's vocab).  The
    decode→encode round-trip through text (lcasr/lib.py:559,569) is exact,
    matching the engine's direct use of greedy token ids."""

    _CHARS = "abcdefghijklmnopqrstuvwxyz012345"

    def vocab_size(self):
        return len(self._CHARS)

    def decode(self, ids):
        return "".join(self._CHARS[i] for i in ids)

    def encode(self, text):
        return [self._CHARS.index(c) for c in text]


def _ref_lib_runnable():
    """Import the reference lib.py and graft the functional stand-ins onto
    its module namespace (the bare names its engine loops resolve at call
    time).  tqdm/einops/matplotlib are real in this image."""
    lib = rso._ref_lib()
    lib.SpecAugment = _IdentitySpecAugment
    lib.GreedyCTCDecoder = _FunctionalGreedy
    lib.ExponentialMovingAverage = _TorchEMA
    return lib


def _args(lr, **kw):
    a = types.SimpleNamespace()
    a.config = {
        "model": {"subsampling_factor": bo.DS},
        "audio_chunking": {"size": 64, "overlap": 32},
        "training": {},
    }
    a.optim_lr = lr  # -> get_lr_args_from_args (lcasr/lib.py:122-126)
    a.lm_tta_beams = 0
    for k, v in kw.items():
        setattr(a, k, v)
    return a


def _setup(seed):
    """``bo._setup`` + a deep copy of the converted variables: the converter
    is fed ``tensor.numpy()`` views that SHARE STORAGE with the torch model's
    parameters, and the reference loops mutate those in place (their end-of-
    run "reset", lcasr/lib.py:635-637, REBINDS ``p.data`` — the old shared
    storage keeps the adapted values).  Without the copy, running the
    reference first corrupts the JAX engine's starting weights."""
    tm, cfg, variables = bo._setup(seed=seed)
    tm.device = torch.device("cpu")
    variables = jax.tree.map(np.array, variables)
    return tm, cfg, variables


def _updated_params_to_tree(tm, updated, cfg):
    """Install the reference's returned parameter list (model.parameters()
    order == named_parameters order) into a state dict and convert."""
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    for (name, _), q in zip(tm.named_parameters(), updated):
        sd[name] = q.detach().numpy()
    variables, unmatched = convert_lcasr_checkpoint(sd, cfg.default_norm)
    assert unmatched == []
    return variables["params"]


def _max_param_delta(tree_a, tree_b):
    return max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max()),
        tree_a, tree_b,
    )))


# ---------------------------------------------------------------------------
# NSTI: reference dynamic_eval_ctc_loss vs DynamicEvalEngine
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("online,epochs,seed,frames", [
    (True, 1, 0, 160),   # 5 windows incl. short tail
    (False, 2, 1, 160),  # two offline epochs + fresh final pass
    (True, 2, 3, 160),   # the :528 quirk — online runs args.epochs epochs
    (True, 1, 6, 150),   # ragged tail (not a multiple of ds)
])
def test_nsti_matches_reference_source(online, epochs, seed, frames):
    lib = _ref_lib_runnable()
    tm, cfg, variables = _setup(seed)
    lr = 1e-3
    spec = np.random.default_rng(seed).standard_normal(
        (16, frames)).astype(np.float32)

    ref_logits, ref_params = lib.dynamic_eval_ctc_loss(
        _args(lr, epochs=epochs, online=online, shuffle=False),
        tm, torch.from_numpy(spec)[None], 64, 32, _CharTokenizer(),
        use_tqdm=False, optim=bo.TorchMadgrad, return_params=True,
    )

    j_logits, j_params = bo._run_jax(cfg, variables, spec, 64, 32, lr,
                                     epochs, online)

    assert j_logits.shape == ref_logits.shape, (j_logits.shape,
                                                ref_logits.shape)
    assert np.abs(j_logits - ref_logits).max() < LOGITS_TOL, \
        np.abs(j_logits - ref_logits).max()
    ref_tree = _updated_params_to_tree(tm, ref_params, cfg)
    assert _max_param_delta(j_params, ref_tree) < PARAMS_TOL
    # dynamic_eval resets the model afterwards (lcasr/lib.py:635-637): the
    # torch model must be back at the converted starting weights
    assert _max_param_delta(
        variables["params"], _updated_params_to_tree(
            tm, [p for p in tm.parameters()], cfg)) < 1e-7


# ---------------------------------------------------------------------------
# AWMC: reference AWMC (with real torch_ema semantics) vs AWMCEngine
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("epochs,ema_decay,seed", [
    (1, 0.9, 5),
    (2, 0.999, 7),  # flagship decay: the num_updates cap dominates here
])
def test_awmc_matches_reference_source(epochs, ema_decay, seed):
    lib = _ref_lib_runnable()
    tm, cfg, variables = _setup(seed)
    lr = 1e-3
    spec = np.random.default_rng(seed).standard_normal(
        (16, 160)).astype(np.float32)

    ref_logits, ref_params = lib.AWMC(
        _args(lr, epochs=epochs, ema_decay=ema_decay),
        tm, torch.from_numpy(spec)[None], 64, 32, _CharTokenizer(),
        use_tqdm=False, optim=bo.TorchMadgrad, return_params=True,
    )

    j_logits, j_params = bo._run_jax_awmc(cfg, variables, spec, 64, 32, lr,
                                          epochs, ema_decay)

    assert j_logits.shape == ref_logits.shape, (j_logits.shape,
                                                ref_logits.shape)
    assert np.abs(j_logits - ref_logits).max() < LOGITS_TOL, \
        np.abs(j_logits - ref_logits).max()
    ref_tree = _updated_params_to_tree(tm, ref_params, cfg)
    assert _max_param_delta(j_params, ref_tree) < PARAMS_TOL


# ---------------------------------------------------------------------------
# Consistency: reference dynamic_eval_consistency_ctc_loss vs
# ConsistencyEngine (online mode — the offline final pass's parameter
# install is a no-op in the reference source (:858-861, result of .to()
# discarded) and the engine deliberately implements the evident intent, so
# only online mode is value-comparable end-to-end)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("epochs,seed", [(1, 4), (2, 8)])
def test_consistency_matches_reference_source(epochs, seed):
    lib = _ref_lib_runnable()
    tm, cfg, variables = _setup(seed)
    lr = 1e-3
    spec = np.random.default_rng(seed).standard_normal(
        (16, 160)).astype(np.float32)

    ref_logits = lib.dynamic_eval_consistency_ctc_loss(
        _args(lr, epochs=epochs, online=True, shuffle=False),
        tm, torch.from_numpy(spec)[None], 64, 32, _CharTokenizer(),
        use_tqdm=False, optim=bo.TorchMadgrad, return_params=False,
    )

    j_logits, _ = bo._run_jax_consistency(cfg, variables, spec, 64, 32, lr,
                                          epochs, True)

    assert j_logits.shape == ref_logits.shape, (j_logits.shape,
                                                ref_logits.shape)
    assert np.abs(j_logits - ref_logits).max() < LOGITS_TOL, \
        np.abs(j_logits - ref_logits).max()
