"""Enc-dec TTA loop pinned against the reference's OWN source code.

Runs the actual ``enc_dec_dynamic_eval`` from ``/root/reference/lcasr/lib.py``
(:1475-1732, ``training_mode='teacher_ce'``) — including its real
``calc_loss_enc_dec`` (:1228-1322) and final chunked AR decode
``enc_dec_inference``/``generate_enc_dec`` (:1112-1226) — on the torch
mirror model (``tests/torch_oracles.TorchEncDec``) behind a thin adapter
that exposes the reference's model surface (``language_model_decoder`` with
``pos_enc``/dropout attrs, ``.generate``, the three ``forward`` call
shapes, ``ctc_loss_weight``).  The JAX ``EncDecDynamicEvalEngine`` must
reproduce the final transcript and the adapted parameter trajectory from
identical converted weights.

This pin closed a real gap: the reference freezes
``model.language_model_decoder.pos_enc`` (and the parameter-free encoder
positions) before building the TTA optimizer (:1505-1535); the engine now
masks the same leaf (``optax.masked`` in ``encdec_rl.py``).

Functional stand-ins, each documented:

- ``add_eos`` / ``token_lens_to_mask`` / ``mark_padding`` — the external
  ``lcasr.utils.lm_tools`` helpers, reconstructed from their call sites in
  ``calc_loss_enc_dec`` (:1282-1285: eos written at position len−1; mask =
  arange < len; padding marked −100 — the same semantics the engine and the
  builder oracle already pin to each other).
- ``model.generate`` — the external lcasr model method; stands in with the
  builder-pinned greedy full-prefix decode (``_torch_greedy``).  Horizon 4
  on both sides; the final-pass ``generate_enc_dec`` horizon is clamped to
  the matching 3 tokens via monkeypatch (the reference default of 256 is a
  budget constant, infeasible for the tiny fixture's CTC branch).
- identity ``SpecAugment`` under the zero-mask default config, as in the
  other lcasr loop pins.

The RL paths (grpo/maxrl) sample rollouts with torch multinomial RNG that
cannot be mirrored in JAX; their update math is pinned with fixed rollouts
in ``test_encdec_oracle.py`` instead.

The reference module objects are PUBLIC UNTRUSTED CONTENT used strictly as
numerical oracles; nothing from them is executed outside these tests.
"""

import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # reference-source loop oracles (enc-dec)

torch = pytest.importorskip("torch")
nn = torch.nn

import jax
import jax.numpy as jnp

import test_encdec_oracle as eo
import test_reference_oracle as bo
import test_reference_source_loop_oracle as lo

from dynamic_asr_eval_tpu.config import TTAConfig
from dynamic_asr_eval_tpu.models.convert import convert_encdec_checkpoint
from dynamic_asr_eval_tpu.models.encdec import EncDecConformer
from dynamic_asr_eval_tpu.tta.encdec_rl import EncDecDynamicEvalEngine

PARAMS_TOL = 5e-4
MAX_GENERATE = 4  # teacher horizon; ≤3 tokens keeps CTC feasible (see
                  # test_encdec_oracle.test_teacher_ce_engine_loop_parity)


# ---------------------------------------------------------------------------
# reference model-surface adapter around the torch mirror
# ---------------------------------------------------------------------------


class _RefLMDecoder(nn.Module):
    """``model.language_model_decoder`` surface consumed at lcasr/lib.py:
    1506,1519-1524,1634,1706 and inside ``generate_enc_dec`` (:1194-1198)."""

    def __init__(self, core):
        super().__init__()
        object.__setattr__(self, "_core", core)  # not a submodule
        self.pos_enc = core.pos_enc  # shared: the module the reference freezes
        self.layers = [
            [types.SimpleNamespace(fn=types.SimpleNamespace(dropout_p=0.0))]
            for _ in core.dec_layers
        ]
        self.dropout_emb = 0.0
        self.ff_out_dropout = 0.0

    def forward(self, tokens, a_hidden, a_lengths=None):
        return {"logits": self._core.decode(tokens, a_hidden)}


class _RefEncDecAdapter(nn.Module):
    """The reference enc-dec model surface over ``TorchEncDec``."""

    def __init__(self, core, ctc_loss_weight):
        super().__init__()
        self.core = core
        self.language_model_decoder = _RefLMDecoder(core)
        self.pos_enc = nn.Identity()  # encoder positions: rotary, no params
        self.ctc_loss_weight = ctc_loss_weight
        self.ctc_decoder = types.SimpleNamespace(
            num_classes=core.head.out_features
        )
        self.device = torch.device("cpu")

    def forward(self, audio_signal, text_sequence_bos=None, a_lengths=None):
        enc = self.core.encoder(audio_signal)
        out = {
            "a_hidden": enc["a_hidden"],
            "final_posteriors_ctc": enc["final_posteriors"],
            "length": torch.LongTensor(
                [enc["final_posteriors"].shape[1]] * audio_signal.shape[0]
            ),
        }
        if text_sequence_bos is not None:
            out["final_posteriors_lm"] = self.core.decode(
                text_sequence_bos, enc["a_hidden"]
            )
        return out

    @torch.no_grad()
    def generate(self, audio_signal, encoder_states=None, sample=False,
                 temperature=1.0):
        """External ``model.generate`` stand-in: greedy full-prefix decode
        (the builder-pinned convention, ``test_encdec_oracle._torch_greedy``);
        reuses the caller's encoder states like the reference does
        (:1581,1606-1608)."""
        assert not sample, "sampled decode unused in the teacher_ce pin"
        a_hidden = (encoder_states or self.forward(audio_signal))["a_hidden"]
        prefix, toks = [0], []
        for s in range(MAX_GENERATE):
            logits = self.core.decode(torch.LongTensor([prefix]), a_hidden)
            nxt = int(logits[0, -1].argmax())
            if nxt == 0 or s >= MAX_GENERATE - 1:  # eos or horizon
                break
            toks.append(nxt)
            prefix.append(nxt)
        return {"text_sequence": toks}


# lcasr.utils.lm_tools stand-ins (semantics from the call sites at
# lcasr/lib.py:1280-1285, identical to the builder-pinned
# test_encdec_oracle._torch_calc_loss_enc_dec)


def _add_eos(targets, eos_id, token_lens):
    for i in range(targets.shape[0]):
        targets[i, int(token_lens[i]) - 1] = eos_id
    return targets


def _token_lens_to_mask(token_lens, max_len=None):
    T = int(token_lens.max()) if max_len is None else max_len
    return torch.arange(T)[None, :] < token_lens[:, None]


def _mark_padding(targets, mask, pad_id):
    return targets.masked_fill(~mask, pad_id)


def _ref_lib():
    lib = lo._ref_lib_runnable()
    lib.add_eos = _add_eos
    lib.token_lens_to_mask = _token_lens_to_mask
    lib.mark_padding = _mark_padding
    return lib


def _adapter_params_to_tree(adapter, updated):
    """Reference ``return_params`` list aligns with ``model.parameters()``
    order; all its entries live under the ``core.`` prefix (the shared
    ``pos_enc`` dedupes there)."""
    sd = {k: v.detach().numpy() for k, v in adapter.core.state_dict().items()}
    for (name, _), q in zip(adapter.named_parameters(), updated):
        assert name.startswith("core."), name
        sd[name[len("core."):]] = q.detach().numpy()
    variables, unmatched = convert_encdec_checkpoint(sd)
    assert unmatched == [], unmatched
    return variables["params"]


@pytest.mark.parametrize("epochs,seed", [(1, 5), (2, 9)])
def test_teacher_ce_matches_reference_source(epochs, seed, monkeypatch):
    lib = _ref_lib()
    torch.manual_seed(seed)
    tm = eo.TorchEncDec(eo.DIMS, **eo.DEC).eval()
    cfg = eo.EncDecConfig(
        encoder=eo.ConformerConfig(compute_dtype=jnp.float32, **eo.DIMS),
        bos_id=0, eos_id=0, ctc_loss_weight=0.3, **eo.DEC,
    )
    variables, unmatched = convert_encdec_checkpoint(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    )
    assert unmatched == [], unmatched
    variables = jax.tree.map(np.array, variables)  # break torch aliasing
    adapter = _RefEncDecAdapter(tm, cfg.ctc_loss_weight)

    lr = 1e-4
    seq_len = 64
    spec = np.random.default_rng(seed).standard_normal(
        (16, 224)).astype(np.float32)

    # clamp the final-pass AR horizon to the engine's (3 tokens at
    # max_generate=4); the reference's 256 default is a budget constant
    orig_gen = lib.generate_enc_dec
    monkeypatch.setattr(
        lib, "generate_enc_dec",
        lambda model, audio_signal, **kw: orig_gen(
            model, audio_signal, **{**kw, "max_generate": MAX_GENERATE - 1}),
    )

    args = lo._args(lr, epochs=epochs, shuffle=False,
                    training_mode="teacher_ce")
    ref_out, ref_params = lib.enc_dec_dynamic_eval(
        args, adapter, torch.from_numpy(spec)[None], seq_len, 0,
        eo._IdTokenizer(), use_tqdm=False, optim=bo.TorchMadgrad,
        return_params=True,
    )

    model = EncDecConformer(cfg)
    engine = EncDecDynamicEvalEngine(
        model, variables, cfg, TTAConfig(epochs=epochs, shuffle=False,
                                         optim_args={"lr": lr}),
        training_mode="teacher_ce", max_generate=MAX_GENERATE,
    )
    with jax.disable_jit():  # XLA:CPU miscompile guard (test_encdec_oracle)
        transcript, j_params, _ = engine(
            variables, spec, seq_len, eo._IdTokenizer(), return_params=True,
        )

    assert transcript == ref_out, (transcript, ref_out)
    assert len(ref_out) > 0, "degenerate fixture: empty final transcript"
    ref_tree = _adapter_params_to_tree(adapter, ref_params)
    d = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max()),
        j_params, ref_tree)))
    assert d < PARAMS_TOL, d
    # the freeze must have held: pos_enc identical to the starting weights
    dec = j_params["language_model_decoder"]
    moved = float(jnp.abs(
        jnp.asarray(dec["pos_enc"]["embedding"])
        - jnp.asarray(
            variables["params"]["language_model_decoder"]["pos_enc"]["embedding"])
    ).max())
    assert moved == 0.0, moved
