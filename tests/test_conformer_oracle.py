"""Value-level conversion parity for the conformer family (torch oracle).

wav2vec2 already has a <1e-4 forward-parity test against real torch
(``test_convert_parity.py``); these tests give the remaining two converter
families the same bar using the torch reference implementations in
``tests/torch_oracles.py``:

- lcasr-style SCConformerXL (rotary, macaron, dw-striding subsampling,
  self-conditioned CTC head) → ``models/convert.py`` rules
  (ref surface ``lcasr/run.py:37-47``, ``earnings_finetune/
  lcasr160rb1.yaml:1-29``);
- NeMo-style rel-pos conformer (Transformer-XL attention with pos_bias_u/v,
  batch-norm conv modules, ConvASRDecoder head) →
  ``models/nemo_convert.py`` (ref surface ``nvidia_ctc/lib.py:12-14``,
  ``lcasr_nemo/lib.py:24-29``).

A transposed kernel, a mis-fused qkv, a wrong rotary/rel-shift convention,
or a dropped batch-norm running stat fails these at value level.
"""

import pytest  # noqa: E402 (marker needs it first)

pytestmark = pytest.mark.slow  # torch conformer value oracles

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dynamic_asr_eval_tpu.models.conformer import ConformerConfig, SCConformer
from dynamic_asr_eval_tpu.models.convert import convert_lcasr_checkpoint
from dynamic_asr_eval_tpu.models.nemo_convert import convert_nemo_state_dict

from torch_oracles import TorchNeMoConformer, TorchSCConformer

TOL = 1e-4


def _sd_np(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _lcasr_pair(default_norm="layer_norm", seed=0):
    dims = dict(feat_in=16, n_layers=2, d_model=32, n_heads=2, head_dim=16,
                vocab_size=32, subsampling_factor=8,
                subsampling_conv_channels=8, conv_kernel_size=9)
    torch.manual_seed(seed)
    tm = TorchSCConformer(default_norm=default_norm, **dims).eval()
    cfg = ConformerConfig(default_norm=default_norm,
                          compute_dtype=jnp.float32, **dims)
    return tm, cfg


class TestLcasrOracle:
    def test_forward_parity_layer_norm(self):
        tm, cfg = _lcasr_pair("layer_norm")
        variables, unmatched = convert_lcasr_checkpoint(_sd_np(tm), cfg.default_norm)
        assert unmatched == [], unmatched

        audio = np.random.default_rng(0).standard_normal(
            (2, cfg.feat_in, 64)).astype(np.float32)
        with torch.no_grad():
            t_lp = tm(torch.from_numpy(audio))["final_posteriors"].numpy()
        j_lp = np.asarray(
            SCConformer(cfg).apply(variables, jnp.asarray(audio))["final_posteriors"]
        )
        assert j_lp.shape == t_lp.shape, (j_lp.shape, t_lp.shape)
        assert np.abs(j_lp - t_lp).max() < TOL, np.abs(j_lp - t_lp).max()

    def test_forward_parity_batch_renorm(self):
        """batch_renorm mid-norms: running statistics must land in the
        batch_stats collection and be used in eval mode."""
        tm, cfg = _lcasr_pair("batch_renorm", seed=1)
        # non-trivial running stats so a dropped stat changes the output
        g = torch.Generator().manual_seed(7)
        for block in tm.layers:
            block.conv.norm_mid.running_mean.copy_(
                torch.randn(cfg.d_model, generator=g) * 0.3)
            block.conv.norm_mid.running_var.copy_(
                torch.rand(cfg.d_model, generator=g) + 0.5)
        variables, unmatched = convert_lcasr_checkpoint(_sd_np(tm), cfg.default_norm)
        assert unmatched == [], unmatched
        assert "batch_stats" in variables

        audio = np.random.default_rng(1).standard_normal(
            (1, cfg.feat_in, 48)).astype(np.float32)
        with torch.no_grad():
            t_lp = tm(torch.from_numpy(audio))["final_posteriors"].numpy()
        j_lp = np.asarray(
            SCConformer(cfg).apply(variables, jnp.asarray(audio))["final_posteriors"]
        )
        assert np.abs(j_lp - t_lp).max() < TOL, np.abs(j_lp - t_lp).max()

    def test_odd_length_input(self):
        """ceil subsampling alignment: odd T exercises the right-edge padding
        of every strided stage."""
        tm, cfg = _lcasr_pair("layer_norm", seed=2)
        variables, _ = convert_lcasr_checkpoint(_sd_np(tm), cfg.default_norm)
        audio = np.random.default_rng(2).standard_normal(
            (1, cfg.feat_in, 53)).astype(np.float32)
        with torch.no_grad():
            t_lp = tm(torch.from_numpy(audio))["final_posteriors"].numpy()
        j_lp = np.asarray(
            SCConformer(cfg).apply(variables, jnp.asarray(audio))["final_posteriors"]
        )
        assert j_lp.shape == t_lp.shape
        assert np.abs(j_lp - t_lp).max() < TOL, np.abs(j_lp - t_lp).max()

    def test_rotary_interpolation_parity(self):
        """The long-context rotary interpolation knob
        (earnings_finetune/train.py:477-479) must mean the same thing on
        both sides."""
        dims = dict(feat_in=16, n_layers=1, d_model=32, n_heads=2, head_dim=16,
                    vocab_size=32, subsampling_factor=4,
                    subsampling_conv_channels=8, conv_kernel_size=9)
        torch.manual_seed(3)
        tm = TorchSCConformer(rotary_interpolation_factor=2.0, **dims).eval()
        cfg = ConformerConfig(rotary_interpolation_factor=2.0,
                              compute_dtype=jnp.float32, **dims)
        variables, _ = convert_lcasr_checkpoint(_sd_np(tm), cfg.default_norm)
        audio = np.random.default_rng(3).standard_normal(
            (1, cfg.feat_in, 64)).astype(np.float32)
        with torch.no_grad():
            t_lp = tm(torch.from_numpy(audio))["final_posteriors"].numpy()
        j_lp = np.asarray(
            SCConformer(cfg).apply(variables, jnp.asarray(audio))["final_posteriors"]
        )
        assert np.abs(j_lp - t_lp).max() < TOL, np.abs(j_lp - t_lp).max()


class TestNeMoOracle:
    def _pair(self, seed=0):
        dims = dict(feat_in=16, n_layers=2, d_model=32, n_heads=2, head_dim=16,
                    vocab_size=24, subsampling_factor=8,
                    subsampling_conv_channels=8, conv_kernel_size=9)
        torch.manual_seed(seed)
        tm = TorchNeMoConformer(**dims)
        # randomize the rel-pos biases (default zeros) and warm the batch-norm
        # running stats with a training-mode forward
        with torch.no_grad():
            for layer in tm.encoder.layers:
                layer.self_attn.pos_bias_u.normal_(0, 0.1)
                layer.self_attn.pos_bias_v.normal_(0, 0.1)
            tm.train()
            tm(torch.randn(2, dims["feat_in"], 96))
            tm.eval()
        cfg = ConformerConfig(
            position_encoding="rel_pos", input_xscale=True, bias_in_attn=True,
            bias_in_ff=True, self_conditioning=False, decoder_norm=False,
            default_norm="batch_norm", subsampling_act="relu",
            use_rotary=False, compute_dtype=jnp.float32, **dims)
        return tm, cfg

    def test_forward_parity(self):
        tm, cfg = self._pair()
        variables = convert_nemo_state_dict(tm.state_dict(), cfg)
        audio = np.random.default_rng(0).standard_normal(
            (2, cfg.feat_in, 64)).astype(np.float32)
        with torch.no_grad():
            t_lp = tm(torch.from_numpy(audio))["final_posteriors"].numpy()
        j_lp = np.asarray(
            SCConformer(cfg).apply(variables, jnp.asarray(audio))["final_posteriors"]
        )
        assert j_lp.shape == t_lp.shape, (j_lp.shape, t_lp.shape)
        assert np.abs(j_lp - t_lp).max() < TOL, np.abs(j_lp - t_lp).max()

    def test_forward_parity_odd_length(self):
        tm, cfg = self._pair(seed=1)
        variables = convert_nemo_state_dict(tm.state_dict(), cfg)
        audio = np.random.default_rng(1).standard_normal(
            (1, cfg.feat_in, 41)).astype(np.float32)
        with torch.no_grad():
            t_lp = tm(torch.from_numpy(audio))["final_posteriors"].numpy()
        j_lp = np.asarray(
            SCConformer(cfg).apply(variables, jnp.asarray(audio))["final_posteriors"]
        )
        assert j_lp.shape == t_lp.shape
        assert np.abs(j_lp - t_lp).max() < TOL, np.abs(j_lp - t_lp).max()
