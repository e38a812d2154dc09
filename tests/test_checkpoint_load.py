"""End-to-end loading of reference torch checkpoints by the drivers.

The reference's drivers do ``torch.load(path) → checkpoint['config'] →
load_model → strict=False state-dict load`` (``lcasr/run.py:37-47``).  These
tests prove the one-call equivalents here:

- ``load_any_checkpoint`` sniffs native-vs-torch format, recovers the model
  config (pickled config dict, OmegaConf-pickled config via the permissive
  stub, or pure weight-shape inference), converts through the oracle-proven
  rules, and overlays with strict=False semantics;
- ``load_encdec_torch_checkpoint`` does the same for the enc-dec family.

Conversion VALUE fidelity is proven elsewhere (tests/test_conformer_oracle.py,
tests/test_encdec_oracle.py); here the subject is the plumbing: config
recovery, format sniffing, DDP prefixes, strict=False, and shape-mismatch
failure.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dynamic_asr_eval_tpu.models.checkpoint import (
    infer_conformer_dims,
    load_any_checkpoint,
    load_encdec_torch_checkpoint,
    load_reference_torch_checkpoint,
    save_checkpoint,
)
from dynamic_asr_eval_tpu.models.conformer import ConformerConfig, SCConformer
from dynamic_asr_eval_tpu.models.convert import convert_lcasr_checkpoint

sys.path.insert(0, os.path.dirname(__file__))
from torch_oracles import TorchEncDec, TorchSCConformer  # noqa: E402

DIMS = dict(feat_in=16, n_layers=2, d_model=32, n_heads=2, head_dim=16,
            vocab_size=32, subsampling_factor=8,
            subsampling_conv_channels=8, conv_kernel_size=9)


def _sd_np(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _torch_ckpt(tmp_path, state, config, name="ref.pt"):
    p = str(tmp_path / name)
    torch.save({"model": state, "config": config}, p)
    return p


def _ref_yaml_config(**overrides):
    """lcasr160rb1.yaml-shaped config structure with torch-only extras."""
    model = dict(DIMS)
    model.update(dropout_ff=0.0, flash_attn=False, subsampling="dw_striding",
                 subsampling_act="silu", encoder_mode="conformer",
                 default_norm="layer_norm", use_rotary=True,
                 rotary_base_freq=1_500_000, self_conditioning=True,
                 decoder_norm=True)
    model.update(overrides)
    return {"model": model, "model_class": "SCConformerXL",
            "training": {"dtype": "float32"}}


class TestLoadReferenceCheckpoint:
    @pytest.mark.slow
    def test_with_config_matches_direct_conversion(self, tmp_path):
        torch.manual_seed(0)
        tm = TorchSCConformer(**DIMS).eval()
        path = _torch_ckpt(tmp_path, tm.state_dict(), _ref_yaml_config())

        model, variables, cfg = load_reference_torch_checkpoint(
            path, compute_dtype=jnp.float32)
        assert (cfg.n_layers, cfg.d_model, cfg.n_heads, cfg.head_dim) == (
            DIMS["n_layers"], DIMS["d_model"], DIMS["n_heads"], DIMS["head_dim"])
        assert cfg.vocab_size == DIMS["vocab_size"]
        assert cfg.subsampling_factor == DIMS["subsampling_factor"]

        direct, unmatched = convert_lcasr_checkpoint(_sd_np(tm), "layer_norm")
        assert unmatched == []
        audio = np.random.default_rng(0).standard_normal(
            (2, DIMS["feat_in"], 64)).astype(np.float32)
        got = model.apply(variables, jnp.asarray(audio))["final_posteriors"]
        want = model.apply(direct, jnp.asarray(audio))["final_posteriors"]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_config_free_shape_inference(self, tmp_path):
        """A bare state dict (no config) must still load: every structural
        field comes from the weight shapes; the head split falls back with a
        warning (n_heads*head_dim == qkv width is still guaranteed)."""
        torch.manual_seed(1)
        tm = TorchSCConformer(**DIMS).eval()
        p = str(tmp_path / "bare.pt")
        torch.save(tm.state_dict(), p)

        model, variables, cfg = load_any_checkpoint(p, compute_dtype=jnp.float32)
        assert cfg.n_layers == DIMS["n_layers"]
        assert cfg.d_model == DIMS["d_model"]
        assert cfg.vocab_size == DIMS["vocab_size"]
        assert cfg.subsampling_factor == DIMS["subsampling_factor"]
        assert cfg.conv_kernel_size == DIMS["conv_kernel_size"]
        assert cfg.self_conditioning and cfg.decoder_norm
        assert cfg.n_heads * cfg.head_dim == DIMS["n_heads"] * DIMS["head_dim"]
        audio = np.random.default_rng(1).standard_normal(
            (1, DIMS["feat_in"], 64)).astype(np.float32)
        out = model.apply(variables, jnp.asarray(audio))["final_posteriors"]
        assert np.isfinite(np.asarray(out)).all()

    def test_ddp_prefixes_and_batch_renorm_detection(self, tmp_path):
        torch.manual_seed(2)
        tm = TorchSCConformer(default_norm="batch_renorm", **DIMS).eval()
        state = {f"module.{k}": v for k, v in tm.state_dict().items()}
        # config CLAIMS layer_norm; running stats in the weights must win
        path = _torch_ckpt(tmp_path, state,
                           _ref_yaml_config(default_norm="layer_norm"))
        model, variables, cfg = load_reference_torch_checkpoint(
            path, compute_dtype=jnp.float32, verbose=False)
        assert cfg.default_norm == "batch_renorm"
        assert "batch_stats" in variables

    def test_omegaconf_pickled_config(self, tmp_path):
        """Configs pickled as OmegaConf containers unpickle through the stub
        modules and unwrap to plain dicts (omegaconf is not installed)."""
        from dynamic_asr_eval_tpu.models.checkpoint import _install_omegaconf_stub

        _install_omegaconf_stub()
        import omegaconf.dictconfig as ocd
        import omegaconf.nodes as ocn

        def node(v):
            n = ocn.ValueNode.__new__(ocn.ValueNode)
            n.__dict__["_val"] = v
            return n

        def dconf(d):
            c = ocd.DictConfig.__new__(ocd.DictConfig)
            c.__dict__["_content"] = d
            c.__dict__["_metadata"] = None
            return c

        model_c = dconf({k: node(v) for k, v in DIMS.items()})
        cfg_obj = dconf({"model": model_c, "model_class": node("SCConformerXL")})

        torch.manual_seed(3)
        tm = TorchSCConformer(**DIMS).eval()
        path = _torch_ckpt(tmp_path, tm.state_dict(), cfg_obj, "oc.pt")
        model, variables, cfg = load_reference_torch_checkpoint(
            path, compute_dtype=jnp.float32, verbose=False)
        assert (cfg.n_heads, cfg.head_dim) == (DIMS["n_heads"], DIMS["head_dim"])
        assert cfg.vocab_size == DIMS["vocab_size"]

    def test_strict_false_keeps_init_for_missing(self, tmp_path):
        torch.manual_seed(4)
        tm = TorchSCConformer(**DIMS).eval()
        state = dict(tm.state_dict())
        # drop the final-norm params of layer 0 — strict=False must keep init
        dropped = [k for k in state if k.startswith("layers.0.norm_out")]
        for k in dropped:
            del state[k]
        assert dropped
        path = _torch_ckpt(tmp_path, state, _ref_yaml_config(), "partial.pt")
        model, variables, cfg = load_reference_torch_checkpoint(
            path, compute_dtype=jnp.float32, verbose=False)
        audio = np.random.default_rng(4).standard_normal(
            (1, DIMS["feat_in"], 64)).astype(np.float32)
        out = model.apply(variables, jnp.asarray(audio))["final_posteriors"]
        assert np.isfinite(np.asarray(out)).all()

    def test_shape_mismatch_raises(self, tmp_path):
        torch.manual_seed(5)
        tm = TorchSCConformer(**DIMS).eval()
        state = dict(tm.state_dict())
        state["decoder.weight"] = torch.zeros(7, DIMS["d_model"])  # wrong V
        # config pins the true vocab so the mismatch is detectable
        path = _torch_ckpt(tmp_path, state, _ref_yaml_config(), "bad.pt")
        with pytest.raises(ValueError, match="shape mismatch"):
            load_reference_torch_checkpoint(path, compute_dtype=jnp.float32,
                                            verbose=False)

    def test_native_format_still_sniffs(self, tmp_path):
        cfg = ConformerConfig(feat_in=16, n_layers=1, d_model=32, n_heads=2,
                              head_dim=16, vocab_size=32, subsampling_factor=4,
                              subsampling_conv_channels=8, conv_kernel_size=5,
                              compute_dtype=jnp.float32)
        model = SCConformer(cfg)
        x = jnp.zeros((1, 16, 64), jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x)
        p = str(tmp_path / "native.dae")
        save_checkpoint(p, variables, cfg)
        model2, v2, cfg2 = load_any_checkpoint(p)
        assert cfg2.d_model == 32 and cfg2.n_layers == 1

    def test_infer_dims(self):
        torch.manual_seed(6)
        tm = TorchSCConformer(**DIMS).eval()
        dims = infer_conformer_dims(_sd_np(tm))
        assert dims["n_layers"] == DIMS["n_layers"]
        assert dims["d_model"] == DIMS["d_model"]
        assert dims["vocab_size"] == DIMS["vocab_size"]
        assert dims["subsampling_factor"] == DIMS["subsampling_factor"]
        assert dims["conv_kernel_size"] == DIMS["conv_kernel_size"]
        assert dims["expansion_factor"] == 4
        assert dims["_attn_total"] == DIMS["n_heads"] * DIMS["head_dim"]


class TestLoadEncDecCheckpoint:
    def test_roundtrip_matches_direct_conversion(self, tmp_path):
        enc_kwargs = dict(feat_in=16, n_layers=1, d_model=32, n_heads=2,
                          head_dim=16, vocab_size=32, subsampling_factor=4,
                          subsampling_conv_channels=8, conv_kernel_size=9)
        torch.manual_seed(7)
        tm = TorchEncDec(enc_kwargs, decoder_layers=2, decoder_d_model=32,
                         decoder_heads=2, decoder_ff_mult=4,
                         max_text_len=16).eval()
        path = _torch_ckpt(
            tmp_path, tm.state_dict(),
            {"model": {"encoder": dict(enc_kwargs), "decoder_layers": 2,
                       "decoder_d_model": 32, "decoder_heads": 2,
                       "decoder_ff_mult": 4, "max_text_len": 16}},
            "encdec.pt")
        model, variables, cfg = load_encdec_torch_checkpoint(
            path, compute_dtype=jnp.float32, verbose=False)
        assert cfg.decoder_layers == 2
        assert cfg.decoder_d_model == 32
        assert cfg.decoder_heads == 2
        assert cfg.max_text_len == 16
        assert cfg.encoder.vocab_size == 32

        audio = np.random.default_rng(7).standard_normal(
            (1, 16, 64)).astype(np.float32)
        out = model.apply(variables, jnp.asarray(audio))
        assert np.isfinite(np.asarray(out["final_posteriors_ctc"])).all()

    def test_decoder_dims_inferred_without_config(self, tmp_path):
        enc_kwargs = dict(feat_in=16, n_layers=1, d_model=32, n_heads=2,
                          head_dim=16, vocab_size=32, subsampling_factor=4,
                          subsampling_conv_channels=8, conv_kernel_size=9)
        # NB the torch twin (like the reference family) ties decoder width to
        # encoder width via the cross-attention projections
        torch.manual_seed(8)
        tm = TorchEncDec(enc_kwargs, decoder_layers=3, decoder_d_model=32,
                         decoder_heads=2, decoder_ff_mult=4,
                         max_text_len=24).eval()
        p = str(tmp_path / "encdec_bare.pt")
        torch.save({"model": tm.state_dict()}, p)
        model, variables, cfg = load_encdec_torch_checkpoint(
            p, compute_dtype=jnp.float32, verbose=False)
        assert cfg.decoder_layers == 3
        assert cfg.decoder_d_model == 32
        assert cfg.max_text_len == 24
        # head split falls back with n_heads·head_dim == the qkv width
        assert cfg.decoder_heads * cfg.head_dim == 32
