"""Numerical checkpoint-conversion parity tests.

The point of the wav2vec2 backend is running the PUBLISHED HF weights
(reference ``wav2vec2/lib.py:20-23`` loads ``facebook/wav2vec2-base-960h``
via ``AutoModelForCTC``).  These tests instantiate a real (random-init)
torch ``transformers.Wav2Vec2ForCTC``, export its ``state_dict()`` — which
carries the real key names, including the weight-norm
``parametrizations.weight.original{0,1}`` pos-conv entries — convert with
``load_hf_weights``, and assert the flax forward matches the torch forward
to ~1e-4 on random audio.  Any mishandled key or architecture divergence
(norm placement, GELU flavor, pos-conv padding) fails loudly here.

Also covers the DDP-prefix torch-pickle round trip used by the LM loader.
"""

import pytest  # noqa: E402 (marker needs it first)

pytestmark = pytest.mark.slow  # real torch wav2vec2 parity

import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from dynamic_asr_eval_tpu.models.wav2vec2 import (
    Wav2Vec2Config,
    Wav2Vec2ForCTC,
    load_hf_weights,
)


def _small_hf_config(stable_layer_norm: bool):
    return transformers.Wav2Vec2Config(
        vocab_size=32,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=128,
        conv_dim=(24, 24, 24),
        conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2),
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=stable_layer_norm,
        feat_extract_norm="group" if not stable_layer_norm else "layer",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )


def _ours_from_hf(hf_cfg) -> Wav2Vec2Config:
    return Wav2Vec2Config(
        vocab_size=hf_cfg.vocab_size,
        hidden=hf_cfg.hidden_size,
        n_layers=hf_cfg.num_hidden_layers,
        n_heads=hf_cfg.num_attention_heads,
        ff_dim=hf_cfg.intermediate_size,
        conv_dim=hf_cfg.conv_dim[0],
        conv_kernels=tuple(hf_cfg.conv_kernel),
        conv_strides=tuple(hf_cfg.conv_stride),
        pos_conv_kernel=hf_cfg.num_conv_pos_embeddings,
        pos_conv_groups=hf_cfg.num_conv_pos_embedding_groups,
        stable_layer_norm=hf_cfg.do_stable_layer_norm,
    )


def test_hf_state_dict_has_weightnorm_keys():
    """Guard: the real HF export format is what we think it is."""
    hf_cfg = _small_hf_config(stable_layer_norm=False)
    torch_model = transformers.Wav2Vec2ForCTC(hf_cfg)
    keys = set(torch_model.state_dict().keys())
    pcp = "wav2vec2.encoder.pos_conv_embed.conv"
    assert (
        f"{pcp}.parametrizations.weight.original0" in keys
        or f"{pcp}.weight_g" in keys
    ), sorted(k for k in keys if "pos_conv" in k)


def test_wav2vec2_base_forward_parity():
    """Converted flax forward ≡ torch forward (wav2vec2-base topology:
    post-norm blocks, group-norm feature extractor)."""
    torch.manual_seed(0)
    hf_cfg = _small_hf_config(stable_layer_norm=False)
    torch_model = transformers.Wav2Vec2ForCTC(hf_cfg).eval()

    cfg = _ours_from_hf(hf_cfg)
    model = Wav2Vec2ForCTC(cfg)
    variables = load_hf_weights(torch_model.state_dict(), cfg)

    audio = np.random.default_rng(0).standard_normal((2, 2000)).astype(np.float32)
    with torch.no_grad():
        t_logits = torch_model(torch.from_numpy(audio)).logits.numpy()
    t_logp = t_logits - np.log(np.exp(t_logits).sum(-1, keepdims=True))

    out = model.apply(variables, audio)
    j_logp = np.asarray(out["final_posteriors"], np.float32)

    assert j_logp.shape == t_logp.shape, (j_logp.shape, t_logp.shape)
    assert np.abs(j_logp - t_logp).max() < 1e-4, np.abs(j_logp - t_logp).max()
    # downsampled lengths must agree with HF's formula
    t_len = torch_model._get_feat_extract_output_lengths(2000)
    assert int(out["length"][0]) == int(t_len)


def test_wav2vec2_ddp_prefix_and_numpy_values():
    """A DDP-saved (``module.``-prefixed) dict converts identically."""
    torch.manual_seed(1)
    hf_cfg = _small_hf_config(stable_layer_norm=False)
    torch_model = transformers.Wav2Vec2ForCTC(hf_cfg).eval()
    sd = torch_model.state_dict()
    prefixed = {f"module.{k}": v.numpy() for k, v in sd.items()}

    cfg = _ours_from_hf(hf_cfg)
    a = load_hf_weights(sd, cfg)
    b = load_hf_weights(prefixed, cfg)
    import jax

    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_wav2vec2_large_stable_layer_norm_blocks():
    """Pre-norm (lv60-style) blocks: parity on the encoder stack.  The large
    family also uses per-layer conv layer norms in the feature extractor
    (feat_extract_norm='layer'), which this backend does not model — so
    parity is asserted from the feature-projection input onward by feeding
    the torch feature-extractor output into both encoder stacks."""
    torch.manual_seed(2)
    hf_cfg = _small_hf_config(stable_layer_norm=True)
    torch_model = transformers.Wav2Vec2ForCTC(hf_cfg).eval()

    cfg = _ours_from_hf(hf_cfg)
    model = Wav2Vec2ForCTC(cfg)
    # build our param tree; feature-extractor keys differ under
    # feat_extract_norm='layer', so convert everything except the extractor
    sd = {k: v for k, v in torch_model.state_dict().items()}
    base_like = _small_hf_config(stable_layer_norm=False)
    donor = transformers.Wav2Vec2ForCTC(base_like).state_dict()
    for k in list(sd.keys()):
        if "feature_extractor" in k:
            del sd[k]
    for k, v in donor.items():
        if "feature_extractor" in k:
            sd[k] = v
    variables = load_hf_weights(sd, cfg)

    feats = torch.randn(1, 13, hf_cfg.conv_dim[-1])
    with torch.no_grad():
        h, _ = torch_model.wav2vec2.feature_projection(feats)
        enc = torch_model.wav2vec2.encoder(h).last_hidden_state
        t_logits = torch_model.lm_head(enc).numpy()

    import jax.numpy as jnp
    from flax.core import freeze

    p = variables["params"]

    def encoder_only(p, feats):
        import jax

        x = feats
        mask = jnp.ones(x.shape[:2], bool)
        import flax.linen as fnn

        h = fnn.LayerNorm(epsilon=cfg.layer_norm_eps, name="proj_norm").apply(
            {"params": p["proj_norm"]}, x)
        h = fnn.Dense(cfg.hidden, name="proj").apply({"params": p["proj"]}, h)
        kpos = cfg.pos_conv_kernel
        pos = fnn.Conv(cfg.hidden, (kpos,), padding=((kpos // 2, (kpos - 1) // 2),),
                       feature_group_count=cfg.pos_conv_groups).apply(
            {"params": p["pos_conv"]}, h)
        h = h + jax.nn.gelu(pos, approximate=False)
        from dynamic_asr_eval_tpu.models.wav2vec2 import EncoderBlock

        for i in range(cfg.n_layers):
            h = EncoderBlock(cfg).apply({"params": p[f"layer_{i}"]}, h, mask)
        h = fnn.LayerNorm(epsilon=cfg.layer_norm_eps, name="enc_norm").apply(
            {"params": p["enc_norm"]}, h)
        return fnn.Dense(cfg.vocab_size, name="lm_head").apply(
            {"params": p["lm_head"]}, h)

    j_logits = np.asarray(encoder_only(p, jnp.asarray(feats.numpy())))
    assert np.abs(j_logits - t_logits).max() < 1e-4


def test_ddp_prefix_torch_pickle_roundtrip(tmp_path):
    """DDP-saved torch .pt pickles round-trip through convert_from_ddp."""
    from dynamic_asr_eval_tpu.models.checkpoint import convert_from_ddp

    sd = {"module.layers.0.weight": torch.randn(3, 3),
          "module.bias": torch.randn(3)}
    path = tmp_path / "lm.pt"
    torch.save({"model": sd}, path)
    loaded = torch.load(path, map_location="cpu", weights_only=True)["model"]
    clean = convert_from_ddp(loaded)
    assert set(clean.keys()) == {"layers.0.weight", "bias"}
    np.testing.assert_array_equal(
        clean["layers.0.weight"].numpy(), sd["module.layers.0.weight"].numpy()
    )
