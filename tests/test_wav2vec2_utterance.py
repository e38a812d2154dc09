
import pytest

pytestmark = pytest.mark.slow  # wav2vec2 utterance end-to-end
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_asr_eval_tpu.augment.waveform import (
    additive_noise,
    simple_reverb,
    time_dropout,
    wav_augment_pipeline,
)
from dynamic_asr_eval_tpu.config import TTAConfig
from dynamic_asr_eval_tpu.models.wav2vec2 import (
    Wav2Vec2Config,
    Wav2Vec2ForCTC,
    feat_extract_output_lengths,
    init_wav2vec2,
    load_hf_weights,
)
from dynamic_asr_eval_tpu.tta.utterance import UtteranceTTAEngine


TINY = Wav2Vec2Config(
    vocab_size=30, hidden=32, n_layers=2, n_heads=2, ff_dim=64,
    conv_dim=16, pos_conv_kernel=16, pos_conv_groups=4,
)


@pytest.fixture(scope="module")
def w2v():
    return init_wav2vec2(TINY, jax.random.PRNGKey(0), example_T=3200)


class TestWav2Vec2Model:
    def test_forward_shapes(self, w2v):
        model, variables = w2v
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3200)) * 0.1, jnp.float32)
        out = model.apply(variables, x)
        T_out = int(feat_extract_output_lengths(TINY, 3200))
        assert out["final_posteriors"].shape == (2, T_out, 30)
        np.testing.assert_allclose(
            np.exp(np.asarray(out["final_posteriors"])).sum(-1), 1.0, rtol=1e-4
        )
        assert TINY.downsampling_factor == 320

    def test_engine_convention_input(self, w2v):
        """[B, 1, T] (engine layout) must equal [B, T]."""
        model, variables = w2v
        x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 3200)) * 0.1, jnp.float32)
        a = model.apply(variables, x)["final_posteriors"]
        b = model.apply(variables, x[:, None, :])["final_posteriors"]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_length_masking(self, w2v):
        model, variables = w2v
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 3200)) * 0.1, jnp.float32)
        xp = jnp.concatenate([x, jnp.asarray(rng.standard_normal((1, 640)), jnp.float32)], -1)
        a = model.apply(variables, x)["final_posteriors"]
        b = model.apply(variables, xp, length=jnp.asarray([3200]))["final_posteriors"]
        n = int(feat_extract_output_lengths(TINY, 3200))
        np.testing.assert_allclose(np.asarray(a[0, :n]), np.asarray(b[0, :n]), rtol=2e-3, atol=2e-4)

    def test_hf_conversion_mapping(self):
        """Synthetic HF-style state dict converts into a tree that the model
        accepts and that produces finite outputs."""
        rng = np.random.default_rng(3)
        cfg = TINY
        sd = {}
        ch_in = 1
        for i, (k, s) in enumerate(zip(cfg.conv_kernels, cfg.conv_strides)):
            sd[f"wav2vec2.feature_extractor.conv_layers.{i}.conv.weight"] = (
                rng.standard_normal((cfg.conv_dim, ch_in, k)).astype(np.float32) * 0.05
            )
            ch_in = cfg.conv_dim
        sd["wav2vec2.feature_extractor.conv_layers.0.layer_norm.weight"] = np.ones(cfg.conv_dim, np.float32)
        sd["wav2vec2.feature_extractor.conv_layers.0.layer_norm.bias"] = np.zeros(cfg.conv_dim, np.float32)
        sd["wav2vec2.feature_projection.layer_norm.weight"] = np.ones(cfg.conv_dim, np.float32)
        sd["wav2vec2.feature_projection.layer_norm.bias"] = np.zeros(cfg.conv_dim, np.float32)
        sd["wav2vec2.feature_projection.projection.weight"] = rng.standard_normal((cfg.hidden, cfg.conv_dim)).astype(np.float32) * 0.05
        sd["wav2vec2.feature_projection.projection.bias"] = np.zeros(cfg.hidden, np.float32)
        sd["wav2vec2.encoder.pos_conv_embed.conv.weight"] = rng.standard_normal(
            (cfg.hidden, cfg.hidden // cfg.pos_conv_groups, cfg.pos_conv_kernel)
        ).astype(np.float32) * 0.05
        sd["wav2vec2.encoder.pos_conv_embed.conv.bias"] = np.zeros(cfg.hidden, np.float32)
        sd["wav2vec2.encoder.layer_norm.weight"] = np.ones(cfg.hidden, np.float32)
        sd["wav2vec2.encoder.layer_norm.bias"] = np.zeros(cfg.hidden, np.float32)
        for i in range(cfg.n_layers):
            hf = f"wav2vec2.encoder.layers.{i}"
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                sd[f"{hf}.attention.{proj}.weight"] = rng.standard_normal((cfg.hidden, cfg.hidden)).astype(np.float32) * 0.05
                sd[f"{hf}.attention.{proj}.bias"] = np.zeros(cfg.hidden, np.float32)
            sd[f"{hf}.layer_norm.weight"] = np.ones(cfg.hidden, np.float32)
            sd[f"{hf}.layer_norm.bias"] = np.zeros(cfg.hidden, np.float32)
            sd[f"{hf}.final_layer_norm.weight"] = np.ones(cfg.hidden, np.float32)
            sd[f"{hf}.final_layer_norm.bias"] = np.zeros(cfg.hidden, np.float32)
            sd[f"{hf}.feed_forward.intermediate_dense.weight"] = rng.standard_normal((cfg.ff_dim, cfg.hidden)).astype(np.float32) * 0.05
            sd[f"{hf}.feed_forward.intermediate_dense.bias"] = np.zeros(cfg.ff_dim, np.float32)
            sd[f"{hf}.feed_forward.output_dense.weight"] = rng.standard_normal((cfg.hidden, cfg.ff_dim)).astype(np.float32) * 0.05
            sd[f"{hf}.feed_forward.output_dense.bias"] = np.zeros(cfg.hidden, np.float32)
        sd["lm_head.weight"] = rng.standard_normal((cfg.vocab_size, cfg.hidden)).astype(np.float32) * 0.05
        sd["lm_head.bias"] = np.zeros(cfg.vocab_size, np.float32)

        variables = load_hf_weights(sd, cfg)
        model = Wav2Vec2ForCTC(cfg)
        x = jnp.asarray(rng.standard_normal((1, 3200)) * 0.1, jnp.float32)
        out = model.apply(variables, x)
        assert np.isfinite(np.asarray(out["final_posteriors"])).all()


class TestWaveformAugment:
    def test_time_dropout_zeroes(self):
        w = jnp.ones((16000,))
        out = np.asarray(time_dropout(w, jax.random.PRNGKey(0), n_boxes=10))
        assert (out == 0).any() and (out == 1).any()

    def test_additive_noise_changes_signal(self):
        w = jnp.asarray(np.sin(np.linspace(0, 100, 16000)), jnp.float32)
        out = additive_noise(w, jax.random.PRNGKey(1))
        assert not np.array_equal(np.asarray(out), np.asarray(w))

    def test_reverb_preserves_shape_and_energy_scale(self):
        w = jnp.asarray(np.random.default_rng(2).standard_normal(8000) * 0.1, jnp.float32)
        out = simple_reverb(w, jax.random.PRNGKey(2))
        assert out.shape == w.shape
        assert float(jnp.abs(out).max()) < 10 * float(jnp.abs(w).max())

    def test_pipeline_jit_and_batch(self):
        w = jnp.asarray(np.random.default_rng(3).standard_normal((2, 8000)) * 0.1, jnp.float32)
        f = jax.jit(lambda w, k: wav_augment_pipeline(w, k, n_time_dropout=5))
        out = f(w, jax.random.PRNGKey(3))
        assert out.shape == w.shape


class TestUtteranceTTA:
    def test_utterance_engine_spec_domain(self):
        from dynamic_asr_eval_tpu.models import ConformerConfig, init_conformer

        cfg = ConformerConfig(
            feat_in=16, n_layers=1, d_model=32, n_heads=2, head_dim=16,
            vocab_size=28, subsampling_factor=4, subsampling_conv_channels=8,
            conv_kernel_size=5, compute_dtype=jnp.float32,
        )
        model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=256)
        utts = [
            {"spectrogram": np.random.default_rng(i).standard_normal((16, 100 + 30 * i)).astype(np.float32)}
            for i in range(3)
        ]
        engine = UtteranceTTAEngine(
            model, cfg.blank_id, cfg.subsampling_factor,
            TTAConfig(epochs=1, shuffle=False, optim_args={"lr": 1e-4}),
            accumulate_gradients=2,
        )
        outs, params, elapsed = engine(variables, utts, return_params=True)
        assert len(outs) == 3
        for o, u in zip(outs, utts):
            assert o.shape[0] == -(-u["spectrogram"].shape[1] // 4)
            assert np.isfinite(o).all()
        delta = max(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), variables["params"], params)))
        assert delta > 0

    def test_epochs_zero_falls_back_to_final_pass(self):
        """prob_collection='online' collects nothing when epochs=0; the
        engine must fall back to the inference pass and return the
        unadapted per-utterance log-probs (identical to 'final')."""
        from dynamic_asr_eval_tpu.models import ConformerConfig, init_conformer

        cfg = ConformerConfig(
            feat_in=16, n_layers=1, d_model=32, n_heads=2, head_dim=16,
            vocab_size=28, subsampling_factor=4, subsampling_conv_channels=8,
            conv_kernel_size=5, compute_dtype=jnp.float32,
        )
        model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=256)
        utts = [
            {"spectrogram": np.random.default_rng(9).standard_normal((16, 90)).astype(np.float32)}
        ]
        tta = TTAConfig(epochs=0, shuffle=False, optim_args={"lr": 1e-4})
        on = UtteranceTTAEngine(model, cfg.blank_id, cfg.subsampling_factor, tta,
                                prob_collection="online")
        fin = UtteranceTTAEngine(model, cfg.blank_id, cfg.subsampling_factor, tta,
                                 prob_collection="final")
        o_on, _, _ = on(variables, utts)
        o_fin, _, _ = fin(variables, utts)
        assert len(o_on) == 1 and o_on[0].shape == o_fin[0].shape
        np.testing.assert_array_equal(o_on[0], o_fin[0])

    def test_utterance_engine_waveform_domain(self, w2v):
        from dynamic_asr_eval_tpu.augment.waveform import wav_augment_pipeline

        model, variables = w2v

        def aug(batch, key, length):  # [B, 1, W]
            return wav_augment_pipeline(batch[:, 0, :], key, n_time_dropout=5)[:, None, :]

        utts = [{"spectrogram": (np.random.default_rng(i).standard_normal(2400) * 0.1).astype(np.float32)}
                for i in range(2)]
        engine = UtteranceTTAEngine(
            model, TINY.blank_id, TINY.downsampling_factor,
            TTAConfig(epochs=1, shuffle=False, optim_args={"lr": 1e-5}),
            augment_fn=aug,
        )
        outs, _, _ = engine(variables, utts)
        assert len(outs) == 2 and all(np.isfinite(o).all() for o in outs)

    def test_external_pseudo_labels(self):
        from dynamic_asr_eval_tpu.models import ConformerConfig, init_conformer

        cfg = ConformerConfig(
            feat_in=16, n_layers=1, d_model=32, n_heads=2, head_dim=16,
            vocab_size=28, subsampling_factor=4, subsampling_conv_channels=8,
            conv_kernel_size=5, compute_dtype=jnp.float32,
        )
        model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=256)
        calls = []

        def pseudo(variables, utterance, length):
            calls.append(length)
            return [3, 5, 7]

        engine = UtteranceTTAEngine(
            model, cfg.blank_id, cfg.subsampling_factor,
            TTAConfig(epochs=1, shuffle=False, optim_args={"lr": 1e-4}),
            pseudo_label_fn=pseudo,
        )
        utts = [{"spectrogram": np.random.default_rng(0).standard_normal((16, 120)).astype(np.float32)}]
        outs, _, _ = engine(variables, utts)
        assert calls == [120]

    def test_soft_dtw_weight(self):
        from dynamic_asr_eval_tpu.models import ConformerConfig, init_conformer

        cfg = ConformerConfig(
            feat_in=16, n_layers=1, d_model=32, n_heads=2, head_dim=16,
            vocab_size=28, subsampling_factor=4, subsampling_conv_channels=8,
            conv_kernel_size=5, compute_dtype=jnp.float32,
        )
        model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=256)
        engine = UtteranceTTAEngine(
            model, cfg.blank_id, cfg.subsampling_factor,
            TTAConfig(epochs=1, shuffle=False, optim_args={"lr": 1e-4}),
            soft_dtw_weight=0.1,
        )
        utts = [{"spectrogram": np.random.default_rng(0).standard_normal((16, 100)).astype(np.float32)}]
        outs, _, _ = engine(variables, utts)
        assert np.isfinite(outs[0]).all()
