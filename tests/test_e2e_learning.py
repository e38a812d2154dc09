"""End-to-end learning validation on a synthetic ASR world.

This is the test the reference verifies only empirically (WER tables): that
the NSTI loop actually *improves* recognition under domain shift.  A tiny
conformer is CTC-trained on a synthetic token→spectral-pattern world, the
test distribution is corrupted with a gain tilt + noise, and dynamic eval
must recover a substantial part of the gap.

Also guards the pseudo-label truncation regression: with dense transcripts
(1 token per 8 frames), a max-token cap below the true rate silently chops
pseudo-labels and *degrades* the model during adaptation (this exact bug
shipped with max_label_frames_ratio=0.25 and was caught by this scenario).
"""

import pytest  # noqa: E402 (marker needs it first)

pytestmark = pytest.mark.slow  # end-to-end learning runs

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from dynamic_asr_eval_tpu.config import SpecAugmentConfig, TTAConfig
from dynamic_asr_eval_tpu.models import ConformerConfig, init_conformer
from dynamic_asr_eval_tpu.ops.ctc import ctc_loss, greedy_decode
from dynamic_asr_eval_tpu.text import CharTokenizer, word_error_rate_detail
from dynamic_asr_eval_tpu.tta import DynamicEvalEngine


TOK = CharTokenizer()
F, FR = 16, 8
PROTO = np.random.default_rng(0).standard_normal((TOK.vocab_size(), F)).astype(np.float32) * 2
WORDS = ["the cat sat", "a dog ran fast", "we like speech", "test time works",
         "hello world now", "adapt the model", "long context eval", "tokens are fun"]
TEST_TEXTS = ["we like speech", "hello world now", "the cat sat", "a dog ran fast"]


def render(text, noise=0.3, corrupt=0.0, seed=0):
    r = np.random.default_rng(seed)
    ids = TOK.encode(text)
    spec = np.zeros((F, len(ids) * FR), np.float32)
    for i, t in enumerate(ids):
        spec[:, i * FR : (i + 1) * FR] = PROTO[t][:, None]
    spec += r.standard_normal(spec.shape).astype(np.float32) * noise
    if corrupt:
        tilt = 1.0 + corrupt * np.linspace(-1, 1, F)[:, None].astype(np.float32)
        spec = spec * tilt + r.standard_normal(spec.shape).astype(np.float32) * corrupt
    return spec


@pytest.fixture(scope="module")
def pretrained():
    cfg = ConformerConfig(
        feat_in=F, n_layers=2, d_model=48, n_heads=2, head_dim=24,
        vocab_size=TOK.vocab_size(), subsampling_factor=4,
        subsampling_conv_channels=8, conv_kernel_size=5,
        compute_dtype=jnp.float32,
    )
    model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=64)
    params = variables["params"]
    opt = optax.adam(3e-3)
    ost = opt.init(params)

    @jax.jit
    def step(p, s, spec, labels, lab_len):
        def lf(p):
            out = model.apply({"params": p}, spec[None])
            lp = out["final_posteriors"]
            return ctc_loss(lp, out["length"], labels[None], lab_len[None],
                            blank_id=cfg.blank_id) / lp.shape[1]
        l, g = jax.value_and_grad(lf)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    maxlab = 24
    for i in range(400):
        w = WORDS[i % len(WORDS)]
        ids = TOK.encode(w)
        lab = np.zeros(maxlab, np.int32)
        lab[: len(ids)] = ids
        params, ost, _ = step(params, ost, jnp.asarray(render(w, seed=i)),
                              jnp.asarray(lab), jnp.asarray(len(ids)))
    return cfg, model, params


def wer_on(model, cfg, params, corrupt):
    hyps, refs = [], []
    for i, t in enumerate(TEST_TEXTS):
        spec = render(t, corrupt=corrupt, seed=1000 + i)
        out = model.apply({"params": params}, jnp.asarray(spec)[None])
        hyps.append(greedy_decode(np.asarray(out["final_posteriors"][0]), TOK, cfg.blank_id))
        refs.append(t)
    return word_error_rate_detail(hyps, refs)[0]


class TestEndToEndLearning:
    def test_pretraining_reaches_zero_wer_in_domain(self, pretrained):
        cfg, model, params = pretrained
        assert wer_on(model, cfg, params, corrupt=0.0) == 0.0

    def test_nsti_improves_under_domain_shift(self, pretrained):
        cfg, model, params = pretrained
        C = 0.7
        before = wer_on(model, cfg, params, C)
        assert before > 0.1, "corruption should hurt the un-adapted model"

        long_spec = render(" ".join(WORDS * 3), corrupt=C, seed=5)
        tta = TTAConfig(
            seq_len=256, overlap=128, epochs=2, shuffle=False,
            spec_augment=SpecAugmentConfig(n_freq_masks=1, freq_mask_param=3),
            optim_args={"lr": 1e-4},
        )
        engine = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor, tta)
        res = engine({"params": params}, long_spec, return_params=True,
                     rng=jax.random.PRNGKey(1))
        after = wer_on(model, cfg, res.params, C)
        assert after < before, f"NSTI must improve WER ({before:.3f} -> {after:.3f})"
        assert after <= before / 2, f"expected substantial recovery, got {after:.3f}"

    def test_adaptation_on_clean_data_is_benign(self, pretrained):
        """Self-training with dense transcripts must not degrade a good model
        (regression test for the pseudo-label truncation bug)."""
        cfg, model, params = pretrained
        long_spec = render(" ".join(WORDS * 3), corrupt=0.0, seed=5)
        tta = TTAConfig(
            seq_len=256, overlap=128, epochs=1, shuffle=False,
            spec_augment=SpecAugmentConfig(n_freq_masks=1, freq_mask_param=3),
            optim_args={"lr": 3e-5},
        )
        engine = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor, tta)
        res = engine({"params": params}, long_spec, return_params=True,
                     rng=jax.random.PRNGKey(1))
        assert wer_on(model, cfg, res.params, 0.0) == 0.0


LONG_TEST_TEXTS = [f"{a} {b}" for a in TEST_TEXTS
                   for b in ["test time works", "adapt the model"]]


def wer_on_texts(model, cfg, params, corrupt, texts):
    hyps, refs = [], []
    for i, t in enumerate(texts):
        spec = render(t, corrupt=corrupt, seed=1000 + i)
        out = model.apply({"params": params}, jnp.asarray(spec)[None])
        hyps.append(greedy_decode(np.asarray(out["final_posteriors"][0]), TOK, cfg.blank_id))
        refs.append(t)
    return word_error_rate_detail(hyps, refs)[0]


class TestOtherEnginesImprove:
    C = 0.7

    def _long_spec(self):
        return render(" ".join(WORDS * 3), corrupt=self.C, seed=5)

    def test_awmc_improves_at_conservative_lr(self, pretrained):
        from dynamic_asr_eval_tpu.tta import AWMCEngine

        cfg, model, params = pretrained
        before = wer_on_texts(model, cfg, params, self.C, LONG_TEST_TEXTS)
        tta = TTAConfig(seq_len=256, overlap=128, epochs=1, shuffle=False,
                        spec_augment=SpecAugmentConfig(n_freq_masks=1, freq_mask_param=3),
                        optim_args={"lr": 1e-5}, ema_decay=0.999)
        engine = AWMCEngine(model, cfg.blank_id, cfg.subsampling_factor, tta)
        res = engine({"params": params}, self._long_spec(), return_params=True,
                     rng=jax.random.PRNGKey(1))
        after = wer_on_texts(model, cfg, res.params, self.C, LONG_TEST_TEXTS)
        assert after <= before, f"AWMC degraded WER {before:.3f} -> {after:.3f}"

    def test_consistency_improves(self, pretrained):
        from dynamic_asr_eval_tpu.tta import ConsistencyEngine

        cfg, model, params = pretrained
        before = wer_on_texts(model, cfg, params, self.C, LONG_TEST_TEXTS)
        tta = TTAConfig(seq_len=256, overlap=128, epochs=4, shuffle=False,
                        spec_augment=SpecAugmentConfig(n_freq_masks=1, freq_mask_param=3),
                        optim_args={"lr": 3e-3})
        engine = ConsistencyEngine(model, cfg.blank_id, cfg.subsampling_factor, tta)
        res = engine({"params": params}, self._long_spec(), return_params=True,
                     rng=jax.random.PRNGKey(1))
        p0 = jax.tree.map(lambda s: s[0], res.params)
        after = wer_on_texts(model, cfg, p0, self.C, LONG_TEST_TEXTS)
        assert after <= before, f"consistency degraded WER {before:.3f} -> {after:.3f}"

    def test_utterance_engine_improves(self, pretrained):
        from dynamic_asr_eval_tpu.tta.utterance import UtteranceTTAEngine

        cfg, model, params = pretrained
        before = wer_on_texts(model, cfg, params, self.C, LONG_TEST_TEXTS)
        utts = [{"spectrogram": render(w, corrupt=self.C, seed=50 + i)}
                for i, w in enumerate(WORDS * 2)]
        engine = UtteranceTTAEngine(
            model, cfg.blank_id, cfg.subsampling_factor,
            TTAConfig(epochs=2, shuffle=False,
                      spec_augment=SpecAugmentConfig(n_freq_masks=1, freq_mask_param=3),
                      optim_args={"lr": 1e-4}),
            accumulate_gradients=2,
        )
        _, p, _ = engine({"params": params}, utts, return_params=True,
                         rng=jax.random.PRNGKey(2))
        after = wer_on_texts(model, cfg, p, self.C, LONG_TEST_TEXTS)
        assert after < before, f"utterance TTA did not improve ({before:.3f} -> {after:.3f})"
