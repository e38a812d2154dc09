import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_asr_eval_tpu.config import SpecAugmentConfig, TTAConfig
from dynamic_asr_eval_tpu.models.conformer import ConformerConfig
from dynamic_asr_eval_tpu.models.encdec import (
    EncDecConfig,
    generate_encdec,
    init_encdec,
)
from dynamic_asr_eval_tpu.text import CharTokenizer
from dynamic_asr_eval_tpu.tta.encdec_rl import (
    EncDecDynamicEvalEngine,
    calc_rewards,
    enc_dec_inference,
)
from dynamic_asr_eval_tpu.tta.filters import (
    TeacherFilterConfig,
    has_ngram_loop,
    longest_run,
    should_skip_teacher,
)


ENC = ConformerConfig(
    feat_in=16, n_layers=1, d_model=32, n_heads=2, head_dim=16,
    vocab_size=29, subsampling_factor=4, subsampling_conv_channels=8,
    conv_kernel_size=5, compute_dtype=jnp.float32,
)
CFG = EncDecConfig(
    encoder=ENC, decoder_layers=1, decoder_d_model=32, decoder_heads=2,
    max_text_len=32,
)


@pytest.fixture(scope="module")
def encdec():
    return init_encdec(CFG, jax.random.PRNGKey(0), example_T=64)


class TestEncDecModel:
    def test_forward_shapes(self, encdec):
        model, variables = encdec
        x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 64)), jnp.float32)
        txt = jnp.asarray([[0, 3, 5]], jnp.int32)
        out = model.apply(variables, x, txt)
        assert out["final_posteriors_ctc"].shape == (1, 16, 30)
        assert out["final_posteriors_lm"].shape == (1, 3, 29)
        assert out["a_hidden"].shape == (1, 16, 32)

    def test_generate_terminates_and_caches_match_full_forward(self, encdec):
        model, variables = encdec
        x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 16, 64)), jnp.float32)
        toks, lens, enc_out = generate_encdec(
            model, variables, x, CFG, sample=1, greedy=True, max_generate=8
        )
        assert toks.shape == (1, 8)
        n = int(lens[0])
        # cached greedy decode must match step-by-step full forwards
        seq = [CFG.bos_id]
        for i in range(n + 1):
            out = model.apply(variables, x, jnp.asarray([seq], jnp.int32))
            nxt = int(jnp.argmax(out["final_posteriors_lm"][0, -1]))
            if nxt == CFG.eos_id or i >= n:
                break
            assert nxt == int(toks[0, i]), f"step {i} mismatch"
            seq.append(nxt)

    def test_sampled_generation_shapes(self, encdec):
        model, variables = encdec
        x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 16, 64)), jnp.float32)
        toks, lens, _ = generate_encdec(
            model, variables, x, CFG, sample=4, greedy=False, max_generate=6,
            rng=jax.random.PRNGKey(3),
        )
        assert toks.shape == (4, 6)
        assert lens.shape == (4,)


class TestFilters:
    def test_longest_run(self):
        assert longest_run([1, 1, 2, 2, 2, 3]) == (3, 2)
        assert longest_run([]) == (0, None)

    def test_ngram_loop(self):
        looped, gram, count = has_ngram_loop([1, 2, 1, 2, 1, 2], 2, 2)
        assert looped and gram == (1, 2) and count == 3
        assert not has_ngram_loop([1, 2, 3, 4], 2, 2)[0]

    def test_max_length_filter(self):
        cfg = TeacherFilterConfig(max_length=True, min_frames_per_token=8)
        skip, reason = should_skip_teacher(cfg, list(range(100)), "x", spec_frames=160)
        assert skip and "too many" in reason
        skip, _ = should_skip_teacher(cfg, list(range(10)), "x", spec_frames=160)
        assert not skip

    def test_repeated_words_filter(self):
        cfg = TeacherFilterConfig(repeated_words_enabled=True, max_consecutive_word_repeat=2)
        skip, reason = should_skip_teacher(cfg, [1], "the the the cat", 100)
        assert skip and "the" in reason

    def test_low_confidence_filter(self):
        cfg = TeacherFilterConfig(low_confidence_enabled=True, min_mean_max_prob=0.5)
        skip, _ = should_skip_teacher(cfg, [1], "x", 100, mean_max_prob=0.3)
        assert skip
        skip, _ = should_skip_teacher(cfg, [1], "x", 100, mean_max_prob=0.9)
        assert not skip


class TestRewards:
    def test_perfect_match(self):
        # sacrebleu scores 0 BLEU for exact matches shorter than 4 words
        # (no 4-grams) — reference behavior is identical, so a short perfect
        # match caps at (1 + 1 + 0)/3
        r = calc_rewards("hello world", ["hello world"])
        assert r[0] == pytest.approx(2 / 3, abs=1e-6)
        r4 = calc_rewards("the quick brown fox jumps", ["the quick brown fox jumps"])
        assert r4[0] == pytest.approx(1.0, abs=1e-6)

    def test_empty_both(self):
        assert calc_rewards("", [""])[0] == 1.0

    def test_empty_ref_penalty(self):
        assert calc_rewards("", ["some words here"]) == [-3.0]

    def test_worse_hyp_lower_reward(self):
        r = calc_rewards("the cat sat", ["the cat sat", "dog dog dog"])
        assert r[0] > r[1]


class TestEncDecTTA:
    def test_inference(self, encdec):
        model, variables = encdec
        tok = CharTokenizer()
        spec = np.random.default_rng(3).standard_normal((16, 100)).astype(np.float32)
        text = enc_dec_inference(model, variables, spec, 64, tok, CFG, max_generate=6)
        assert isinstance(text, str)

    @pytest.mark.parametrize("mode", ["teacher_ce", "grpo", "maxrl"])
    def test_tta_modes_run(self, encdec, mode):
        model, variables = encdec
        tok = CharTokenizer()
        tta = TTAConfig(
            seq_len=64, overlap=0, epochs=1, shuffle=False,
            spec_augment=SpecAugmentConfig(n_freq_masks=1, freq_mask_param=2),
            optim_args={"lr": 1e-4},
        )
        engine = EncDecDynamicEvalEngine(
            model, variables, CFG, tta, training_mode=mode,
            num_rollouts=3, max_generate=6,
        )
        spec = np.random.default_rng(4).standard_normal((16, 100)).astype(np.float32)
        transcript, params, elapsed = engine(
            variables, spec, 64, tok, rng=jax.random.PRNGKey(5), return_params=True
        )
        assert isinstance(transcript, str)
        assert params is not None
