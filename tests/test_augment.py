import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_asr_eval_tpu.augment import (
    spec_augment,
    cutout,
    frame_shuffle,
    add_random_noise,
    apply_augmentation_pipeline,
)
from dynamic_asr_eval_tpu.config import CutoutConfig, FrameShuffleConfig, SpecAugmentConfig


KEY = jax.random.PRNGKey(0)


def spec(F=16, T=64, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal((F, T)), jnp.float32)


class TestSpecAugment:
    def test_noop_config(self):
        s = spec()
        out = spec_augment(s, KEY, SpecAugmentConfig())
        np.testing.assert_array_equal(np.asarray(out), np.asarray(s))

    def test_freq_masks_zero(self):
        s = spec()
        cfg = SpecAugmentConfig(n_freq_masks=3, freq_mask_param=4, zero_masking=True)
        out = np.asarray(spec_augment(s, KEY, cfg))
        # some full rows zeroed, others untouched
        zero_rows = (out == 0).all(axis=1)
        assert zero_rows.any()
        untouched = ~zero_rows
        np.testing.assert_array_equal(out[untouched], np.asarray(s)[untouched])

    def test_freq_masks_mean_fill(self):
        s = spec()
        cfg = SpecAugmentConfig(n_freq_masks=2, freq_mask_param=4, zero_masking=False)
        out = np.asarray(spec_augment(s, KEY, cfg))
        m = float(np.asarray(s).mean())
        masked_rows = np.isclose(out, m).all(axis=1)
        assert masked_rows.any()

    def test_time_masks_absolute(self):
        s = spec()
        cfg = SpecAugmentConfig(n_time_masks=2, time_mask_param=8, zero_masking=True)
        out = np.asarray(spec_augment(s, KEY, cfg))
        zero_cols = (out == 0).all(axis=0)
        assert zero_cols.any() and not zero_cols.all()

    def test_time_masks_proportional(self):
        s = spec()
        cfg = SpecAugmentConfig(n_time_masks=2, time_mask_param=-1, min_p=0.2, max_p=0.5, zero_masking=True)
        out = np.asarray(spec_augment(s, KEY, cfg))
        assert (out == 0).all(axis=0).any()

    def test_batched(self):
        s = jnp.stack([spec(seed=0), spec(seed=1)])
        cfg = SpecAugmentConfig(n_freq_masks=1, freq_mask_param=4, zero_masking=True)
        out = spec_augment(s, KEY, cfg)
        assert out.shape == s.shape

    def test_jittable(self):
        cfg = SpecAugmentConfig(n_freq_masks=2, freq_mask_param=4)
        f = jax.jit(lambda s, k: spec_augment(s, k, cfg))
        out = f(spec(), KEY)
        assert out.shape == (16, 64)


class TestCutout:
    def test_noop(self):
        s = spec()
        out = cutout(s, KEY, CutoutConfig(num_rectangles=0))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(s))

    def test_zero_rectangles_cut(self):
        s = jnp.abs(spec()) + 1.0  # strictly positive
        cfg = CutoutConfig(seq_len=64, cutout_val="zero", num_rectangles=4, max_width=10, max_height=5)
        out = np.asarray(cutout(s, KEY, cfg))
        assert (out == 0).any()

    def test_num_rectangles_scales_with_length(self):
        s = jnp.abs(spec()) + 1.0
        # actual length far below seq_len → 0 active rectangles
        cfg = CutoutConfig(seq_len=6400, cutout_val="zero", num_rectangles=4, max_width=10, max_height=5)
        out = np.asarray(cutout(s, KEY, cfg, actual_len=jnp.asarray(64)))
        assert (out > 0).all()

    def test_mean_fill_modes(self):
        s = spec()
        for mode in ["mean", "mean_recording"]:
            cfg = CutoutConfig(seq_len=64, cutout_val=mode, num_rectangles=3)
            out = np.asarray(cutout(s, KEY, cfg))
            assert np.isfinite(out).all()


class TestFrameShuffleNoise:
    def test_shuffle_time_permutes(self):
        s = spec()
        out = np.asarray(
            frame_shuffle(s, KEY, FrameShuffleConfig(time_dimension=True))
        )
        # content preserved as a multiset of columns
        a = np.sort(np.asarray(s), axis=1)
        b = np.sort(out, axis=1)
        np.testing.assert_allclose(a, b, rtol=1e-6)
        assert not np.array_equal(out, np.asarray(s))

    def test_shuffle_disabled(self):
        s = spec()
        out = frame_shuffle(s, KEY, FrameShuffleConfig())
        np.testing.assert_array_equal(np.asarray(out), np.asarray(s))

    def test_noise(self):
        s = spec()
        out = add_random_noise(s, KEY, 0.1)
        assert not np.array_equal(np.asarray(out), np.asarray(s))
        np.testing.assert_array_equal(np.asarray(add_random_noise(s, KEY, 0.0)), np.asarray(s))


class TestPipeline:
    def test_full_pipeline_jit(self):
        cfg_sa = SpecAugmentConfig(n_freq_masks=2, freq_mask_param=4)
        cfg_fs = FrameShuffleConfig()
        cfg_co = CutoutConfig(seq_len=64, num_rectangles=2)
        s = jnp.stack([spec()])

        @jax.jit
        def f(s, k):
            return apply_augmentation_pipeline(s, k, cfg_sa, cfg_fs, cfg_co, 0.05)

        out = f(s, KEY)
        assert out.shape == s.shape
        assert np.isfinite(np.asarray(out)).all()
