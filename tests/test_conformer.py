import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_asr_eval_tpu.models import ConformerConfig, SCConformer, init_conformer


TINY = ConformerConfig(
    feat_in=16,
    n_layers=2,
    d_model=32,
    n_heads=2,
    head_dim=16,
    vocab_size=28,
    subsampling_factor=4,
    subsampling_conv_channels=16,
    conv_kernel_size=5,
    compute_dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def tiny_model():
    return init_conformer(TINY, jax.random.PRNGKey(0), example_T=64)


class TestConformerForward:
    def test_shapes_and_logprobs(self, tiny_model):
        model, variables = tiny_model
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 64)), jnp.float32)
        out = model.apply(variables, x)
        lp = out["final_posteriors"]
        assert lp.shape == (2, 16, 29)
        assert lp.dtype == jnp.float32
        # valid log-softmax rows
        np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=1e-4)
        assert out["length"].tolist() == [16, 16]

    def test_length_masking_invariance(self, tiny_model):
        """Padding frames beyond `length` must not change valid outputs."""
        model, variables = tiny_model
        rng = np.random.default_rng(1)
        x_short = jnp.asarray(rng.standard_normal((1, 16, 48)), jnp.float32)
        x_padded = jnp.concatenate(
            [x_short, jnp.asarray(rng.standard_normal((1, 16, 16)), jnp.float32)],
            axis=-1,
        )
        out_short = model.apply(variables, x_short)
        out_padded = model.apply(variables, x_padded, length=jnp.asarray([48]))
        T_valid = int(out_short["length"][0])
        a = np.asarray(out_short["final_posteriors"][0, :T_valid])
        b = np.asarray(out_padded["final_posteriors"][0, :T_valid])
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)

    def test_interim_posteriors(self, tiny_model):
        model, variables = tiny_model
        x = jnp.zeros((1, 16, 64), jnp.float32)
        out = model.apply(variables, x, return_interim=True)
        assert out["interim_posteriors"].shape == (1, 1, 16, 29)

    def test_subsampling_factor_8(self):
        cfg = ConformerConfig(
            feat_in=16, n_layers=1, d_model=32, n_heads=2, head_dim=16,
            vocab_size=28, subsampling_factor=8, subsampling_conv_channels=8,
            compute_dtype=jnp.float32,
        )
        model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=64)
        out = model.apply(variables, jnp.zeros((1, 16, 64), jnp.float32))
        assert out["final_posteriors"].shape[1] == 8

    def test_batch_renorm_variant(self):
        cfg = ConformerConfig(
            feat_in=16, n_layers=1, d_model=32, n_heads=2, head_dim=16,
            vocab_size=28, subsampling_factor=4, subsampling_conv_channels=8,
            default_norm="batch_renorm", compute_dtype=jnp.float32,
        )
        model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=64)
        assert "batch_stats" in variables
        x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 16, 64)), jnp.float32)
        out = model.apply(variables, x)  # eval mode: running stats
        assert np.isfinite(np.asarray(out["final_posteriors"])).all()
        # training mode mutates batch_stats
        out2, mutated = model.apply(
            variables, x, use_running_average=False, mutable=["batch_stats"]
        )
        new_mean = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
        old_mean = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
        assert not np.allclose(np.asarray(new_mean), np.asarray(old_mean))

    def test_jit_and_grad(self, tiny_model):
        model, variables = tiny_model
        x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 16, 64)), jnp.float32)

        @jax.jit
        def loss_fn(params):
            out = model.apply({"params": params}, x)
            return jnp.sum(out["final_posteriors"] ** 2)

        g = jax.grad(loss_fn)(variables["params"])
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(t)).all() for t in flat)
        assert any(float(jnp.abs(t).max()) > 0 for t in flat)

    def test_remat_subsampling_is_exact(self, tiny_model):
        """remat_subsampling changes only the backward-pass schedule
        (recompute instead of store); forward values and gradients must be
        bit-identical to the non-remat path with the same params."""
        import dataclasses

        model, variables = tiny_model
        cfg_r = dataclasses.replace(TINY, remat_subsampling=True)
        model_r = SCConformer(cfg_r)
        x = jnp.asarray(
            np.random.default_rng(7).standard_normal((2, 16, 64)), jnp.float32
        )

        lp = model.apply(variables, x)["final_posteriors"]
        lp_r = model_r.apply(variables, x)["final_posteriors"]
        np.testing.assert_array_equal(np.asarray(lp), np.asarray(lp_r))

        def loss(m):
            def f(params):
                out = m.apply({"params": params}, x)
                return jnp.sum(out["final_posteriors"] ** 2)
            return jax.jit(jax.grad(f))(variables["params"])

        g, g_r = loss(model), loss(model_r)
        for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)

    @pytest.mark.slow
    def test_bf16_attention_logits_close_to_f32(self):
        """attention_logits_in_compute_dtype narrows only the materialized
        [B,H,T,S] score tensor; outputs must stay within bf16 noise of the
        f32-scores path (same params)."""
        import dataclasses

        cfg = dataclasses.replace(TINY, compute_dtype=jnp.bfloat16)
        model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=64)
        cfg_bf = dataclasses.replace(cfg, attention_logits_in_compute_dtype=True)
        model_bf = SCConformer(cfg_bf)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 16, 64)), jnp.float32
        )
        lp = np.asarray(model.apply(variables, x)["final_posteriors"])
        lp_bf = np.asarray(model_bf.apply(variables, x)["final_posteriors"])
        assert np.max(np.abs(lp - lp_bf)) < 0.15
        np.testing.assert_allclose(np.exp(lp_bf).sum(-1), 1.0, rtol=1e-2)

    def test_bf16_head_close_to_f32(self):
        """head_in_compute_dtype narrows only the head matmul; log_softmax
        stays f32, so outputs must be valid log-probs within bf16 noise of
        the f32-head path (same params)."""
        import dataclasses

        cfg = dataclasses.replace(TINY, compute_dtype=jnp.bfloat16)
        model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=64)
        model_h = SCConformer(dataclasses.replace(cfg, head_in_compute_dtype=True))
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((2, 16, 64)), jnp.float32
        )
        lp = np.asarray(model.apply(variables, x)["final_posteriors"])
        lp_h = np.asarray(model_h.apply(variables, x)["final_posteriors"])
        assert np.max(np.abs(lp - lp_h)) < 0.15, np.max(np.abs(lp - lp_h))
        np.testing.assert_allclose(np.exp(lp_h).sum(-1), 1.0, rtol=1e-2)

    def test_rotary_changes_output(self):
        cfg_no = ConformerConfig(
            feat_in=16, n_layers=1, d_model=32, n_heads=2, head_dim=16,
            vocab_size=28, subsampling_factor=4, subsampling_conv_channels=8,
            use_rotary=False, compute_dtype=jnp.float32,
        )
        cfg_yes = ConformerConfig(**{**cfg_no.__dict__, "use_rotary": True})
        m1, v1 = init_conformer(cfg_no, jax.random.PRNGKey(0), example_T=64)
        m2, _ = init_conformer(cfg_yes, jax.random.PRNGKey(0), example_T=64)
        x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 16, 64)), jnp.float32)
        o1 = m1.apply(v1, x)["final_posteriors"]
        o2 = m2.apply(v1, x)["final_posteriors"]  # same params, rotary on
        assert not np.allclose(np.asarray(o1), np.asarray(o2))
