"""Parity of kernels/subsample.py (fused Pallas, interpret mode on CPU)
against models/conformer.py::DWStridingSubsampling — forward values and all
gradients, fp32, across even/ragged lengths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_asr_eval_tpu.kernels.subsample import fused_subsample
from dynamic_asr_eval_tpu.models.conformer import ConformerConfig, DWStridingSubsampling


def _cfg(C=16, F=16):
    return ConformerConfig(
        feat_in=F, n_layers=1, d_model=8, n_heads=1, head_dim=8,
        vocab_size=11, subsampling_factor=8, subsampling_conv_channels=C,
        conv_kernel_size=5, compute_dtype=jnp.float32,
    )


def _xla_stack_only(cfg, variables, x):
    """Run the module but stop before the final dense/norm: replicate by
    calling the module and inverting is impractical, so instead rebuild the
    pre-dense stack from its params (identical math to the module body)."""
    import flax.linen as nn

    p = variables["params"]
    from dynamic_asr_eval_tpu.models.conformer import _act, _taps_3x3_s2

    act = _act(cfg.subsampling_act)
    C = cfg.subsampling_conv_channels
    h = None
    k_in = p["conv_in_kernel"].reshape(9, C)
    taps = _taps_3x3_s2(x[..., None])
    h = p["conv_in_bias"] + sum(taps[j] * k_in[j] for j in range(9))
    h = act(h)
    for i in range(2):
        k_dw = p[f"dw_conv_{i}_kernel"].reshape(9, C)
        taps = _taps_3x3_s2(h)
        h = p[f"dw_conv_{i}_bias"] + sum(taps[j] * k_dw[j] for j in range(9))
        h = h @ p[f"pw_conv_{i}"]["kernel"][0, 0] + p[f"pw_conv_{i}"]["bias"]
        h = act(h)
    return h


def _kernel_params(variables, C):
    p = variables["params"]
    return (
        p["conv_in_kernel"].reshape(9, C), p["conv_in_bias"],
        p["dw_conv_0_kernel"].reshape(9, C), p["dw_conv_0_bias"],
        p["pw_conv_0"]["kernel"][0, 0], p["pw_conv_0"]["bias"],
        p["dw_conv_1_kernel"].reshape(9, C), p["dw_conv_1_bias"],
        p["pw_conv_1"]["kernel"][0, 0], p["pw_conv_1"]["bias"],
    )


def _init(cfg, T, B=2, seed=0):
    mod = DWStridingSubsampling(cfg)
    x = jnp.asarray(
        np.random.default_rng(seed).standard_normal((B, T, cfg.feat_in)),
        jnp.float32)
    variables = mod.init(jax.random.PRNGKey(seed), x)
    return mod, variables, x


class TestFusedSubsample:
    @pytest.mark.parametrize("T", [512, 520, 128, 1024, 700, 997])
    def test_forward_parity(self, T):
        cfg = _cfg()
        mod, variables, x = _init(cfg, T)
        ref = _xla_stack_only(cfg, variables, x)
        got = fused_subsample(x, *_kernel_params(variables, 16),
                              act_name=cfg.subsampling_act, interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize(
        "T", [pytest.param(512, marks=pytest.mark.slow), 700]
    )
    def test_gradient_parity(self, T):
        cfg = _cfg()
        mod, variables, x = _init(cfg, T, B=1, seed=3)
        params = _kernel_params(variables, 16)

        def loss_ref(x, *ps):
            var = {"params": dict(variables["params"])}
            # rebuild the param tree from the flat tuple
            pr = var["params"]
            pr["conv_in_kernel"] = ps[0].reshape(3, 3, 1, 16)
            pr["conv_in_bias"] = ps[1]
            pr["dw_conv_0_kernel"] = ps[2].reshape(3, 3, 1, 16)
            pr["dw_conv_0_bias"] = ps[3]
            pr["pw_conv_0"] = {"kernel": ps[4][None, None], "bias": ps[5]}
            pr["dw_conv_1_kernel"] = ps[6].reshape(3, 3, 1, 16)
            pr["dw_conv_1_bias"] = ps[7]
            pr["pw_conv_1"] = {"kernel": ps[8][None, None], "bias": ps[9]}
            h = _xla_stack_only(cfg, var, x)
            w = jnp.cos(jnp.arange(h.size, dtype=jnp.float32)).reshape(h.shape)
            return jnp.sum(h * w)

        def loss_ker(x, *ps):
            h = fused_subsample(x, *ps, act_name=cfg.subsampling_act,
                                interpret=True)
            w = jnp.cos(jnp.arange(h.size, dtype=jnp.float32)).reshape(h.shape)
            return jnp.sum(h * w)

        g_ref = jax.grad(loss_ref, argnums=tuple(range(11)))(x, *params)
        g_ker = jax.grad(loss_ker, argnums=tuple(range(11)))(x, *params)
        names = ["x", "k9", "b0", "dw1", "bdw1", "pw1", "bpw1",
                 "dw2", "bdw2", "pw2", "bpw2"]
        for n, a, b in zip(names, g_ref, g_ker):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4,
                err_msg=f"grad mismatch: {n}")

    def test_raises_on_bad_feat(self):
        cfg = _cfg(F=16)
        mod, variables, x = _init(cfg, 128)
        with pytest.raises(ValueError):
            fused_subsample(x[:, :, :12], *_kernel_params(variables, 16),
                            act_name="silu", interpret=True)


class TestModuleIntegration:
    """DWStridingSubsampling(subsampling_impl='pallas') must match the XLA
    module bit-for-bit in f32 (same params pytree, fwd + grads)."""

    def _mods(self, T=700):
        import dataclasses

        cfg_x = _cfg()
        cfg_p = dataclasses.replace(cfg_x, subsampling_impl="pallas")
        mod_x = DWStridingSubsampling(cfg_x)
        mod_p = DWStridingSubsampling(cfg_p)
        x = jnp.asarray(
            np.random.default_rng(5).standard_normal((2, T, cfg_x.feat_in)),
            jnp.float32)
        variables = mod_x.init(jax.random.PRNGKey(2), x)
        return mod_x, mod_p, variables, x

    def test_param_tree_identical(self):
        mod_x, mod_p, variables, x = self._mods()
        vp = mod_p.init(jax.random.PRNGKey(2), x)
        tx = jax.tree_util.tree_structure(variables)
        tp = jax.tree_util.tree_structure(vp)
        assert tx == tp

    def test_forward_and_grad_parity(self):
        mod_x, mod_p, variables, x = self._mods()
        ox = mod_x.apply(variables, x)
        op = mod_p.apply(variables, x)
        np.testing.assert_allclose(np.asarray(op), np.asarray(ox),
                                   rtol=2e-5, atol=2e-5)

        def loss(mod, v, x):
            h = mod.apply(v, x)
            w = jnp.sin(jnp.arange(h.size, dtype=jnp.float32)).reshape(h.shape)
            return jnp.sum(h * w)

        gx = jax.grad(lambda v: loss(mod_x, v, x))(variables)
        gp = jax.grad(lambda v: loss(mod_p, v, x))(variables)
        flat_x, _ = jax.tree_util.tree_flatten_with_path(gx)
        flat_p, _ = jax.tree_util.tree_flatten_with_path(gp)
        for (kx, ax), (kp, ap) in zip(flat_x, flat_p):
            np.testing.assert_allclose(
                np.asarray(ap), np.asarray(ax), rtol=3e-4, atol=3e-4,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(kx)}")

    def test_fallback_on_factor_4(self):
        import dataclasses

        cfg = dataclasses.replace(_cfg(), subsampling_factor=4,
                                  subsampling_impl="pallas")
        mod = DWStridingSubsampling(cfg)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 128, 16)),
                        jnp.float32)
        v = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(v, x)  # silently uses the XLA path
        assert out.shape[1] == 32


class TestImplParity:
    """The interchangeable XLA-level lowerings ('conv', 'xla' tap-sum,
    'hybrid' = conv stage-0/pointwise + tap-sum depthwise) must share
    parameters and produce identical outputs AND gradients, including with
    ragged lengths (inter-stage masking active)."""

    @pytest.mark.parametrize("impl", ["xla", "hybrid", "conv_tapbwd"])
    def test_matches_conv_fwd_and_grad(self, impl):
        import dataclasses

        cfg_c = dataclasses.replace(_cfg(), subsampling_impl="conv")
        cfg_o = dataclasses.replace(cfg_c, subsampling_impl=impl)
        mod_c = DWStridingSubsampling(cfg_c)
        mod_o = DWStridingSubsampling(cfg_o)
        x = jnp.asarray(
            np.random.default_rng(7).standard_normal((2, 300, 16)), jnp.float32)
        lens = jnp.asarray([300, 173], jnp.int32)  # ragged → stage masking
        v = mod_c.init(jax.random.PRNGKey(1), x)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(mod_o.init(jax.random.PRNGKey(1), x)))

        oc = mod_c.apply(v, x, length=lens)
        oo = mod_o.apply(v, x, length=lens)
        np.testing.assert_allclose(np.asarray(oo), np.asarray(oc),
                                   rtol=2e-5, atol=2e-5)

        def loss(mod, v):
            h = mod.apply(v, x, length=lens)
            w = jnp.sin(jnp.arange(h.size, dtype=jnp.float32)).reshape(h.shape)
            return jnp.sum(h * w)

        gc = jax.grad(lambda vv: loss(mod_c, vv))(v)
        go = jax.grad(lambda vv: loss(mod_o, vv))(v)
        flat_c, _ = jax.tree_util.tree_flatten_with_path(gc)
        flat_o, _ = jax.tree_util.tree_flatten_with_path(go)
        for (kc, ac), (_, ao) in zip(flat_c, flat_o):
            np.testing.assert_allclose(
                np.asarray(ao), np.asarray(ac), rtol=3e-4, atol=3e-4,
                err_msg=f"{impl} grad mismatch at {jax.tree_util.keystr(kc)}")
