import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from dynamic_asr_eval_tpu.optim import (
    madgrad,
    ema_init,
    ema_update,
    param_labels,
    masked_optimizer,
)


class TestMadgrad:
    def test_matches_paper_recursion(self):
        """First two steps vs a hand-rolled numpy implementation of the
        dual-averaging recursion."""
        lr, mom, eps = 0.1, 0.9, 1e-6
        opt = madgrad(lr, mom, eps=eps)
        p = jnp.asarray([1.0, -2.0])
        g1 = jnp.asarray([0.5, 0.3])
        g2 = jnp.asarray([-0.1, 0.4])
        state = opt.init(p)
        u1, state = opt.update(g1, state, p)
        p1 = optax.apply_updates(p, u1)
        u2, state = opt.update(g2, state, p1)
        p2 = optax.apply_updates(p1, u2)

        # numpy reference
        x0 = np.array([1.0, -2.0])
        s = np.zeros(2)
        v = np.zeros(2)
        xs = x0.copy()
        ck = 1 - mom
        for k, g in enumerate([np.array([0.5, 0.3]), np.array([-0.1, 0.4])]):
            lamb = lr * np.sqrt(k + 1)
            s = s + lamb * g
            v = v + lamb * g * g
            z = x0 - s / (np.cbrt(v) + eps)
            xs = (1 - ck) * xs + ck * z
        np.testing.assert_allclose(np.asarray(p2), xs, rtol=1e-5)

    def test_converges_on_quadratic(self):
        opt = madgrad(0.05)
        p = jnp.asarray([5.0, -3.0])
        state = opt.init(p)
        for _ in range(200):
            g = 2 * p  # d/dp ||p||^2
            u, state = opt.update(g, state, p)
            p = optax.apply_updates(p, u)
        assert float(jnp.abs(p).max()) < 1e-2

    def test_requires_params(self):
        opt = madgrad(0.1)
        state = opt.init(jnp.zeros(2))
        with pytest.raises(ValueError):
            opt.update(jnp.ones(2), state, None)


class TestEMA:
    def test_leader_update(self):
        e = ema_init({"w": jnp.asarray(1.0)}, decay=0.9)
        e = ema_update(e, {"w": jnp.asarray(2.0)})
        assert float(e.params["w"]) == pytest.approx(0.9 * 1.0 + 0.1 * 2.0)

    def test_anchor_frozen(self):
        e = ema_init({"w": jnp.asarray(1.0)}, decay=1.0)
        e = ema_update(e, {"w": jnp.asarray(100.0)})
        assert float(e.params["w"]) == 1.0


class TestMasks:
    def _params(self):
        return {
            "subsampling": {"conv": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)}},
            "layer_0": {"attn": {"qkv": {"kernel": jnp.ones((2, 2))}}},
            "layer_1": {"ff": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)}},
            "decoder": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)},
        }

    def test_bitfit_labels(self):
        labels = param_labels(self._params(), bitfit=True)
        assert labels["subsampling"]["conv"]["bias"] == "train"
        assert labels["subsampling"]["conv"]["kernel"] == "freeze"
        assert labels["decoder"]["bias"] == "train"

    def test_last_block_and_head(self):
        labels = param_labels(self._params(), last_block_and_head=True, n_layers=2)
        assert labels["layer_1"]["ff"]["kernel"] == "train"
        assert labels["layer_0"]["attn"]["qkv"]["kernel"] == "freeze"
        assert labels["decoder"]["kernel"] == "train"

    def test_frozen_leaves_get_zero_updates(self):
        params = self._params()
        labels = param_labels(params, bitfit=True)
        opt = masked_optimizer(optax.sgd(0.1), labels)
        state = opt.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = opt.update(grads, state, params)
        assert float(jnp.abs(updates["subsampling"]["conv"]["kernel"]).max()) == 0.0
        assert float(jnp.abs(updates["decoder"]["bias"]).max()) > 0.0
