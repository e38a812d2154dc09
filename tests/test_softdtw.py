import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_asr_eval_tpu.kernels.softdtw import (
    SoftDTW,
    pairwise_sq_dist,
    soft_dtw,
    _forward_R,
)


def brute_force_softdtw(D, gamma):
    """Straight O(NM) python reference of the recurrence."""
    N, M = D.shape
    R = np.full((N + 1, M + 1), 1e10)
    R[0, 0] = 0.0

    def softmin(vals):
        vals = np.array(vals) / -gamma
        m = vals.max()
        return -gamma * (m + np.log(np.exp(vals - m).sum()))

    for i in range(1, N + 1):
        for j in range(1, M + 1):
            R[i, j] = D[i - 1, j - 1] + softmin([R[i - 1, j], R[i, j - 1], R[i - 1, j - 1]])
    return R[N, M]


class TestSoftDTWForward:
    @pytest.mark.parametrize("shape", [(4, 4), (5, 8), (8, 5)])
    def test_matches_bruteforce(self, shape):
        rng = np.random.default_rng(0)
        D = rng.uniform(0, 2, size=shape).astype(np.float32)
        expected = brute_force_softdtw(D, gamma=1.0)
        got = float(soft_dtw(jnp.asarray(D[None]), 1.0)[0])
        assert got == pytest.approx(expected, rel=1e-4)

    def test_gamma_to_zero_approaches_hard_dtw(self):
        rng = np.random.default_rng(1)
        D = rng.uniform(0, 2, size=(6, 6)).astype(np.float32)
        soft = float(soft_dtw(jnp.asarray(D[None]), 0.01)[0])
        # hard DTW via min recursion
        N, M = D.shape
        R = np.full((N + 1, M + 1), np.inf)
        R[0, 0] = 0
        for i in range(1, N + 1):
            for j in range(1, M + 1):
                R[i, j] = D[i - 1, j - 1] + min(R[i - 1, j], R[i, j - 1], R[i - 1, j - 1])
        assert soft == pytest.approx(R[N, M], abs=0.05)

    def test_identity_alignment_zero(self):
        x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 10, 4)), jnp.float32)
        loss = SoftDTW(gamma=0.01)(x, x)
        assert float(loss[0]) == pytest.approx(0.0, abs=1e-3)

    def test_bandwidth_restricts_paths(self):
        rng = np.random.default_rng(3)
        D = rng.uniform(0, 1, size=(1, 8, 8)).astype(np.float32)
        full = float(soft_dtw(jnp.asarray(D), 0.1, 0)[0])
        banded = float(soft_dtw(jnp.asarray(D), 0.1, 1)[0])
        assert banded >= full - 1e-4  # fewer paths → no lower cost


class TestSoftDTWGrad:
    def test_gradient_matches_finite_difference(self):
        rng = np.random.default_rng(4)
        D = rng.uniform(0.5, 1.5, size=(1, 5, 5)).astype(np.float64)

        f = lambda d: jnp.sum(soft_dtw(d, 1.0))
        g = np.asarray(jax.grad(f)(jnp.asarray(D, jnp.float32)))[0]
        eps = 1e-3
        for (i, j) in [(0, 0), (2, 3), (4, 4), (1, 2)]:
            Dp = D.copy(); Dp[0, i, j] += eps
            Dm = D.copy(); Dm[0, i, j] -= eps
            fd = (brute_force_softdtw(Dp[0], 1.0) - brute_force_softdtw(Dm[0], 1.0)) / (2 * eps)
            assert g[i, j] == pytest.approx(fd, rel=2e-2, abs=2e-3)

    def test_grad_through_features(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((2, 6, 3)), jnp.float32)
        y = jnp.asarray(rng.standard_normal((2, 7, 3)), jnp.float32)

        def loss(x):
            return jnp.sum(SoftDTW(gamma=0.5)(x, y))

        g = jax.grad(loss)(x)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_normalized_self_zero(self):
        x = jnp.asarray(np.random.default_rng(6).standard_normal((1, 8, 4)), jnp.float32)
        loss = SoftDTW(gamma=1.0, normalize=True)(x, x)
        assert float(loss[0]) == pytest.approx(0.0, abs=1e-3)


class TestPairwise:
    def test_against_numpy(self):
        rng = np.random.default_rng(7)
        x = rng.standard_normal((2, 5, 3)).astype(np.float32)
        y = rng.standard_normal((2, 6, 3)).astype(np.float32)
        got = np.asarray(pairwise_sq_dist(jnp.asarray(x), jnp.asarray(y)))
        want = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestPallasKernel:
    def test_pallas_matches_scan_interpret(self):
        """Pallas kernel in interpreter mode (CPU) vs the scan path."""
        from jax.experimental.pallas import tpu as pltpu
        from dynamic_asr_eval_tpu.kernels import softdtw as sd

        rng = np.random.default_rng(8)
        D = jnp.asarray(rng.uniform(0, 2, size=(2, 8, 8)), jnp.float32)
        want = jax.vmap(lambda d: sd._forward_R(d, 1.0))(D)
        with pltpu.force_tpu_interpret_mode():
            got = sd._softdtw_pallas_fwd(D, 1.0)
        np.testing.assert_allclose(
            np.asarray(got[:, 8, 8]), np.asarray(want[:, 8, 8]), rtol=1e-4
        )
