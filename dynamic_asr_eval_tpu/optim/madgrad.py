"""MADGRAD optimizer (Defazio & Jelassi, 2021) as an optax transformation.

The reference's TTA engines and NST finetuning all default to MADGRAD
(``lcasr/lib.py:458,494``, ``earnings_finetune/lcasr160rb1.yaml:31-34``),
via the external ``lcasr.optim.madgrad`` package.  This is a from-the-paper
implementation of the momentum dual-averaging update:

    λ_k   = lr · √(k+1)
    s_k+1 = s_k + λ_k g_k
    ν_k+1 = ν_k + λ_k g_k²
    z_k+1 = x_0 − s_k+1 / (ν_k+1^{1/3} + ε)
    x_k+1 = (1−c)·x_k + c·z_k+1          (c = 1 − momentum)

State stores x₀ explicitly (like the upstream momentum path), so the
transformation needs ``params`` at update time; use with
``optax.apply_updates``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


class MadgradState(NamedTuple):
    count: chex.Array
    grad_sum: optax.Params  # s
    grad_sum_sq: optax.Params  # ν
    x0: optax.Params


def madgrad(
    learning_rate: float = 1e-2,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    eps: float = 1e-6,
) -> optax.GradientTransformation:
    if isinstance(learning_rate, str) or not (
        isinstance(learning_rate, (int, float)) or hasattr(learning_rate, "dtype")
    ):
        raise TypeError(f"learning_rate must be numeric, got {learning_rate!r}")
    if not 0.0 <= momentum < 1.0:
        raise ValueError(f"momentum must be in [0, 1), got {momentum}")
    ck = 1.0 - momentum

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return MadgradState(
            count=jnp.zeros([], jnp.int32),
            grad_sum=zeros,
            grad_sum_sq=jax.tree.map(jnp.zeros_like, params),
            x0=jax.tree.map(jnp.asarray, params),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("madgrad requires params (pass them to update)")
        k = state.count
        lamb = learning_rate * jnp.sqrt(k.astype(jnp.float32) + 1.0)

        if weight_decay != 0.0:
            updates = jax.tree.map(lambda g, p: g + weight_decay * p, updates, params)

        new_s = jax.tree.map(lambda s, g: s + lamb * g, state.grad_sum, updates)
        new_v = jax.tree.map(
            lambda v, g: v + lamb * (g * g), state.grad_sum_sq, updates
        )

        def step(x0, s, v, p):
            rms = jnp.cbrt(v) + eps
            z = x0 - s / rms
            new_p = (1.0 - ck) * p + ck * z
            return new_p - p  # optax delta convention

        deltas = jax.tree.map(step, state.x0, new_s, new_v, params)
        return deltas, MadgradState(k + 1, new_s, new_v, state.x0)

    return optax.GradientTransformation(init_fn, update_fn)
