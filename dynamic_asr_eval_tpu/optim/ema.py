"""Exponential moving averages over parameter pytrees.

Replaces the reference's ``torch_ema.ExponentialMovingAverage`` usage in the
AWMC engine (anchor decay 1.0, leader decay 0.999; ``lcasr/lib.py:245-248``)
and the NST finetuning EMA teacher (``earnings_finetune/train.py:242-260``).
Functional: the EMA is just a pytree + decay, so "swap in averaged params"
(torch's ``average_parameters()`` context) is simply using ``ema.params`` in
an apply call — no context manager, no mutation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import optax


class EmaState(NamedTuple):
    params: optax.Params
    decay: float


def ema_init(params: optax.Params, decay: float) -> EmaState:
    return EmaState(params=jax.tree.map(lambda p: p, params), decay=decay)


def ema_update(state: EmaState, new_params: optax.Params) -> EmaState:
    d = state.decay
    if d >= 1.0:  # anchor: frozen snapshot
        return state
    avg = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, state.params, new_params)
    return EmaState(params=avg, decay=d)


def ema_params(state: EmaState) -> optax.Params:
    return state.params
