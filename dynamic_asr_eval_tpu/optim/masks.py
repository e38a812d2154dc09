"""Parameter-selection policies as optax masks.

Functional equivalents of the reference's ``requires_grad`` surgery
(``lcasr/lib.py:148-204``):

- ``bitfit``      — train only bias vectors (LayerNorm/Dense/BatchRenorm
                    biases; ``lcasr/lib.py:148-160``)
- ``freeze_subsampling``              — freeze the subsampling module (:163-172)
- ``last_block_and_head``             — train only the last conformer block and
                                        the CTC head (:175-188)
- ``subsampling_only``                — train only the subsampling module (:191-204)

In JAX the policy is a label pytree fed to ``optax.multi_transform``: frozen
leaves get ``optax.set_to_zero()`` so their updates vanish while shapes stay
static (jit-stable — no parameter-list surgery).
"""

from __future__ import annotations

from typing import Optional

import jax
import optax


def _flatten_with_paths(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return flat


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_labels(
    params,
    bitfit: bool = False,
    freeze_subsampling: bool = False,
    last_block_and_head: bool = False,
    subsampling_only: bool = False,
    n_layers: Optional[int] = None,
):
    """Return a pytree of 'train' / 'freeze' labels matching ``params``."""

    def label(path, leaf) -> str:
        s = _path_str(path).lower()
        name = s.rsplit("/", 1)[-1]
        if bitfit:
            return "train" if name == "bias" else "freeze"
        if subsampling_only:
            return "train" if "subsampling" in s else "freeze"
        if last_block_and_head:
            if n_layers is None:
                raise ValueError("last_block_and_head requires n_layers")
            if f"layer_{n_layers - 1}/" in s or s.startswith("decoder") or "/decoder" in s:
                return "train"
            return "freeze"
        if freeze_subsampling and "subsampling" in s:
            return "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def trainable_mask(labels):
    """Label pytree → bool pytree (True = trainable)."""
    return jax.tree.map(lambda l: l == "train", labels)


def masked_optimizer(inner: optax.GradientTransformation, labels) -> optax.GradientTransformation:
    """Wrap an optimizer so 'freeze'-labelled leaves receive zero updates."""
    return optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, labels
    )
