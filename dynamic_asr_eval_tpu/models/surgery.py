"""Model surgery utilities.

Capability parity with the nvidia_ctc backend's preparation steps
(``nvidia_ctc/lib.py:81-102``):

- :func:`batchnorm_to_batchrenorm` — convert BatchNorm statistics/affine
  parameters into our :class:`models.conformer.BatchRenorm` layout (γ/β and
  running mean/var copied; momentum forced low, matching the reference's
  ``momentum=1e-3`` and saturated ``num_batches_tracked``);
- :func:`nvidia_freeze_labels` — the reference's freeze set (pre-encode /
  positional encodings / decoder head stay frozen during TTA,
  ``nvidia_ctc/lib.py:81-86``) expressed as an optax label tree.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from dynamic_asr_eval_tpu.optim.masks import _path_str


def batchnorm_to_batchrenorm(bn_params: Dict[str, jnp.ndarray]) -> Dict[str, Dict]:
    """``{'scale','bias','mean','var'}`` (BatchNorm) →
    ``(params {'scale','bias'}, batch_stats {'mean','var'})`` for BatchRenorm."""
    return {
        "params": {"scale": jnp.asarray(bn_params["scale"]),
                   "bias": jnp.asarray(bn_params["bias"])},
        "batch_stats": {"mean": jnp.asarray(bn_params["mean"], jnp.float32),
                        "var": jnp.asarray(bn_params["var"], jnp.float32)},
    }


def convert_torch_batchnorm_state(prefix: str, state_dict) -> Dict[str, jnp.ndarray]:
    """Extract one torch BatchNorm1d's tensors by state-dict prefix."""
    return {
        "scale": state_dict[f"{prefix}.weight"],
        "bias": state_dict[f"{prefix}.bias"],
        "mean": state_dict[f"{prefix}.running_mean"],
        "var": state_dict[f"{prefix}.running_var"],
    }


def nvidia_freeze_labels(params):
    """'train'/'freeze' labels: freeze subsampling (pre_encode), positional
    encodings, and the CTC head; adapt everything else."""

    def label(path, leaf):
        s = _path_str(path).lower()
        if "subsampling" in s or "pos_enc" in s or "pre_encode" in s:
            return "freeze"
        if s.startswith("decoder") or "/decoder" in s:
            return "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)
