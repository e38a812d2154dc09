"""Checkpoint save/load + converters.

The reference loads torch pickles ``{'model': state_dict, 'config': ...}``
with DDP-prefix conversion (``lcasr/run.py:37-47``, ``lcasr/lib.py:44-49``).
Here the native format is a single msgpack file (flax serialization) with a
JSON header carrying the model config, plus:

- :func:`convert_from_ddp` — strips ``module.`` prefixes from torch state
  dicts (parity with ``lming.utils.general.convert_from_ddp``);
- :func:`load_torch_checkpoint` — reads a torch checkpoint on CPU and returns
  (state_dict, config) for conversion into JAX params (torch is CPU-only in
  this image, which is all loading needs).
"""

from __future__ import annotations

import dataclasses
import json
import os
import struct
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_asr_eval_tpu.models.conformer import ConformerConfig, SCConformer

_MAGIC = b"DAE1"


def save_checkpoint(path: str, variables: Dict, config: ConformerConfig, extra: Dict | None = None):
    from flax import serialization

    cfg_d = dataclasses.asdict(config)
    cfg_d["compute_dtype"] = str(jnp.dtype(config.compute_dtype).name)
    header = json.dumps({"config": cfg_d, "extra": extra or {}}).encode("utf-8")
    payload = serialization.to_bytes(variables)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(payload)


def load_checkpoint(path: str):
    from flax import serialization

    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"{path} is not a DAE checkpoint (bad magic {magic!r})")
        (hlen,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hlen).decode("utf-8"))
        payload = f.read()
    cfg_d = header["config"]
    cfg_d["compute_dtype"] = jnp.dtype(cfg_d.get("compute_dtype", "bfloat16"))
    config = ConformerConfig(**cfg_d)
    model = SCConformer(config)
    x = jnp.zeros((1, config.feat_in, 64), jnp.float32)
    template = jax.eval_shape(lambda: model.init({"params": jax.random.PRNGKey(0)}, x))
    variables = serialization.from_bytes(template, payload)
    variables = jax.tree.map(jnp.asarray, variables)
    return model, variables, config


def convert_from_ddp(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Strip DistributedDataParallel 'module.' prefixes (reference usage at
    ``lcasr/lib.py:45``)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def load_torch_checkpoint(path: str) -> Tuple[Dict[str, np.ndarray], Dict]:
    """Load a torch checkpoint on CPU → (numpy state_dict, config dict)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt)
    state = convert_from_ddp(state)
    state_np = {k: v.detach().cpu().numpy() for k, v in state.items()
                if hasattr(v, "detach")}
    config = ckpt.get("config", {})
    return state_np, config
