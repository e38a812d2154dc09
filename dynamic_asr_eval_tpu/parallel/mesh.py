"""Device-mesh parallelism utilities.

The reference is single-process / single-GPU (SURVEY.md §2.3): its only
parallelism is ray task fan-out for beam decodes and `CUDA_VISIBLE_DEVICES`
placement.  The TPU-native equivalents here:

- **data parallel over recordings/windows** — the natural axis for dynamic
  eval: each recording's adaptation is independent; WER reduction is one
  ``psum`` of error counts (replaces the reference's host-side accumulation,
  ``lcasr/run.py:119``).
- **tensor parallel within the conformer** — GSPMD sharding rules over a
  ``('dp','tp')`` mesh: FF and attention weights sharded on their hidden
  axes, XLA inserts the all-reduces over ICI.  Not required for parity (the
  reference model is ≤~100M params) but makes the framework scale past one
  chip's HBM for long windows / bigger models.

Everything rides ``jax.sharding`` + jit (GSPMD); there is no hand-written
collective here — per the scaling-book recipe: pick a mesh, annotate
shardings, let XLA insert collectives.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    tp: int = 1,
    devices=None,
) -> Mesh:
    """Create a ``('dp', 'tp')`` mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    if n % tp:
        raise ValueError(f"n_devices ({n}) not divisible by tp ({tp})")
    dev_array = np.asarray(devices[:n]).reshape(n // tp, tp)
    return Mesh(dev_array, axis_names=("dp", "tp"))


# -- sharding rules ---------------------------------------------------------

# (path substring predicates, PartitionSpec) — first match wins.  Kernel
# layouts follow models/conformer.py: Dense kernels are [in, out].
_CONFORMER_RULES = (
    # FF expand: [d_model, d_ff] → shard d_ff
    (("ff1/in", "ff2/in"), P(None, "tp")),
    # FF contract: [d_ff, d_model] → shard d_ff (input axis)
    (("ff1/out", "ff2/out"), P("tp", None)),
    # attention qkv: [d_model, 3*H*D] → shard heads (output axis)
    (("attn/qkv",), P(None, "tp")),
    # attention out: [H*D, d_model] → shard input axis
    (("attn/out",), P("tp", None)),
    # conv module pointwise: expand / contract
    (("conv/pw1",), P(None, "tp")),
    (("conv/pw2",), P("tp", None)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def conformer_param_sharding(params, mesh: Mesh):
    """NamedSharding tree for conformer params: TP rules above, everything
    else replicated."""

    def spec_for(path, leaf):
        s = _path_str(path)
        for needles, spec in _CONFORMER_RULES:
            if any(n in s for n in needles) and leaf.ndim == len(spec):
                divisible = all(
                    d is None or leaf.shape[i] % mesh.shape["tp"] == 0
                    for i, d in enumerate(spec)
                )
                if divisible:
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    shardings = conformer_param_sharding(params, mesh)
    return jax.device_put(params, shardings), shardings


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (window/recording) batch axis over dp."""
    return NamedSharding(mesh, P("dp"))


def psum_wer_counts(err_counts, axis_name: str = "dp"):
    """All-reduce (ins, del, sub, words) count vectors across the mesh —
    the distributed form of corpus-level WER accumulation."""
    return jax.lax.psum(err_counts, axis_name)


def reduce_wer_counts(counts: np.ndarray, mesh: Mesh) -> np.ndarray:
    """``[R, 4]`` per-record ``(ins, del, sub, words)`` counts → corpus
    totals, reduced ON the mesh: the record axis is sharded over dp, each
    slice sums locally, and one :func:`psum_wer_counts` collective produces
    the replicated corpus totals (the multi-chip form of the reference's
    host-side accumulation, ``lcasr/run.py:119``).

    Summing edit-op counts is exactly how ``word_error_rate_detail``
    aggregates, so ``(i+d+s)/words`` of the result equals the serial corpus
    WER."""
    import jax.numpy as jnp
    from jax import shard_map

    dp = int(mesh.shape["dp"])
    c = np.asarray(counts, np.int64).reshape(-1, 4)
    pad = (-c.shape[0]) % dp
    if pad:
        c = np.concatenate([c, np.zeros((pad, 4), np.int64)])

    f = shard_map(
        lambda x: psum_wer_counts(jnp.sum(x, axis=0)),
        mesh=mesh, in_specs=P("dp", None), out_specs=P(),
    )
    return np.asarray(jax.jit(f)(jnp.asarray(c)))
