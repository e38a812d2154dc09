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

    _install_omegaconf_stub()
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    state = convert_from_ddp(state)
    state_np = {k: v.detach().cpu().numpy() for k, v in state.items()
                if hasattr(v, "detach")}
    config = ckpt.get("config", {}) if isinstance(ckpt, dict) else {}
    return state_np, config


# ---------------------------------------------------------------------------
# Reference (torch-pickle) checkpoints end to end: the reference's drivers do
# ``torch.load(checkpoint) → checkpoint['config'] → load_model → strict=False
# state-dict load`` (lcasr/run.py:37-47).  load_any_checkpoint gives the same
# one-call experience here: sniff the format, recover the model config (from
# the pickled config when present — including OmegaConf-pickled configs via a
# permissive stub — otherwise from the weight shapes), run the oracle-proven
# converter, and overlay onto a fresh init with strict=False semantics.
# ---------------------------------------------------------------------------


def _install_omegaconf_stub() -> None:
    """Reference checkpoints may pickle their ``config`` as OmegaConf
    containers (the reference loads paths/config via OmegaConf,
    ``lcasr/lib.py:1-5``); omegaconf is not installed in this image.  Install
    permissive stub modules so ``torch.load`` can unpickle such configs —
    :func:`_plain_config` unwraps the stubs' captured pickle state into plain
    dicts/lists afterwards.  A real omegaconf installation always wins."""
    import sys
    import types

    try:
        import omegaconf  # noqa: F401 — real library present, nothing to do
        return
    except ImportError:
        pass
    if "omegaconf" in sys.modules:
        return

    class _OCStub:
        def __init__(self, *args, **kwargs):
            pass

        def __setstate__(self, state):
            self.__dict__["_oc_state"] = state

    class _OCModule(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            cls = type(name, (_OCStub,), {"__module__": self.__name__})
            setattr(self, name, cls)
            return cls

    root = _OCModule("omegaconf")
    sys.modules["omegaconf"] = root
    for sub in ("omegaconf", "dictconfig", "listconfig", "base", "nodes",
                "errors", "basecontainer"):
        mod = _OCModule(f"omegaconf.{sub}")
        sys.modules[f"omegaconf.{sub}"] = mod
        setattr(root, sub, mod)


def _plain_config(obj: Any) -> Any:
    """Best-effort conversion of a pickled config object (plain containers,
    real OmegaConf nodes, or stub-unpickled OmegaConf state) into plain
    python dicts/lists/scalars."""
    try:
        from omegaconf import OmegaConf  # real library path

        if OmegaConf.is_config(obj):
            return _plain_config(OmegaConf.to_container(obj, resolve=False))
    except Exception:
        pass
    st = getattr(obj, "_oc_state", None)
    if isinstance(st, dict):
        # OmegaConf containers pickle {_content, _metadata, ...}; value nodes
        # pickle {_val, ...}
        if "_content" in st:
            return _plain_config(st["_content"])
        if "_val" in st:
            return _plain_config(st["_val"])
        return None
    if isinstance(obj, dict):
        return {str(k): _plain_config(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain_config(v) for v in obj]
    return obj


def infer_conformer_dims(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Recover the structural ConformerConfig fields implied by an lcasr-style
    torch state dict (the naming scheme of ``convert.DEFAULT_RULES``).  Head
    count/size cannot be split from weights alone — ``_attn_total`` carries
    n_heads·head_dim for :func:`_merge_reference_config` to resolve."""
    import re as _re

    dims: Dict[str, Any] = {}
    layer_ids = {int(m.group(1)) for k in state
                 for m in [_re.match(r"layers\.(\d+)\.", k)] if m}
    if layer_ids:
        dims["n_layers"] = max(layer_ids) + 1
    w = state.get("decoder.weight")
    if w is not None:
        dims["vocab_size"] = int(w.shape[0]) - 1
        dims["d_model"] = int(w.shape[1])
    cin = state.get("subsampling.conv_in.weight")
    if cin is not None:
        dims["subsampling_conv_channels"] = int(cin.shape[0])
        n_dw = len({k for k in state
                    if _re.fullmatch(r"subsampling\.dw_conv\.\d+\.weight", k)})
        dims["subsampling_factor"] = 2 ** (1 + n_dw)
        # the out dense consumes f_ds·C where f_ds = ceil^stages(feat_in).
        # The mapping feat_in → f_ds is many-to-one, so the weights pin f_ds
        # but not feat_in itself; _merge_reference_config keeps a consistent
        # config feat_in and only falls back to the canonical
        # (multiple-of-factor) preimage f_ds·factor when the config is absent
        # or contradicts the weights.
        out_w = state.get("subsampling.out.weight")
        if out_w is not None:
            dims["_f_ds"] = int(out_w.shape[1]) // dims["subsampling_conv_channels"]
    dw = state.get("layers.0.conv.dw.weight")
    if dw is not None:
        dims["conv_kernel_size"] = int(dw.shape[-1])
    ff = state.get("layers.0.ff1.in_proj.weight")
    if ff is not None and "d_model" in dims:
        dims["expansion_factor"] = int(ff.shape[0]) // dims["d_model"]
    dims["self_conditioning"] = "self_condition_reembed.weight" in state
    dims["decoder_norm"] = "decoder_norm.weight" in state
    if any(k.endswith("conv.norm_mid.running_mean") for k in state):
        dims["default_norm"] = "batch_renorm"
    qkv = state.get("layers.0.attn.qkv.weight")
    if qkv is not None:
        dims["_attn_total"] = int(qkv.shape[0]) // 3
    return dims


def _merge_reference_config(
    model_cfg: Dict[str, Any], dims: Dict[str, Any]
) -> Tuple[Dict[str, Any], list]:
    """Merge a checkpoint's declared model config with weight-implied
    structural dims.  Weights win for structure (they are ground truth for
    what the converter produced); the config supplies everything weights
    cannot express (rotary base freq, head split, norm kind, …)."""
    warns: list = []
    merged = dict(model_cfg)
    attn_total = dims.pop("_attn_total", None)
    batch_from_weights = dims.pop("default_norm", None)
    f_ds = dims.pop("_f_ds", None)
    if f_ds is not None:
        stages = max(int(dims.get("subsampling_factor", 1)).bit_length() - 1, 0)

        def _ceil_ds(f: int) -> int:
            for _ in range(stages):
                f = -(-f // 2)
            return f

        cfg_feat = merged.get("feat_in")
        if not (isinstance(cfg_feat, int) and _ceil_ds(cfg_feat) == f_ds):
            canonical = f_ds * int(dims.get("subsampling_factor", 1))
            if cfg_feat is not None:
                warns.append(
                    f"config says feat_in={cfg_feat} but the subsampling out "
                    f"dense implies {f_ds} downsampled freq bins; using the "
                    f"canonical preimage feat_in={canonical}")
            dims["feat_in"] = canonical
    for k, v in dims.items():
        if k in merged and merged[k] != v:
            warns.append(f"config says {k}={merged[k]} but weights imply {v}; "
                         "using the weight shapes")
        merged[k] = v
    if batch_from_weights and merged.get("default_norm", "layer_norm") == "layer_norm":
        if "default_norm" in merged:
            warns.append("config says default_norm=layer_norm but the conv "
                         "mid-norms carry running statistics; using batch_renorm")
        merged["default_norm"] = batch_from_weights
    # resolve the head split: n_heads·head_dim must equal the qkv width
    total = attn_total or merged.get("d_model")
    if total:
        n_h, h_d = merged.get("n_heads"), merged.get("head_dim")
        if n_h and h_d and n_h * h_d != total:
            warns.append(f"n_heads*head_dim={n_h * h_d} != attention width "
                         f"{total}; head_dim adjusted to {total // n_h}")
            merged["head_dim"] = total // n_h
        elif n_h and not h_d:
            merged["head_dim"] = total // n_h
        elif h_d and not n_h:
            merged["n_heads"] = total // h_d
        elif not n_h and not h_d:
            # published lcasr configs use head_dim 128 (lcasr160rb1.yaml:6)
            h_d = 128 if total % 128 == 0 and total >= 128 else (
                64 if total % 64 == 0 and total >= 64 else max(total // 4, 1))
            merged["head_dim"], merged["n_heads"] = h_d, total // h_d
            warns.append(f"checkpoint config carries no head split; assuming "
                         f"head_dim={h_d} (the published lcasr convention) — "
                         "pass an explicit config yaml if this is wrong")
    return merged, warns


def _overlay_on_template(model, config: ConformerConfig, converted: Dict):
    """strict=False state-dict-load semantics (``lcasr/run.py:46``): start
    from a fresh init, overwrite every leaf the converter produced, keep init
    values for missing leaves, drop extras — and fail loudly on any shape
    mismatch (a silently misloaded tensor is the one unrecoverable case)."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    x = jnp.zeros((1, config.feat_in, 8 * config.subsampling_factor), jnp.float32)
    template = model.init({"params": jax.random.PRNGKey(0)}, x)
    flat_t = flatten_dict(jax.tree.map(np.asarray, template))
    flat_c = flatten_dict(converted)
    missing = sorted("/".join(k) for k in flat_t.keys() - flat_c.keys())
    extra = sorted("/".join(k) for k in flat_c.keys() - flat_t.keys())
    bad = [
        f"{'/'.join(k)}: checkpoint {np.shape(flat_c[k])} vs model {np.shape(flat_t[k])}"
        for k in flat_t.keys() & flat_c.keys()
        if np.shape(flat_c[k]) != np.shape(flat_t[k])
    ]
    if bad:
        raise ValueError("checkpoint/model shape mismatches:\n  " + "\n  ".join(bad))
    merged = dict(flat_t)
    for k in flat_t.keys() & flat_c.keys():
        merged[k] = flat_c[k]
    variables = jax.tree.map(jnp.asarray, unflatten_dict(merged))
    return variables, missing, extra


def load_reference_torch_checkpoint(
    path: str, compute_dtype: Any = None, verbose: bool = True,
):
    """A reference torch checkpoint → ``(model, variables, config)``.

    Mirrors the reference's own load path (``lcasr/run.py:37-47``): config
    from ``checkpoint['config']`` (weight shapes fill/override structure),
    DDP-prefix conversion, strict=False load.  Conversion fidelity is proven
    by the torch oracles (``tests/test_conformer_oracle.py``)."""
    import sys

    from dynamic_asr_eval_tpu.models.convert import convert_lcasr_checkpoint

    state_np, raw_cfg = load_torch_checkpoint(path)
    cfg_plain = _plain_config(raw_cfg)
    model_cfg = dict(cfg_plain.get("model", cfg_plain) or {}) if isinstance(cfg_plain, dict) else {}
    dims = infer_conformer_dims(state_np)
    if not dims.get("n_layers") or "d_model" not in dims:
        raise ValueError(
            f"{path}: state dict does not look like an lcasr conformer "
            f"checkpoint ({len(state_np)} tensors; expected layers.N.* / "
            "decoder.* naming). For NeMo-style checkpoints use "
            "models.nemo_convert; for wav2vec2 use models.wav2vec2.load_hf_weights."
        )
    merged, warns = _merge_reference_config(model_cfg, dims)
    if compute_dtype is not None:
        merged["compute_dtype"] = compute_dtype
    config = ConformerConfig.from_dict(merged)
    converted, unmatched = convert_lcasr_checkpoint(state_np, config.default_norm)
    model = SCConformer(config)
    variables, missing, extra = _overlay_on_template(model, config, converted)
    if verbose:
        for w in warns:
            print(f"load_reference_torch_checkpoint: WARNING {w}", file=sys.stderr)
        if unmatched:
            print(f"load_reference_torch_checkpoint: {len(unmatched)} torch keys "
                  f"had no conversion rule (first: {unmatched[:4]})", file=sys.stderr)
        if missing:
            print(f"load_reference_torch_checkpoint: {len(missing)} model params "
                  f"kept their fresh init (strict=False; first: {missing[:4]})",
                  file=sys.stderr)
        if extra:
            print(f"load_reference_torch_checkpoint: {len(extra)} converted "
                  f"tensors unused by the model (first: {extra[:4]})", file=sys.stderr)
    return model, variables, config


def load_any_checkpoint(path: str, compute_dtype: Any = None):
    """Format-sniffing load: native DAE msgpack or a reference torch pickle
    → ``(model, variables, config)``.  This is what the eval drivers call, so
    a reference user's existing ``.pt`` checkpoints work unchanged."""
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == _MAGIC:
        return load_checkpoint(path)
    return load_reference_torch_checkpoint(path, compute_dtype=compute_dtype)


def infer_encdec_decoder_dims(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Structural decoder dims implied by an enc-dec torch state dict
    (``convert.ENCDEC_DECODER_RULES`` naming)."""
    import re as _re

    dims: Dict[str, Any] = {}
    dec_ids = {int(m.group(1)) for k in state
               for m in [_re.match(r"dec_layers\.(\d+)\.", k)] if m}
    if dec_ids:
        dims["decoder_layers"] = max(dec_ids) + 1
    emb = state.get("embed.weight")
    if emb is not None:
        dims["decoder_d_model"] = int(emb.shape[1])
    pos = state.get("pos_enc.weight")
    if pos is not None:
        dims["max_text_len"] = int(pos.shape[0]) - 1
    qkv = state.get("dec_layers.0.self_qkv.weight")
    if qkv is not None:
        dims["_self_attn_total"] = int(qkv.shape[0]) // 3
    return dims


def load_encdec_torch_checkpoint(
    path: str, compute_dtype: Any = None, verbose: bool = True,
):
    """A reference enc-dec (attention-decoder + joint CTC) torch checkpoint →
    ``(model, variables, config)`` using the oracle-proven
    ``convert_encdec_checkpoint`` (``tests/test_encdec_oracle.py``)."""
    import sys

    from dynamic_asr_eval_tpu.models.convert import convert_encdec_checkpoint
    from dynamic_asr_eval_tpu.models.encdec import EncDecConfig, EncDecConformer

    state_np, raw_cfg = load_torch_checkpoint(path)
    cfg_plain = _plain_config(raw_cfg)
    model_cfg = dict(cfg_plain.get("model", cfg_plain) or {}) if isinstance(cfg_plain, dict) else {}

    enc_state = {k[len("encoder."):]: v for k, v in state_np.items()
                 if k.startswith("encoder.")}
    dec_state = {k: v for k, v in state_np.items() if not k.startswith("encoder.")}
    if not enc_state or "embed.weight" not in dec_state:
        raise ValueError(f"{path}: not an enc-dec checkpoint (need encoder.* "
                         "keys and a decoder embed.weight)")

    enc_cfg_d = dict(model_cfg.get("encoder", model_cfg) or {})
    enc_dims = infer_conformer_dims(enc_state)
    enc_merged, warns = _merge_reference_config(enc_cfg_d, enc_dims)
    if compute_dtype is not None:
        enc_merged["compute_dtype"] = compute_dtype
    enc_config = ConformerConfig.from_dict(enc_merged)

    dec_dims = infer_encdec_decoder_dims(dec_state)
    self_total = dec_dims.pop("_self_attn_total", None)
    dec_merged = {k: v for k, v in model_cfg.items()
                  if k in ("decoder_layers", "decoder_d_model", "decoder_heads",
                           "decoder_ff_mult", "max_text_len", "bos_id", "eos_id",
                           "ctc_loss_weight")}
    dec_merged.update(dec_dims)
    if "decoder_heads" not in dec_merged and dec_merged.get("decoder_d_model"):
        d = self_total or dec_merged["decoder_d_model"]
        # EncDecConfig convention: head_dim 64 where divisible
        h_d = 64 if d % 64 == 0 and d >= 64 else max(d // 4, 1)
        dec_merged["decoder_heads"] = d // h_d
        warns.append(f"checkpoint config carries no decoder head count; "
                     f"assuming head_dim={h_d}")
    config = EncDecConfig(encoder=enc_config, **dec_merged)

    converted, unmatched = convert_encdec_checkpoint(
        state_np, enc_config.default_norm)
    model = EncDecConformer(config)

    from flax.traverse_util import flatten_dict, unflatten_dict

    x = jnp.zeros((1, enc_config.feat_in, 8 * enc_config.subsampling_factor),
                  jnp.float32)
    toks = jnp.zeros((1, 4), jnp.int32)
    template = model.init({"params": jax.random.PRNGKey(0)}, x,
                          text_bos=toks, text_lengths=jnp.array([4]))
    flat_t = flatten_dict(jax.tree.map(np.asarray, template))
    flat_c = flatten_dict(converted)
    bad = [
        f"{'/'.join(k)}: checkpoint {np.shape(flat_c[k])} vs model {np.shape(flat_t[k])}"
        for k in flat_t.keys() & flat_c.keys()
        if np.shape(flat_c[k]) != np.shape(flat_t[k])
    ]
    if bad:
        raise ValueError("checkpoint/model shape mismatches:\n  " + "\n  ".join(bad))
    merged_flat = dict(flat_t)
    for k in flat_t.keys() & flat_c.keys():
        merged_flat[k] = flat_c[k]
    variables = jax.tree.map(jnp.asarray, unflatten_dict(merged_flat))
    if verbose:
        for w in warns:
            print(f"load_encdec_torch_checkpoint: WARNING {w}", file=sys.stderr)
        if unmatched:
            print(f"load_encdec_torch_checkpoint: {len(unmatched)} torch keys "
                  f"unconverted (first: {unmatched[:4]})", file=sys.stderr)
        missing = sorted("/".join(k) for k in flat_t.keys() - flat_c.keys())
        if missing:
            print(f"load_encdec_torch_checkpoint: {len(missing)} params kept "
                  f"fresh init (first: {missing[:4]})", file=sys.stderr)
    return model, variables, config
