"""NeMo conformer checkpoint conversion + presets.

Reference surface: ``nvidia_ctc/lib.py:12-14`` loads a pretrained NeMo
conformer-CTC (downsampling factor 8 ⇒ the fastconformer dw_striding family)
and ``lcasr_nemo/lib.py:24-29`` rebuilds an old lcasr NeMo-style checkpoint
via ``load_from_old_state_dict``.  Neither NeMo nor the external ``lcasr``
package is importable here, so this module provides:

- :data:`NEMO_PRESETS` — ``load_defaul_instance``-style model configs
  (``ConformerConfig`` with ``position_encoding='rel_pos'``);
- :func:`convert_nemo_state_dict` — a complete mapping table from NeMo
  ``ConformerEncoder`` (dw_striding) + ``ConvASRDecoder`` torch naming to
  this package's flax tree, covering weights, biases, and batch-norm running
  statistics;
- :func:`load_from_old_state_dict` — reference-named entry point: torch
  pickle path or state dict → (model, variables).

Conversion is validated shape-complete in ``tests/test_nemo_convert.py``
against a synthetically NeMo-named state dict (a real NeMo export uses the
same names/shapes; NeMo itself is not in this image).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from dynamic_asr_eval_tpu.models.conformer import ConformerConfig

NEMO_PRESETS: Dict[str, ConformerConfig] = {
    # nvidia/stt_en_fastconformer_ctc_large (ds 8, rel-pos, dw_striding)
    "stt_en_fastconformer_ctc_large": ConformerConfig(
        feat_in=80,
        n_layers=17,
        d_model=512,
        n_heads=8,
        head_dim=64,
        vocab_size=1024,
        subsampling_factor=8,
        subsampling_conv_channels=256,
        subsampling_act="relu",
        conv_kernel_size=9,
        position_encoding="rel_pos",
        input_xscale=True,
        bias_in_attn=True,
        bias_in_ff=True,
        self_conditioning=False,
        decoder_norm=False,
        default_norm="batch_norm",
        use_rotary=False,
    ),
}


def load_default_instance(name: str = "stt_en_fastconformer_ctc_large") -> ConformerConfig:
    """``nemo_sconformer.load_defaul_instance`` parity (lcasr_nemo/lib.py:27)."""
    return NEMO_PRESETS[name]


def _np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def convert_nemo_state_dict(
    state_dict: Dict[str, Any], config: ConformerConfig
) -> Dict[str, Any]:
    """NeMo ConformerEncoder (dw_striding) + ConvASRDecoder torch state dict
    → flax ``{'params': ..., 'batch_stats': ...}`` for :class:`SCConformer`.

    Key families handled (NeMo 1.x naming):
      encoder.pre_encode.conv.{0,2,3,5,6}.{weight,bias}   subsampling
      encoder.pre_encode.out.{weight,bias}                flatten projection
      encoder.layers.N.norm_*.{weight,bias}               pre-norms
      encoder.layers.N.feed_forward{1,2}.linear{1,2}.*    macaron FFs
      encoder.layers.N.self_attn.linear_{q,k,v,out,pos}.* rel-pos attention
      encoder.layers.N.self_attn.pos_bias_{u,v}
      encoder.layers.N.conv.{pointwise_conv1,depthwise_conv,batch_norm,
                             pointwise_conv2}.*           conv module
      decoder.decoder_layers.0.{weight,bias}              1×1 conv CTC head
    """
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): _np(v)
        for k, v in state_dict.items()
    }

    def dense(prefix, transpose=True):
        out = {"kernel": sd[f"{prefix}.weight"].T if transpose else sd[f"{prefix}.weight"]}
        if f"{prefix}.bias" in sd:
            out["bias"] = sd[f"{prefix}.bias"]
        return out

    def lnorm(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    p: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # -- subsampling (dw_striding): conv indices 0 (full), 2/5 (depthwise),
    # 3/6 (pointwise); torch Conv2d [out, in/groups, kh, kw] → flax
    # [kh, kw, in/groups, out]
    sub: Dict[str, Any] = {}
    sub["conv_in_kernel"] = np.transpose(sd["encoder.pre_encode.conv.0.weight"], (2, 3, 1, 0))
    sub["conv_in_bias"] = sd["encoder.pre_encode.conv.0.bias"]
    n_stages = {2: 1, 4: 2, 8: 3}[config.subsampling_factor]
    for i in range(n_stages - 1):
        dw = 2 + 3 * i
        pw = 3 + 3 * i
        w = sd[f"encoder.pre_encode.conv.{dw}.weight"]  # [C, 1, 3, 3]
        sub[f"dw_conv_{i}_kernel"] = np.transpose(w, (2, 3, 1, 0))
        sub[f"dw_conv_{i}_bias"] = sd[f"encoder.pre_encode.conv.{dw}.bias"]
        sub[f"pw_conv_{i}"] = {
            "kernel": np.transpose(sd[f"encoder.pre_encode.conv.{pw}.weight"], (2, 3, 1, 0)),
            "bias": sd[f"encoder.pre_encode.conv.{pw}.bias"],
        }
    # flatten projection: NeMo flattens [B, C, T, F] channel-major (c·F+f),
    # this model flattens [B, T, F, C] feature-major (f·C+c) — permute input
    C = config.subsampling_conv_channels
    w = sd["encoder.pre_encode.out.weight"]  # [d, C*F_ds]
    F_ds = w.shape[1] // C
    w = w.reshape(w.shape[0], C, F_ds).transpose(0, 2, 1).reshape(w.shape[0], -1)
    sub["out"] = {"kernel": w.T, "bias": sd["encoder.pre_encode.out.bias"]}
    p["subsampling"] = sub

    # -- conformer blocks
    H, D = config.n_heads, config.head_dim
    for n in range(config.n_layers):
        e = f"encoder.layers.{n}"
        qk = dense(f"{e}.self_attn.linear_q")
        kk = dense(f"{e}.self_attn.linear_k")
        vk = dense(f"{e}.self_attn.linear_v")
        attn: Dict[str, Any] = {
            "LayerNorm_0": lnorm(f"{e}.norm_self_att"),
            "qkv": {
                "kernel": np.concatenate([qk["kernel"], kk["kernel"], vk["kernel"]], axis=1),
            },
            "out": dense(f"{e}.self_attn.linear_out"),
            "linear_pos": dense(f"{e}.self_attn.linear_pos"),
            "pos_bias_u": sd[f"{e}.self_attn.pos_bias_u"].reshape(H, D),
            "pos_bias_v": sd[f"{e}.self_attn.pos_bias_v"].reshape(H, D),
        }
        if "bias" in qk:
            attn["qkv"]["bias"] = np.concatenate([qk["bias"], kk["bias"], vk["bias"]])

        def ff(idx):
            return {
                "LayerNorm_0": lnorm(f"{e}.norm_feed_forward{idx}"),
                "in": dense(f"{e}.feed_forward{idx}.linear1"),
                "out": dense(f"{e}.feed_forward{idx}.linear2"),
            }

        # conv module: torch Conv1d [out, in/groups, k]
        pw1 = sd[f"{e}.conv.pointwise_conv1.weight"][:, :, 0].T  # [d, 2d]
        pw2 = sd[f"{e}.conv.pointwise_conv2.weight"][:, :, 0].T
        dwk = np.transpose(sd[f"{e}.conv.depthwise_conv.weight"], (2, 1, 0))  # [K,1,d]
        conv: Dict[str, Any] = {
            "LayerNorm_0": lnorm(f"{e}.norm_conv"),
            "pw1": {"kernel": pw1},
            "dw_kernel": dwk,
            "dw_bias": sd.get(
                f"{e}.conv.depthwise_conv.bias", np.zeros((config.d_model,), np.float32)
            ),
            "pw2": {"kernel": pw2},
            "norm": {
                "BatchRenorm_0": {
                    "scale": sd[f"{e}.conv.batch_norm.weight"],
                    "bias": sd[f"{e}.conv.batch_norm.bias"],
                }
            },
        }
        if f"{e}.conv.pointwise_conv1.bias" in sd:
            conv["pw1"]["bias"] = sd[f"{e}.conv.pointwise_conv1.bias"]
            conv["pw2"]["bias"] = sd[f"{e}.conv.pointwise_conv2.bias"]

        p[f"layer_{n}"] = {
            "ff1": ff(1),
            "attn": attn,
            "conv": conv,
            "ff2": ff(2),
            "norm_out": lnorm(f"{e}.norm_out"),
        }
        stats[f"layer_{n}"] = {
            "conv": {
                "norm": {
                    "BatchRenorm_0": {
                        "mean": sd[f"{e}.conv.batch_norm.running_mean"],
                        "var": sd[f"{e}.conv.batch_norm.running_var"],
                    }
                }
            }
        }

    # -- CTC head: NeMo ConvASRDecoder is a 1×1 Conv1d [V+1, d, 1]
    dec_w = sd["decoder.decoder_layers.0.weight"][:, :, 0]  # [V+1, d]
    p["decoder"] = {"kernel": dec_w.T, "bias": sd["decoder.decoder_layers.0.bias"]}

    import jax.numpy as jnp
    import jax

    out = {"params": jax.tree.map(jnp.asarray, p),
           "batch_stats": jax.tree.map(jnp.asarray, stats)}
    return out


def load_from_old_state_dict(
    path_or_sd,
    config: Optional[ConformerConfig] = None,
    instance: Optional[ConformerConfig] = None,
) -> Tuple[Any, Dict[str, Any]]:
    """``nemo_sconformer.load_from_old_state_dict`` parity
    (lcasr_nemo/lib.py:24-29): torch pickle path (or a loaded state dict)
    with optional DDP prefixes → (SCConformer, variables)."""
    from dynamic_asr_eval_tpu.models.conformer import SCConformer

    config = config or instance or load_default_instance()
    if isinstance(path_or_sd, (str,)):
        import torch

        ckpt = torch.load(path_or_sd, map_location="cpu", weights_only=False)
        sd = ckpt.get("model", ckpt.get("state_dict", ckpt)) if isinstance(ckpt, dict) else ckpt
    else:
        sd = path_or_sd
    variables = convert_nemo_state_dict(sd, config)
    return SCConformer(config), variables
