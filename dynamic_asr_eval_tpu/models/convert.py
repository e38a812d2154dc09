"""Rule-driven torch → JAX weight conversion for conformer checkpoints.

The reference loads published torch checkpoints of the external ``lcasr``
SCConformerXL (``lcasr/run.py:37-47``).  That package's module naming is not
vendored in the reference tree, so this converter is *rule-driven*: a mapping
table of (regex over torch keys → parameter path in this model) plus shape
adapters (dense kernels transpose, conv kernels reorder, qkv fusion).  The
default rules cover the naming conventions the config schema implies
(``subsampling``, ``layers.N`` blocks with macaron FF / attention / conv
module, shared ``decoder`` CTC head); unmatched keys are reported so a new
checkpoint's scheme can be mapped by extending the table — the fidelity
check is ``parity_report`` (same input, max |Δlog-prob|), per SURVEY.md §7.2.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def t_dense(w):  # torch Linear [out, in] → flax kernel [in, out]
    return np.asarray(w).T


def t_conv1d(w):  # torch Conv1d [out, in/groups, k] → flax [k, in/groups, out]
    return np.transpose(np.asarray(w), (2, 1, 0))


def t_conv1d_pw(w):  # torch 1×1 Conv1d [out, in, 1] → flax Dense kernel [in, out]
    # the conv-module pointwise convs are nn.Dense in the flax model
    # (models/conformer.py ConvModule) — squeeze the kernel tap, transpose
    return np.asarray(w)[:, :, 0].T


def t_conv2d(w):  # torch Conv2d [out, in/groups, kh, kw] → flax [kh, kw, in/groups, out]
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def identity(w):
    return np.asarray(w)


# (torch-key regex → (target path template, adapter)); \1.. backrefs allowed
DEFAULT_RULES: List[Tuple[str, str, Callable]] = [
    # subsampling
    (r"subsampling\.conv_in\.weight", "subsampling/conv_in_kernel", t_conv2d),
    (r"subsampling\.conv_in\.bias", "subsampling/conv_in_bias", identity),
    (r"subsampling\.dw_conv\.(\d+)\.weight", r"subsampling/dw_conv_\1_kernel", t_conv2d),
    (r"subsampling\.dw_conv\.(\d+)\.bias", r"subsampling/dw_conv_\1_bias", identity),
    (r"subsampling\.pw_conv\.(\d+)\.weight", r"subsampling/pw_conv_\1/kernel", t_conv2d),
    (r"subsampling\.pw_conv\.(\d+)\.bias", r"subsampling/pw_conv_\1/bias", identity),
    (r"subsampling\.out\.weight", "subsampling/out/kernel", t_dense),
    (r"subsampling\.out\.bias", "subsampling/out/bias", identity),
    # conformer blocks
    (r"layers\.(\d+)\.ff1\.in_proj\.weight", r"layer_\1/ff1/in/kernel", t_dense),
    (r"layers\.(\d+)\.ff1\.out_proj\.weight", r"layer_\1/ff1/out/kernel", t_dense),
    (r"layers\.(\d+)\.ff2\.in_proj\.weight", r"layer_\1/ff2/in/kernel", t_dense),
    (r"layers\.(\d+)\.ff2\.out_proj\.weight", r"layer_\1/ff2/out/kernel", t_dense),
    (r"layers\.(\d+)\.attn\.qkv\.weight", r"layer_\1/attn/qkv/kernel", t_dense),
    (r"layers\.(\d+)\.attn\.out\.weight", r"layer_\1/attn/out/kernel", t_dense),
    (r"layers\.(\d+)\.attn\.out\.bias", r"layer_\1/attn/out/bias", identity),
    (r"layers\.(\d+)\.conv\.pw1\.weight", r"layer_\1/conv/pw1/kernel", t_conv1d_pw),
    (r"layers\.(\d+)\.conv\.pw1\.bias", r"layer_\1/conv/pw1/bias", identity),
    (r"layers\.(\d+)\.conv\.dw\.weight", r"layer_\1/conv/dw_kernel", t_conv1d),
    (r"layers\.(\d+)\.conv\.dw\.bias", r"layer_\1/conv/dw_bias", identity),
    (r"layers\.(\d+)\.conv\.pw2\.weight", r"layer_\1/conv/pw2/kernel", t_conv1d_pw),
    (r"layers\.(\d+)\.conv\.pw2\.bias", r"layer_\1/conv/pw2/bias", identity),
    # norms (generic pre-norms of each submodule)
    (r"layers\.(\d+)\.(ff1|ff2|attn|conv)\.norm\.weight", r"layer_\1/\2/LayerNorm_0/scale", identity),
    (r"layers\.(\d+)\.(ff1|ff2|attn|conv)\.norm\.bias", r"layer_\1/\2/LayerNorm_0/bias", identity),
    # conv-module mid-norm (between depthwise conv and SiLU), layer_norm kind
    (r"layers\.(\d+)\.conv\.norm_mid\.weight", r"layer_\1/conv/norm/LayerNorm_0/scale", identity),
    (r"layers\.(\d+)\.conv\.norm_mid\.bias", r"layer_\1/conv/norm/LayerNorm_0/bias", identity),
    (r"layers\.(\d+)\.norm_out\.weight", r"layer_\1/norm_out/scale", identity),
    (r"layers\.(\d+)\.norm_out\.bias", r"layer_\1/norm_out/bias", identity),
    # CTC head + self-conditioning
    (r"decoder_norm\.weight", "decoder_norm/scale", identity),
    (r"decoder_norm\.bias", "decoder_norm/bias", identity),
    (r"decoder\.weight", "decoder/kernel", t_dense),
    (r"decoder\.bias", "decoder/bias", identity),
    (r"self_condition_reembed\.weight", "self_condition_reembed/kernel", t_dense),
]


# batch_renorm / batch_norm conv-module mid-norms: scale/bias are params,
# running statistics go to the flax ``batch_stats`` collection (filed under
# a __batch_stats__ top-level key that convert_lcasr_checkpoint splits off)
BATCH_RENORM_RULES: List[Tuple[str, Optional[str], Optional[Callable]]] = [
    (r"layers\.(\d+)\.conv\.norm_mid\.weight", r"layer_\1/conv/norm/BatchRenorm_0/scale", identity),
    (r"layers\.(\d+)\.conv\.norm_mid\.bias", r"layer_\1/conv/norm/BatchRenorm_0/bias", identity),
    (r"layers\.(\d+)\.conv\.norm_mid\.running_mean",
     r"__batch_stats__/layer_\1/conv/norm/BatchRenorm_0/mean", identity),
    (r"layers\.(\d+)\.conv\.norm_mid\.running_var",
     r"__batch_stats__/layer_\1/conv/norm/BatchRenorm_0/var", identity),
    (r"layers\.(\d+)\.conv\.norm_mid\.num_batches_tracked", None, None),  # drop
]


def convert_state_dict(
    state: Dict[str, np.ndarray],
    rules: Optional[Sequence[Tuple[str, Optional[str], Optional[Callable]]]] = None,
) -> Tuple[Dict, List[str]]:
    """Apply the mapping rules; returns (nested params tree, unmatched keys).
    A rule whose target is ``None`` drops the key (matched but not stored)."""
    rules = list(rules or DEFAULT_RULES)
    tree: Dict = {}
    unmatched = []
    for key, value in state.items():
        for pattern, target, adapt in rules:
            m = re.fullmatch(pattern, key)
            if m:
                if target is None:
                    break
                path = m.expand(target) if "\\" in target else target
                node = tree
                parts = path.split("/")
                for p in parts[:-1]:
                    node = node.setdefault(p, {})
                node[parts[-1]] = adapt(value)
                break
        else:
            unmatched.append(key)
    return tree, unmatched


def convert_lcasr_checkpoint(
    state: Dict[str, np.ndarray],
    default_norm: str = "layer_norm",
) -> Tuple[Dict, List[str]]:
    """Full lcasr-style checkpoint → flax ``variables`` dict (``params`` +
    ``batch_stats`` when the conv-module mid-norms are batch-renorm).
    Returns (variables, unmatched keys).  Value-level fidelity is proven by
    the torch oracle (``tests/test_conformer_oracle.py``)."""
    import jax
    import jax.numpy as jnp

    rules = list(DEFAULT_RULES)
    if default_norm in ("batch_renorm", "batch_norm"):
        # mid-norm rules must outrank the layer_norm mid-norm mapping
        rules = BATCH_RENORM_RULES + rules
    tree, unmatched = convert_state_dict(state, rules)
    stats = tree.pop("__batch_stats__", None)
    variables = {"params": jax.tree.map(jnp.asarray, tree)}
    if stats:
        variables["batch_stats"] = jax.tree.map(jnp.asarray, stats)
    return variables, unmatched


# attention-decoder (enc-dec) naming: encoder under an ``encoder.`` prefix
# (lcasr rules above), decoder as embed / pos_enc / dec_layers.N / ln_f / head
ENCDEC_DECODER_RULES: List[Tuple[str, Optional[str], Optional[Callable]]] = [
    (r"embed\.weight", "language_model_decoder/embed/embedding", identity),
    (r"pos_enc\.weight", "language_model_decoder/pos_enc/embedding", identity),
    (r"dec_layers\.(\d+)\.(ln_self|ln_cross|ln_ff)\.weight",
     r"language_model_decoder/layer_\1/\2/scale", identity),
    (r"dec_layers\.(\d+)\.(ln_self|ln_cross|ln_ff)\.bias",
     r"language_model_decoder/layer_\1/\2/bias", identity),
    (r"dec_layers\.(\d+)\.(self_qkv|self_out|cross_q|cross_kv|cross_out|ff_in|ff_out)\.weight",
     r"language_model_decoder/layer_\1/\2/kernel", t_dense),
    (r"dec_layers\.(\d+)\.(ff_in|ff_out)\.bias",
     r"language_model_decoder/layer_\1/\2/bias", identity),
    (r"ln_f\.weight", "language_model_decoder/ln_f/scale", identity),
    (r"ln_f\.bias", "language_model_decoder/ln_f/bias", identity),
    (r"head\.weight", "language_model_decoder/head/kernel", t_dense),
    (r"head\.bias", "language_model_decoder/head/bias", identity),
]


def convert_encdec_checkpoint(
    state: Dict[str, np.ndarray],
    default_norm: str = "layer_norm",
) -> Tuple[Dict, List[str]]:
    """Enc-dec (attention decoder + joint CTC) torch checkpoint → flax
    ``variables`` for ``EncDecConformer``.  Encoder keys (``encoder.*``) run
    through the lcasr conformer rules; decoder keys through
    ``ENCDEC_DECODER_RULES``.  Value-level fidelity is proven by the torch
    oracle (``tests/test_encdec_oracle.py``)."""
    import jax
    import jax.numpy as jnp

    enc_state = {
        k[len("encoder."):]: v for k, v in state.items()
        if k.startswith("encoder.")
    }
    dec_state = {k: v for k, v in state.items() if not k.startswith("encoder.")}
    enc_vars, unmatched_enc = convert_lcasr_checkpoint(enc_state, default_norm)
    dec_tree, unmatched_dec = convert_state_dict(dec_state, ENCDEC_DECODER_RULES)
    params = {"encoder": enc_vars["params"], **dec_tree}
    variables = {"params": jax.tree.map(jnp.asarray, params)}
    if "batch_stats" in enc_vars:
        variables["batch_stats"] = {"encoder": enc_vars["batch_stats"]}
    unmatched = [f"encoder.{k}" for k in unmatched_enc] + unmatched_dec
    return variables, unmatched


def parity_report(model, variables, converted_params, example_input) -> float:
    """Max |Δ final log-prob| between the randomly-initialized and converted
    parameter sets on the same input — the SURVEY.md §7.2 parity harness
    (meaningful once both sides hold the same published weights)."""
    import jax.numpy as jnp

    a = model.apply(variables, example_input)["final_posteriors"]
    b = model.apply({**variables, "params": converted_params}, example_input)["final_posteriors"]
    return float(jnp.max(jnp.abs(a - b)))
