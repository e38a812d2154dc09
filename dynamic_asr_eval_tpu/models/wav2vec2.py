"""wav2vec2-CTC backend (waveform-domain).

Capability parity with the reference's HuggingFace backend
(``wav2vec2/lib.py:20-23`` loads ``facebook/wav2vec2-base-960h`` via
``AutoModelForCTC``; TTA operates directly on waveforms).  TPU-native
re-implementation of the wav2vec2-base architecture in flax:

- feature encoder: 7 temporal convs (512ch; k10/s5 then k3/s2 ×4 then
  k2/s2 ×2), group-norm on the first layer, GELU;
- feature projection (layer-norm → linear 512→768 → dropout);
- transformer encoder: convolutional relative positional embedding
  (k128, 16 groups) + 12 pre-norm blocks (12 heads, d768, ff 3072);
- CTC head: linear to vocab (char vocab, blank id 0 in HF convention —
  configurable).

``load_hf_weights`` converts a HuggingFace torch state dict (torch is
CPU-only in this image, which suffices for conversion).  The model exposes
the same call surface as the conformer (``audio_signal [B, 1, T]`` or
``[B, T]`` → ``{'final_posteriors', 'length'}``) so every TTA engine works
unchanged on the waveform domain.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    vocab_size: int = 32
    blank_id: int = 0  # HF wav2vec2 CTC convention: <pad> == blank == 0
    hidden: int = 768
    n_layers: int = 12
    n_heads: int = 12
    ff_dim: int = 3072
    conv_dim: int = 512
    conv_kernels: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_strides: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    # HF ``do_stable_layer_norm``: False for wav2vec2-base (POST-norm encoder
    # blocks, encoder LayerNorm before the block stack), True for the -large
    # lv60 family (pre-norm blocks, encoder LayerNorm after the stack)
    stable_layer_norm: bool = False
    layer_norm_eps: float = 1e-5  # HF default (flax's default is 1e-6)
    # The reference pipeline runs EVERY waveform through the HF processor's
    # feature extractor before the model (``wav2vec2/lib.py:161,406``), whose
    # ``do_normalize=True`` (the -base-960h default) applies per-sequence
    # zero-mean/unit-var normalization ``(x - mean)/sqrt(var + 1e-7)``.  The
    # HF MODEL itself does not normalize, so this stays False for the
    # converter-parity tests; the wav2vec2 drivers enable it to reproduce the
    # full reference pipeline (stats over the valid length only, so padded
    # bucket forwards equal unpadded ones).
    normalize_input: bool = False
    compute_dtype: Any = jnp.float32

    @property
    def n_classes(self) -> int:
        return self.vocab_size

    @property
    def downsampling_factor(self) -> int:
        f = 1
        for s in self.conv_strides:
            f *= s
        return f  # 320


def feat_extract_output_lengths(cfg: Wav2Vec2Config, input_length):
    L = input_length
    for k, s in zip(cfg.conv_kernels, cfg.conv_strides):
        L = (L - k) // s + 1
    return L


class MaskedGroupNorm(nn.Module):
    """Per-channel (num_groups == channels) group norm over time, with
    padding frames excluded from the statistics.  HF's GroupNorm normalizes
    over padded frames too, making outputs depend on padding length — here
    padded execution is the norm (static shapes), so stats are masked."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask):  # x [B, T, C], mask [B, T]
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        m = mask[..., None].astype(jnp.float32)
        cnt = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
        xf = x.astype(jnp.float32)
        mean = (xf * m).sum(axis=1, keepdims=True) / cnt
        var = ((xf - mean) ** 2 * m).sum(axis=1, keepdims=True) / cnt
        out = (xf - mean) / jnp.sqrt(var + self.eps) * scale + bias
        return out.astype(x.dtype)


class FeatureEncoder(nn.Module):
    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x, length):  # [B, T], [B]
        cfg = self.config
        h = x[..., None]  # [B, T, 1]
        L = length
        for i, (k, s) in enumerate(zip(cfg.conv_kernels, cfg.conv_strides)):
            h = nn.Conv(cfg.conv_dim, (k,), strides=(s,), padding="VALID",
                        use_bias=False, dtype=cfg.compute_dtype,
                        param_dtype=jnp.float32, name=f"conv_{i}")(h)
            L = (L - k) // s + 1
            if i == 0:
                m = jnp.arange(h.shape[1])[None, :] < L[:, None]
                h = MaskedGroupNorm(cfg.conv_dim, name="gn")(h, m)
            h = jax.nn.gelu(h, approximate=False)  # HF nn.GELU is erf-exact
        return h  # [B, T', conv_dim]


class EncoderBlock(nn.Module):
    """One transformer block.  ``stable_layer_norm=False`` (wav2vec2-base,
    HF ``Wav2Vec2EncoderLayer``) is POST-norm: ``ln1`` normalizes after the
    attention residual, ``ln2`` after the FF residual.  ``True`` (the -large
    lv60 family, ``Wav2Vec2EncoderLayerStableLayerNorm``) is pre-norm."""

    config: Wav2Vec2Config

    def _attn(self, x, mask):
        cfg = self.config
        H = cfg.n_heads
        D = cfg.hidden // H
        qkv = nn.Dense(3 * cfg.hidden, dtype=x.dtype, param_dtype=jnp.float32,
                       name="qkv")(x)
        B, T, _ = x.shape
        q, k, v = jnp.split(qkv.reshape(B, T, 3, H, D), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        logits = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(D)
        logits = jnp.where(mask[:, None, None, :], logits, -1e30)
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, cfg.hidden)
        return nn.Dense(cfg.hidden, dtype=x.dtype, param_dtype=jnp.float32,
                        name="attn_out")(out)

    def _ff(self, x):
        cfg = self.config
        h = nn.Dense(cfg.ff_dim, dtype=x.dtype, param_dtype=jnp.float32,
                     name="ff_in")(x)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(cfg.hidden, dtype=x.dtype, param_dtype=jnp.float32,
                        name="ff_out")(h)

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        ln1 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=x.dtype,
                           param_dtype=jnp.float32, name="ln1")
        ln2 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=x.dtype,
                           param_dtype=jnp.float32, name="ln2")
        if cfg.stable_layer_norm:
            x = x + self._attn(ln1(x), mask)
            return x + self._ff(ln2(x))
        x = ln1(x + self._attn(x, mask))
        return ln2(x + self._ff(x))


class Wav2Vec2ForCTC(nn.Module):
    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, audio_signal, length: Optional[jnp.ndarray] = None,
                 deterministic: bool = True, **_):
        cfg = self.config
        x = audio_signal
        if x.ndim == 3:  # [B, 1, T] engine convention
            x = x[:, 0, :]
        B, T = x.shape
        if length is None:
            length = jnp.full((B,), T, jnp.int32)
        smask = jnp.arange(T)[None, :] < length[:, None]
        x = jnp.where(smask, x, 0.0)
        if cfg.normalize_input:
            # HF Wav2Vec2FeatureExtractor.zero_mean_unit_var_norm over the
            # valid samples (population variance, eps 1e-7)
            cnt = jnp.maximum(length.astype(jnp.float32), 1.0)[:, None]
            mean = x.sum(axis=1, keepdims=True) / cnt
            var = (jnp.square(x - mean) * smask).sum(axis=1, keepdims=True) / cnt
            x = jnp.where(smask, (x - mean) / jnp.sqrt(var + 1e-7), 0.0)

        feats = FeatureEncoder(cfg, name="feature_encoder")(x, length)
        Tf = feats.shape[1]
        out_len = feat_extract_output_lengths(cfg, length).astype(jnp.int32)
        fmask = jnp.arange(Tf)[None, :] < out_len[:, None]

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=feats.dtype,
                         param_dtype=jnp.float32, name="proj_norm")(feats)
        h = nn.Dense(cfg.hidden, dtype=cfg.compute_dtype, param_dtype=jnp.float32,
                     name="proj")(h)
        h = jnp.where(fmask[..., None], h, 0)

        # convolutional positional embedding.  HF pads k//2 on BOTH sides and
        # then trims one trailing frame when k is even (Wav2Vec2SamePadLayer)
        # — as explicit asymmetric padding that is (k//2, (k-1)//2); flax's
        # "SAME" would put the larger pad on the right and shift by one frame
        kpos = cfg.pos_conv_kernel
        pos = nn.Conv(cfg.hidden, (kpos,), padding=((kpos // 2, (kpos - 1) // 2),),
                      feature_group_count=cfg.pos_conv_groups,
                      dtype=cfg.compute_dtype, param_dtype=jnp.float32,
                      name="pos_conv")(h)
        h = h + jax.nn.gelu(pos, approximate=False)
        enc_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=h.dtype,
                                param_dtype=jnp.float32, name="enc_norm")
        if not cfg.stable_layer_norm:  # base: norm BEFORE the block stack
            h = enc_norm(h)

        for i in range(cfg.n_layers):
            h = EncoderBlock(cfg, name=f"layer_{i}")(h, fmask)

        if cfg.stable_layer_norm:  # lv60: norm AFTER the block stack
            h = enc_norm(h)

        logits = nn.Dense(cfg.vocab_size, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="lm_head")(h)
        return {
            "final_posteriors": jax.nn.log_softmax(logits, axis=-1),
            "length": out_len,
            "a_hidden": h,
        }


def init_wav2vec2(config: Wav2Vec2Config, rng, example_T: int = 16000):
    model = Wav2Vec2ForCTC(config)
    x = jnp.zeros((1, example_T), jnp.float32)
    variables = jax.jit(model.init)({"params": rng}, x)
    return model, variables


# ---------------------------------------------------------------------------
# HuggingFace checkpoint conversion
# ---------------------------------------------------------------------------

def load_hf_weights(state_dict: Dict[str, Any], config: Wav2Vec2Config) -> Dict:
    """Convert a HF ``Wav2Vec2ForCTC`` torch state dict into this model's
    parameter tree (numerically validated in tests/test_convert_parity.py).
    Dense kernels transpose [out,in]→[in,out]; convs [out,in,k]→[k,in,out];
    weight-normed pos-conv weights are materialized.  Accepts torch tensors
    or numpy values, with or without a DDP ``module.`` prefix."""
    state_dict = {
        (k[len("module."):] if k.startswith("module.") else k):
            (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }
    p: Dict[str, Any] = {}

    def dense(prefix_hf, w="weight", b="bias"):
        out = {"kernel": state_dict[f"{prefix_hf}.{w}"].T}
        if f"{prefix_hf}.{b}" in state_dict:
            out["bias"] = state_dict[f"{prefix_hf}.{b}"]
        return out

    def ln(prefix_hf):
        return {"scale": state_dict[f"{prefix_hf}.weight"],
                "bias": state_dict[f"{prefix_hf}.bias"]}

    fe = {}
    for i in range(len(config.conv_kernels)):
        w = state_dict[f"wav2vec2.feature_extractor.conv_layers.{i}.conv.weight"]
        fe[f"conv_{i}"] = {"kernel": np.transpose(w, (2, 1, 0))}
    g = "wav2vec2.feature_extractor.conv_layers.0.layer_norm"
    fe["gn"] = {"scale": state_dict[f"{g}.weight"], "bias": state_dict[f"{g}.bias"]}
    p["feature_encoder"] = fe

    p["proj_norm"] = ln("wav2vec2.feature_projection.layer_norm")
    p["proj"] = dense("wav2vec2.feature_projection.projection")

    # pos-conv weights ship weight-normed: torch>=2.1 stores
    # ``parametrizations.weight.original0`` (the magnitude g, [1,1,k]) and
    # ``original1`` (the direction v, [out, in/groups, k]) with dim=2
    # (HF Wav2Vec2PositionalConvEmbedding); torch<2.1 used ``weight_g`` /
    # ``weight_v``; a de-parametrized export has a plain ``weight``
    pcp = "wav2vec2.encoder.pos_conv_embed.conv"
    if f"{pcp}.parametrizations.weight.original0" in state_dict:
        g = np.asarray(state_dict[f"{pcp}.parametrizations.weight.original0"])
        v = np.asarray(state_dict[f"{pcp}.parametrizations.weight.original1"])
        norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=(0, 1), keepdims=True))
        w = (g * v / norm).astype(v.dtype)
    elif f"{pcp}.weight_g" in state_dict:
        g = np.asarray(state_dict[f"{pcp}.weight_g"])
        v = np.asarray(state_dict[f"{pcp}.weight_v"])
        norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=(0, 1), keepdims=True))
        w = (g * v / norm).astype(v.dtype)
    else:
        w = np.asarray(state_dict[f"{pcp}.weight"])
    pc = {"kernel": np.transpose(w, (2, 1, 0)),
          "bias": state_dict[f"{pcp}.bias"]}
    p["pos_conv"] = pc
    p["enc_norm"] = ln("wav2vec2.encoder.layer_norm")

    for i in range(config.n_layers):
        hf = f"wav2vec2.encoder.layers.{i}"
        qk = dense(f"{hf}.attention.q_proj")
        kk = dense(f"{hf}.attention.k_proj")
        vk = dense(f"{hf}.attention.v_proj")
        qkv_kernel = np.concatenate([qk["kernel"], kk["kernel"], vk["kernel"]], axis=1)
        qkv_bias = np.concatenate([qk["bias"], kk["bias"], vk["bias"]])
        p[f"layer_{i}"] = {
            "ln1": ln(f"{hf}.layer_norm"),
            "qkv": {"kernel": qkv_kernel, "bias": qkv_bias},
            "attn_out": dense(f"{hf}.attention.out_proj"),
            "ln2": ln(f"{hf}.final_layer_norm"),
            "ff_in": dense(f"{hf}.feed_forward.intermediate_dense"),
            "ff_out": dense(f"{hf}.feed_forward.output_dense"),
        }
    p["lm_head"] = dense("lm_head")
    return jax.tree.map(jnp.asarray, {"params": p})
