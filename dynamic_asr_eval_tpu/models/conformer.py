"""TPU-native long-context conformer-CTC encoder.

Capability parity with the reference's external ``lcasr`` SCConformerXL model
(config schema at ``earnings_finetune/lcasr160rb1.yaml:1-29``; consumed via
``model(audio_signal=chunk) -> {'final_posteriors': ...}`` at
``lcasr/lib.py:550``):

- depthwise-striding convolutional subsampling (factor 4/8), SiLU activation
- macaron conformer blocks: ½FF → MHSA → conv module (GLU → depthwise conv →
  norm → SiLU) → ½FF → final norm
- rotary position embeddings with configurable base frequency and
  interpolation factor (long-context knob, ``lcasr160rb1.yaml:22,28`` and
  rotary interpolation update at ``earnings_finetune/train.py:477-479``)
- intermediate-layer self-conditioned CTC (shared head, re-embedded interim
  softmax added back to the stream)
- LayerNorm / BatchRenorm choice for the conv-module norm
  (``default_norm`` knob; BatchRenorm surgery parity for the nvidia_ctc
  backend, ``nvidia_ctc/lib.py:89-102``)
- per-block activation rematerialization (``checkpoint_every_n_layers``)

Design is TPU-first, not a port: pure functional flax module, static shapes,
bf16 compute / fp32 params + fp32 log-softmax, length masking instead of
ragged tensors, attention as one batched einsum (Pallas flash attention can be
slotted in via ``attention_impl``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    feat_in: int = 80
    n_layers: int = 6
    d_model: int = 768
    n_heads: int = 6
    head_dim: int = 128
    vocab_size: int = 4095  # output dim = vocab_size + 1 (CTC blank, last id)
    subsampling_factor: int = 8
    subsampling: str = "dw_striding"
    subsampling_act: str = "silu"
    subsampling_conv_channels: int = 256
    subsampling_norm_out: bool = False
    conv_kernel_size: int = 9
    expansion_factor: int = 4
    self_conditioning: bool = True
    decoder_norm: bool = True
    use_rotary: bool = True
    rotary_base_freq: float = 1_500_000.0
    rotary_interpolation_factor: float = 1.0
    # position encoding: None derives from use_rotary; "rel_pos" selects
    # Transformer-XL relative attention (NeMo conformer family,
    # nvidia_ctc/lib.py:12-14 — pos_bias_u/v + sinusoidal rel embeddings)
    position_encoding: Optional[str] = None  # "rotary" | "rel_pos" | "none"
    input_xscale: bool = False  # NeMo multiplies post-subsampling by √d_model
    bias_in_attn: bool = False  # NeMo q/k/v/out projections carry biases
    default_norm: str = "layer_norm"  # or "batch_renorm" / "batch_norm"
    bias_in_ff: bool = False
    checkpoint_every_n_layers: int = 0
    dropout_ff: float = 0.0
    dropout_attn: float = 0.0
    dropout_conv: float = 0.0
    compute_dtype: Any = jnp.bfloat16
    attention_impl: str = "xla"  # "xla" | "pallas_flash" (kernels.attention)
    # materialize the [B, H, T, S] attention logits in compute_dtype instead
    # of f32 (MXU accumulation stays f32; softmax runs on the narrow tensor).
    # The NSTI adapt step is HBM-bound and these tensors are its largest
    # f32 residents — see PERF.md round-3 trace attribution
    attention_logits_in_compute_dtype: bool = False
    # run the shared CTC-head matmul ([*, d] x [d, V], applied n_layers times
    # under self-conditioning) in compute_dtype instead of f32; log_softmax
    # stays f32.  Opt-in: enable only with a measured on-chip win + drift
    # check (same policy as attention_logits_in_compute_dtype).
    head_in_compute_dtype: bool = False
    # "conv": lax.conv_general_dilated (stride-2 convs on the MXU/conv unit)
    # "xla": 9-term broadcast tap sums (VPU work; the round-2 formulation)
    # "pallas": fused VMEM kernel (kernels.subsample; factor-8 stacks with
    #   feat_in % 8 == 0 only — others fall back)
    # all three share identical parameters; "conv" measured ~1.5-2× faster
    # per adapt step in-model on v5e (see PERF.md round-3 A/B)
    subsampling_impl: str = "conv"
    # rematerialize the subsampling stack in the backward pass: the stage
    # tensors ([B, T/2^k, F/2^k, C] activations of the three stride-2 convs)
    # are the adapt step's top HBM byte mover (~12 GB/window fwd+bwd on the
    # flagship, PERF.md round-3 trace) while the stack carries <3% of the
    # FLOPs — recompute-from-input trades that traffic for one extra
    # subsample forward.  Only the bandwidth-bound train step benefits;
    # pure inference is unaffected (no backward).
    remat_subsampling: bool = False
    # sequence parallelism: (batch_axis, seq_axis) mesh-axis names.  When
    # set, block activations and the attention score matrix carry sharding
    # constraints over the time axis, so the dominant [B, H, T, T] scores
    # and per-block [B, T, d] activations are 1/sp per device — real memory
    # scaling, not placement.  Requires an active mesh context (`with mesh:`)
    # whose axis names match.  GSPMD all-gathers only K/V (T·d, small) and
    # exchanges conv halos; everything else stays time-sharded.
    seq_shard_axes: Optional[Tuple[Optional[str], str]] = None

    @property
    def pos_encoding(self) -> str:
        if self.position_encoding is not None:
            return self.position_encoding
        return "rotary" if self.use_rotary else "none"

    @property
    def blank_id(self) -> int:
        return self.vocab_size

    @property
    def n_classes(self) -> int:
        return self.vocab_size + 1

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ConformerConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


# torch nn.LayerNorm default eps — the reference model family is torch, and
# the converter parity oracle (tests/test_conformer_oracle.py) resolves at
# the 1e-4 level where flax's 1e-6 default is visible
LN_EPS = 1e-5


def _act(name: str):
    return {"silu": jax.nn.silu, "relu": jax.nn.relu, "gelu": jax.nn.gelu}[name]


def lengths_to_mask(lengths: jnp.ndarray, T: int) -> jnp.ndarray:
    return jnp.arange(T)[None, :] < lengths[:, None]


def _try_constraint(x: jnp.ndarray, spec) -> jnp.ndarray:
    """Best-effort ``with_sharding_constraint`` with a bare PartitionSpec:
    resolves against the jit call's mesh when one is present; silently a
    no-op otherwise (e.g. during ``model.init`` outside any mesh) — the
    constraint pins a layout, it never changes semantics."""
    try:
        return jax.lax.with_sharding_constraint(x, spec)
    except (RuntimeError, ValueError):
        return x


def _shard_seq(x: jnp.ndarray, axes) -> jnp.ndarray:
    """Sharding constraint over (batch, time, …) for sequence parallelism;
    no-op when ``axes`` is None."""
    if axes is None:
        return x
    from jax.sharding import PartitionSpec

    b_ax, s_ax = axes
    return _try_constraint(x, PartitionSpec(*([b_ax, s_ax] + [None] * (x.ndim - 2))))


# ---------------------------------------------------------------------------
# Rotary embeddings
# ---------------------------------------------------------------------------


def rotary_freqs(head_dim: int, base: float, T: int, interpolation: float = 1.0):
    inv = 1.0 / (base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(T, dtype=jnp.float32) / interpolation
    ang = jnp.outer(t, inv)  # [T, head_dim/2]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, H, D]; rotate pairs (x[..., ::2], x[..., 1::2])."""
    d = x.shape[-1]
    x1 = x[..., 0 : d // 2]
    x2 = x[..., d // 2 :]
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


# ---------------------------------------------------------------------------
# Relative position encoding (Transformer-XL / NeMo conformer)
# ---------------------------------------------------------------------------


def relpos_encoding(d_model: int, T: int) -> jnp.ndarray:
    """Sinusoidal embeddings for relative positions T-1 … -(T-1) — index 0
    is the most distant PAST key (NeMo RelPositionalEncoding layout).
    Returns [2T-1, d_model] float32."""
    import math

    pos = jnp.arange(T - 1, -T, -1, dtype=jnp.float32)  # [2T-1]
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    ang = pos[:, None] * div[None, :]
    pe = jnp.zeros((2 * T - 1, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(ang))
    pe = pe.at[:, 1::2].set(jnp.cos(ang))
    return pe


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Transformer-XL relative shift: x [B, H, T, 2T-1] (last axis indexed by
    pe position k ↔ relative distance T-1-k) → [B, H, T, T] where entry
    (i, j) picks k = j - i + T - 1 (relative distance i - j).  Implemented
    with the pad-reshape trick — no gather, so no [B,H,T,T] index tensor."""
    B, H, T, n = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # [B, H, T, 2T]
    x = x.reshape(B, H, 2 * T, T)[:, :, 1:, :]  # [B, H, 2T-1, T]
    return x.reshape(B, H, T, 2 * T - 1)[:, :, :, :T]


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------


class BatchRenorm(nn.Module):
    """Batch renormalization (Ioffe 2017) over the feature axis of [B, T, C]
    inputs with a time mask.  The nvidia_ctc backend swaps BatchNorm →
    BatchRenorm1d before TTA (``nvidia_ctc/lib.py:89-102``); here it is a
    first-class norm choice.  In TTA the model runs in eval mode so only
    running statistics are used (reference: ``model.eval()`` at
    ``lcasr/lib.py:527``)."""

    features: int
    momentum: float = 0.001
    eps: float = 1e-5
    rmax: float = 3.0
    dmax: float = 5.0

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = True):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            xn = (xf - mean) / jnp.sqrt(var + self.eps)
        else:
            if mask is None:
                mask = jnp.ones(x.shape[:2], bool)
            m = mask[..., None].astype(jnp.float32)
            cnt = jnp.maximum(m.sum((0, 1)), 1.0)
            mean = (xf * m).sum((0, 1)) / cnt
            var = ((xf - mean) ** 2 * m).sum((0, 1)) / cnt
            std = jnp.sqrt(var + self.eps)
            r_std = jnp.sqrt(ra_var.value + self.eps)
            r = jax.lax.stop_gradient(jnp.clip(std / r_std, 1.0 / self.rmax, self.rmax))
            d = jax.lax.stop_gradient(
                jnp.clip((mean - ra_mean.value) / r_std, -self.dmax, self.dmax)
            )
            xn = (xf - mean) / std * r + d
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var
        out = xn * scale + bias
        return out.astype(x.dtype)


class Norm(nn.Module):
    """default_norm dispatcher: layer_norm or batch_renorm."""

    features: int
    kind: str = "layer_norm"

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = True):
        if self.kind == "layer_norm":
            return nn.LayerNorm(epsilon=LN_EPS, dtype=x.dtype, param_dtype=jnp.float32)(x)
        if self.kind in ("batch_renorm", "batch_norm"):
            # "batch_norm" (NeMo conv modules) shares the BatchRenorm module:
            # in eval mode (running stats, the only mode TTA uses —
            # lcasr/lib.py:527) the two are identical, and the nvidia_ctc
            # backend's BN→BRN surgery (nvidia_ctc/lib.py:89-102) is the
            # intended train-mode behavior anyway
            return BatchRenorm(self.features)(x, mask, use_running_average)
        raise ValueError(f"unknown norm kind {self.kind}")


# ---------------------------------------------------------------------------
# Subsampling
# ---------------------------------------------------------------------------


def _taps_3x3_s2(h: jnp.ndarray):
    """[B, T, F, C] → list of 9 tensors [B, ⌈T/2⌉, ⌈F/2⌉, C], one per 3×3
    SAME stride-2 conv tap, in (dt, df) row-major order.

    Phase-reshape decomposition: strided slices have scatter gradients on
    TPU (measured: catastrophic in the backward); reshaping into even/odd
    phases and shifting the *downsampled* tensors keeps every gradient a
    pad/slice."""
    B, T, F, C = h.shape
    To, Fo = -(-T // 2), -(-F // 2)
    hp = jnp.pad(h, ((0, 0), (0, 2 * To - T), (0, 2 * Fo - F), (0, 0)))
    ph = hp.reshape(B, To, 2, Fo, 2, C)
    # [row_phase][col_phase] → [B, To, Fo, C]
    phase = [[ph[:, :, i, :, j, :] for j in range(2)] for i in range(2)]

    def shift_back(x, axis):
        """x[t] → x[t-1] with zero at t=0 (src index 2t-1 for dt=0)."""
        pad = [(0, 0)] * 4
        pad[axis] = (1, 0)
        sl = [slice(None)] * 4
        sl[axis] = slice(0, x.shape[axis])
        return jnp.pad(x, pad)[tuple(sl)]

    taps = []
    for dt in range(3):
        row_phase = 0 if dt == 1 else 1  # even row for center tap, odd else
        for df in range(3):
            col_phase = 0 if df == 1 else 1
            t = phase[row_phase][col_phase]
            if dt == 0:
                t = shift_back(t, 1)
            if df == 0:
                t = shift_back(t, 2)
            taps.append(t)
    return taps


def _conv2d_s2(h: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
               groups: int = 1) -> jnp.ndarray:
    """3×3 stride-2 conv via ``lax.conv_general_dilated`` with torch-aligned
    explicit padding (1,1) — output position o reads inputs 2o-1..2o+1,
    exactly the tap-sum/_taps_3x3_s2 alignment; out length ⌈T/2⌉."""
    out = jax.lax.conv_general_dilated(
        h, kernel.astype(h.dtype),
        window_strides=(2, 2),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return out + bias.astype(h.dtype)


@jax.custom_vjp
def _dw_conv_s2_tapbwd(h: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3×3 stride-2 conv with a split lowering: FORWARD via
    ``lax.conv_general_dilated`` (fastest on-chip, PERF.md round-4 A/B),
    BACKWARD via the VJP of the mathematically identical phase-reshape
    tap-sum — XLA's native conv transpose materializes a padded+dilated
    gradient tensor (the 2.4 GB/window mover the round-3 trace named),
    while the tap-sum transpose is pure pad/slice/elementwise."""
    return _conv2d_s2(h, kernel, bias, groups=h.shape[-1])


def _dw_tapbwd_fwd(h, kernel, bias):
    return _dw_conv_s2_tapbwd(h, kernel, bias), (h, kernel, bias)


def _dw_tapbwd_bwd(res, g):
    h, kernel, bias = res
    C = h.shape[-1]

    def tap_sum(hh, kk, bb):
        w = kk.reshape(9, C).astype(hh.dtype)
        tps = _taps_3x3_s2(hh)
        return bb.astype(hh.dtype) + sum(tps[j] * w[j] for j in range(9))

    _, vjp = jax.vjp(tap_sum, h, kernel, bias)
    return vjp(g)


_dw_conv_s2_tapbwd.defvjp(_dw_tapbwd_fwd, _dw_tapbwd_bwd)


class DWStridingSubsampling(nn.Module):
    """Depthwise-striding conv subsampling: one full Conv2d stride 2, then
    (log2(factor)-1) × [depthwise stride-2 conv + pointwise conv], SiLU
    between, final linear to d_model.  Input [B, T, F] → [B, T/factor, d].

    Three interchangeable lowerings (identical parameters + outputs):
    ``conv`` uses ``lax.conv_general_dilated`` directly; ``xla`` expresses
    each stride-2 conv as 9 shifted-phase multiply-adds (the round-2 path,
    kept for A/B and as the fallback reference); ``pallas`` is the fused
    VMEM kernel.  On v5e the direct conv wins in-model (PERF.md)."""

    config: ConformerConfig

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, length: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """``length`` ([B] valid input frames) enables EXACT ragged-length
        parity with the reference's unpadded forward: each stride-2 stage
        zeroes its frames beyond ``ceil(length/2^(k+1))``.  Without it, a
        boundary output frame of stage k+1 can read stage-k frames that an
        unpadded run would have as conv zero-padding — real values leak into
        VALID downstream frames whenever ``length`` is not a multiple of the
        subsampling factor (windows that ARE multiples are unaffected).
        The fused pallas lowering cannot mask between stages; it keeps the
        unmasked semantics (exact only for factor-multiple lengths)."""
        cfg = self.config
        act = _act(cfg.subsampling_act)
        n_stages = {2: 1, 4: 2, 8: 3}[cfg.subsampling_factor]
        C = cfg.subsampling_conv_channels

        def stage_mask(h, k):
            # h: [B, T_k, F_k, C]; valid frames after k+1 stride-2 stages
            if length is None:
                return h
            valid = jnp.ceil(length / (2 ** (k + 1))).astype(jnp.int32)
            keep = jnp.arange(h.shape[1])[None, :] < valid[:, None]
            return jnp.where(keep[:, :, None, None], h, 0)

        # stage 0: full 3×3 stride-2 conv with 1 input channel — 9 shifted
        # phase tensors, each broadcast-multiplied by its tap weights
        k_in = self.param("conv_in_kernel", nn.initializers.lecun_normal(),
                          (3, 3, 1, C))
        b_in = self.param("conv_in_bias", nn.initializers.zeros, (C,))

        if (cfg.subsampling_impl == "pallas" and n_stages == 3
                and x.shape[-1] % 8 == 0):
            # fused VMEM kernel — XLA materializes ~6 GB of tap
            # intermediates per forward on this stack (PERF.md); the kernel
            # reads x once and writes the output once.  Params are declared
            # exactly as in the XLA path (same pytree / checkpoints); the
            # pointwise convs' kernel+bias are recovered by probing the
            # nn.Conv with zeros (→ bias) and eye (→ kernel+bias), two
            # constant-folded [C, C]-sized evaluations.
            from dynamic_asr_eval_tpu.kernels.subsample import fused_subsample

            ps = [k_in.reshape(9, C).astype(jnp.float32),
                  b_in.astype(jnp.float32)]
            for i in range(2):
                k_dw = self.param(f"dw_conv_{i}_kernel",
                                  nn.initializers.lecun_normal(), (3, 3, 1, C))
                b_dw = self.param(f"dw_conv_{i}_bias",
                                  nn.initializers.zeros, (C,))
                pw = nn.Conv(C, (1, 1), dtype=jnp.float32,
                             param_dtype=jnp.float32, name=f"pw_conv_{i}")
                bias_pw = pw(jnp.zeros((1, 1, 1, C), jnp.float32))[0, 0, 0]
                k_pw = (pw(jnp.eye(C, dtype=jnp.float32)[None, :, None, :])
                        [0, :, 0, :] - bias_pw)
                ps += [k_dw.reshape(9, C).astype(jnp.float32),
                       b_dw.astype(jnp.float32), k_pw, bias_pw]
            h = fused_subsample(
                x.astype(cfg.compute_dtype), *ps,
                act_name=cfg.subsampling_act,
                interpret=jax.devices()[0].platform not in ("tpu", "axon"),
            )
            B, T_ds, F_ds, _ = h.shape
            h = h.reshape(B, T_ds, F_ds * C)
            h = nn.Dense(cfg.d_model, dtype=cfg.compute_dtype,
                         param_dtype=jnp.float32, name="out")(h)
            if cfg.subsampling_norm_out:
                h = nn.LayerNorm(epsilon=LN_EPS, dtype=h.dtype, param_dtype=jnp.float32,
                                 name="norm_out")(h)
            return h
        if cfg.subsampling_impl in ("conv", "hybrid", "conv_tapbwd"):
            # "conv": every stride-2 conv via lax.conv_general_dilated.
            # "hybrid": stage 0 (tiny [B,T,F,1] input, MXU-friendly) and the
            # 1×1 pointwise convs stay lax.conv, but the DEPTHWISE stride-2
            # stages — whose input is the giant [B,T/2,F/2,C] stage tensor —
            # use the phase-reshape tap-sum: pure VPU elementwise work with
            # no explicit pad of the full tensor, attacking the
            # pad-to-taps materialization the round-3 profiler trace named
            # as a 2.4 GB/window HBM mover (PERF.md round-3 item 3).
            h = x[..., None].astype(cfg.compute_dtype)  # [B, T, F, 1]
            h = stage_mask(act(_conv2d_s2(h, k_in, b_in)), 0)
            for i in range(n_stages - 1):
                k_dw = self.param(f"dw_conv_{i}_kernel",
                                  nn.initializers.lecun_normal(), (3, 3, 1, C))
                b_dw = self.param(f"dw_conv_{i}_bias",
                                  nn.initializers.zeros, (C,))
                if cfg.subsampling_impl == "hybrid":
                    taps = _taps_3x3_s2(h)
                    w_dw = k_dw.reshape(9, C).astype(cfg.compute_dtype)
                    h = b_dw.astype(cfg.compute_dtype) + sum(
                        taps[j] * w_dw[j] for j in range(9)
                    )
                elif cfg.subsampling_impl == "conv_tapbwd":
                    h = _dw_conv_s2_tapbwd(h, k_dw, b_dw)
                else:
                    h = _conv2d_s2(h, k_dw, b_dw, groups=C)
                h = nn.Conv(C, (1, 1), dtype=cfg.compute_dtype,
                            param_dtype=jnp.float32, name=f"pw_conv_{i}")(h)
                h = stage_mask(act(h), i + 1)
            B, T_ds, F_ds, _ = h.shape
            h = h.reshape(B, T_ds, F_ds * C)
            h = nn.Dense(cfg.d_model, dtype=cfg.compute_dtype,
                         param_dtype=jnp.float32, name="out")(h)
            if cfg.subsampling_norm_out:
                h = nn.LayerNorm(epsilon=LN_EPS, dtype=h.dtype,
                                 param_dtype=jnp.float32, name="norm_out")(h)
            return h
        taps = _taps_3x3_s2(x[..., None].astype(cfg.compute_dtype))
        w_in = k_in.reshape(9, C).astype(cfg.compute_dtype)
        # NOTE: a stacked-taps einsum (contraction dim 9) lowers terribly on
        # the MXU (measured 20x slower); the 9-term broadcast sum is VPU work
        h = b_in.astype(cfg.compute_dtype) + sum(
            taps[j] * w_in[j] for j in range(9)
        )
        h = stage_mask(act(h), 0)

        for i in range(n_stages - 1):
            k_dw = self.param(f"dw_conv_{i}_kernel", nn.initializers.lecun_normal(),
                              (3, 3, 1, C))
            b_dw = self.param(f"dw_conv_{i}_bias", nn.initializers.zeros, (C,))
            taps = _taps_3x3_s2(h)
            w = k_dw.reshape(9, C).astype(cfg.compute_dtype)
            h = b_dw.astype(cfg.compute_dtype) + sum(
                taps[j] * w[j] for j in range(9)
            )
            h = nn.Conv(
                C, (1, 1), dtype=cfg.compute_dtype, param_dtype=jnp.float32,
                name=f"pw_conv_{i}",
            )(h)
            h = stage_mask(act(h), i + 1)

        B, T_ds, F_ds, _ = h.shape
        h = h.reshape(B, T_ds, F_ds * C)
        h = nn.Dense(
            cfg.d_model, dtype=cfg.compute_dtype, param_dtype=jnp.float32, name="out"
        )(h)
        if cfg.subsampling_norm_out:
            h = nn.LayerNorm(epsilon=LN_EPS, dtype=h.dtype, param_dtype=jnp.float32, name="norm_out")(h)
        return h


# ---------------------------------------------------------------------------
# Conformer block
# ---------------------------------------------------------------------------


class FeedForward(nn.Module):
    config: ConformerConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=x.dtype, param_dtype=jnp.float32)(x)
        h = nn.Dense(
            cfg.d_model * cfg.expansion_factor, use_bias=cfg.bias_in_ff,
            dtype=cfg.compute_dtype, param_dtype=jnp.float32, name="in",
        )(h)
        h = jax.nn.silu(h)
        h = nn.Dropout(cfg.dropout_ff)(h, deterministic=deterministic)
        h = nn.Dense(
            cfg.d_model, use_bias=cfg.bias_in_ff, dtype=cfg.compute_dtype,
            param_dtype=jnp.float32, name="out",
        )(h)
        return nn.Dropout(cfg.dropout_ff)(h, deterministic=deterministic)


class MHSA(nn.Module):
    config: ConformerConfig

    @nn.compact
    def __call__(self, x, mask, cos, sin, deterministic: bool = True):
        cfg = self.config
        H, D = cfg.n_heads, cfg.head_dim
        pos = cfg.pos_encoding
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=x.dtype, param_dtype=jnp.float32)(x)
        qkv = nn.Dense(
            3 * H * D, use_bias=cfg.bias_in_attn, dtype=cfg.compute_dtype,
            param_dtype=jnp.float32, name="qkv",
        )(h)
        B, T, _ = qkv.shape
        q, k, v = jnp.split(qkv.reshape(B, T, 3, H, D), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]  # [B, T, H, D]
        if pos == "rotary":
            q = apply_rotary(q, cos, sin)
            k = apply_rotary(k, cos, sin)
        if pos == "rel_pos":
            # Transformer-XL relative attention (NeMo RelPositionMultiHead-
            # Attention): content score (q+u)·k plus rel-shifted position
            # score (q+v)·P, both scaled by 1/√D
            u = self.param("pos_bias_u", nn.initializers.zeros, (H, D))
            vb = self.param("pos_bias_v", nn.initializers.zeros, (H, D))
            pe = relpos_encoding(cfg.d_model, T)  # [2T-1, d_model]
            p = nn.Dense(
                H * D, use_bias=False, dtype=cfg.compute_dtype,
                param_dtype=jnp.float32, name="linear_pos",
            )(pe.astype(cfg.compute_dtype)).reshape(2 * T - 1, H, D)
            qf = q.astype(jnp.float32)
            ac = jnp.einsum(
                "bthd,bshd->bhts", qf + u[None, None], k.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            bd = jnp.einsum(
                "bthd,khd->bhtk", qf + vb[None, None], p.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            logits = (ac + rel_shift(bd)) / jnp.sqrt(D)
            bias = jnp.where(mask[:, None, None, :], 0.0, -1e30)
            attn = jax.nn.softmax(logits + bias, axis=-1).astype(cfg.compute_dtype)
            out = jnp.einsum("bhts,bshd->bthd", attn, v)
        elif cfg.attention_impl == "pallas_flash":
            from dynamic_asr_eval_tpu.kernels.attention import flash_attention

            out = flash_attention(q, k, v, mask)
        else:
            scale = 1.0 / jnp.sqrt(D).astype(cfg.compute_dtype)
            logits = jnp.einsum(
                "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
            ) * scale
            if cfg.attention_logits_in_compute_dtype:
                logits = logits.astype(cfg.compute_dtype)
            if cfg.seq_shard_axes is not None:
                # sequence parallelism: keep the [B, H, T, S] score matrix
                # sharded over the QUERY time axis — K/V are all-gathered
                # (T·d each, cheap) while the T² activations stay 1/sp per
                # device.  This is the memory-scaling half of SP.
                from jax.sharding import PartitionSpec

                b_ax, s_ax = cfg.seq_shard_axes
                logits = _try_constraint(
                    logits, PartitionSpec(b_ax, None, s_ax, None)
                )
            bias = jnp.where(mask[:, None, None, :], 0.0, -1e30).astype(logits.dtype)
            attn = jax.nn.softmax(logits + bias, axis=-1).astype(cfg.compute_dtype)
            out = jnp.einsum("bhts,bshd->bthd", attn, v)
        out = out.reshape(B, T, H * D)
        out = nn.Dense(
            cfg.d_model, dtype=cfg.compute_dtype, param_dtype=jnp.float32, name="out"
        )(out)
        return nn.Dropout(cfg.dropout_attn)(out, deterministic=deterministic)


class ConvModule(nn.Module):
    config: ConformerConfig

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True, use_running_average: bool = True):
        cfg = self.config
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=x.dtype, param_dtype=jnp.float32)(x)
        h = nn.Dense(
            2 * cfg.d_model, dtype=cfg.compute_dtype, param_dtype=jnp.float32,
            name="pw1",
        )(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)  # GLU
        h = jnp.where(mask[..., None], h, 0)  # keep padding silent under conv
        # depthwise conv as K shifted multiply-adds: TPU lowers grouped convs
        # channel-by-channel, which is slow; K static shifts are pure VPU work
        # (param shape matches nn.Conv's [K, 1, C] so checkpoints interchange)
        K = cfg.conv_kernel_size
        dw_kernel = self.param(
            "dw_kernel",
            nn.initializers.lecun_normal(),
            (K, 1, cfg.d_model),
        )
        dw_bias = self.param("dw_bias", nn.initializers.zeros, (cfg.d_model,))
        pad_l = (K - 1) // 2
        pad_r = K - 1 - pad_l
        hp = jnp.pad(h, ((0, 0), (pad_l, pad_r), (0, 0)))
        T = h.shape[1]
        out = jnp.zeros_like(h)
        for j in range(K):
            out = out + hp[:, j : j + T, :] * dw_kernel[j, 0].astype(h.dtype)
        h = out + dw_bias.astype(h.dtype)
        h = Norm(cfg.d_model, cfg.default_norm, name="norm")(
            h, mask, use_running_average
        )
        h = jax.nn.silu(h)
        h = nn.Dense(
            cfg.d_model, dtype=cfg.compute_dtype, param_dtype=jnp.float32, name="pw2"
        )(h)
        return nn.Dropout(cfg.dropout_conv)(h, deterministic=deterministic)


class ConformerBlock(nn.Module):
    config: ConformerConfig

    @nn.compact
    def __call__(self, x, mask, cos, sin, deterministic: bool = True, use_running_average: bool = True):
        cfg = self.config
        x = x + 0.5 * FeedForward(cfg, name="ff1")(x, deterministic)
        x = x + MHSA(cfg, name="attn")(x, mask, cos, sin, deterministic)
        x = x + ConvModule(cfg, name="conv")(x, mask, deterministic, use_running_average)
        x = x + 0.5 * FeedForward(cfg, name="ff2")(x, deterministic)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=x.dtype, param_dtype=jnp.float32, name="norm_out")(x)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


class SCConformer(nn.Module):
    """Self-conditioned conformer-CTC encoder.

    Call convention mirrors the reference model surface
    (``model(audio_signal=...)['final_posteriors']``, ``lcasr/lib.py:550``):
    input ``audio_signal`` is ``[B, feat_in, T]``; returns a dict with
    ``final_posteriors`` ``[B, T_ds, vocab+1]`` (fp32 log-softmax),
    ``interim_posteriors`` ``[n_layers-1, B, T_ds, vocab+1]`` (when
    self-conditioning) and ``length`` ``[B]`` downsampled lengths.
    """

    config: ConformerConfig

    @nn.compact
    def __call__(
        self,
        audio_signal: jnp.ndarray,
        length: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        use_running_average: bool = True,
        return_interim: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        x = jnp.swapaxes(audio_signal, 1, 2)  # [B, T, F]
        B, T, _ = x.shape
        if length is None:
            length = jnp.full((B,), T, dtype=jnp.int32)
        x = jnp.where(lengths_to_mask(length, T)[..., None], x, 0)
        x = x.astype(cfg.compute_dtype)

        sub_cls = (
            nn.remat(DWStridingSubsampling)
            if cfg.remat_subsampling
            else DWStridingSubsampling
        )
        h = sub_cls(cfg, name="subsampling")(x, length)
        if cfg.input_xscale:  # NeMo scales the embedding by √d_model
            h = h * jnp.asarray(jnp.sqrt(cfg.d_model), h.dtype)
        T_ds = h.shape[1]
        ds_length = jnp.ceil(length / cfg.subsampling_factor).astype(jnp.int32)
        mask = lengths_to_mask(ds_length, T_ds)
        h = jnp.where(mask[..., None], h, 0)
        h = _shard_seq(h, cfg.seq_shard_axes)

        cos, sin = rotary_freqs(
            cfg.head_dim, cfg.rotary_base_freq, T_ds, cfg.rotary_interpolation_factor
        )

        # shared CTC head (the "decoder" in reference terms) + shared
        # re-embedding for self-conditioning.  head_in_compute_dtype runs the
        # [*, d_model] x [d_model, V] head matmul on the MXU in compute_dtype
        # (f32 accumulation via preferred_element_type is XLA's default on
        # TPU); the logits are upcast before log_softmax so normalization
        # stays f32.  With self-conditioning the head is applied n_layers
        # times per forward — in f32 it is ~20% of the step's matmul FLOPs
        # at the MXU's reduced f32 rate.
        head_dtype = cfg.compute_dtype if cfg.head_in_compute_dtype else jnp.float32
        head_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32, param_dtype=jnp.float32, name="decoder_norm")
        head = nn.Dense(cfg.n_classes, dtype=head_dtype, param_dtype=jnp.float32, name="decoder")
        reembed = nn.Dense(
            cfg.d_model, use_bias=False, dtype=cfg.compute_dtype,
            param_dtype=jnp.float32, name="self_condition_reembed",
        )

        def ctc_logits(hid):
            z = hid.astype(jnp.float32)
            if cfg.decoder_norm:
                z = head_norm(z)
            return jax.nn.log_softmax(head(z).astype(jnp.float32), axis=-1)

        interim = []
        blocks = []
        for i in range(cfg.n_layers):
            block_cls = ConformerBlock
            if cfg.checkpoint_every_n_layers and i % cfg.checkpoint_every_n_layers == 0:
                block_cls = nn.remat(ConformerBlock, static_argnums=(5, 6))
            blocks.append(block_cls(cfg, name=f"layer_{i}"))

        for i, block in enumerate(blocks):
            h = block(h, mask, cos, sin, deterministic, use_running_average)
            h = _shard_seq(h, cfg.seq_shard_axes)
            if cfg.self_conditioning and i < cfg.n_layers - 1:
                lp = ctc_logits(h)
                if return_interim:
                    interim.append(lp)
                h = h + reembed(jnp.exp(lp).astype(cfg.compute_dtype))
                h = jnp.where(mask[..., None], h, 0)

        final = ctc_logits(h)
        out = {
            "final_posteriors": final,
            "length": ds_length,
            # encoder hidden states for attention-decoder models (the
            # reference model's 'a_hidden', consumed at lcasr/lib.py:1186)
            "a_hidden": h,
        }
        if return_interim and interim:
            out["interim_posteriors"] = jnp.stack(interim)
        return out


def init_conformer(
    config: ConformerConfig,
    rng: jax.Array,
    example_T: int = 1024,
) -> Tuple[SCConformer, Dict[str, Any]]:
    """Initialize model + variables with a small example batch."""
    model = SCConformer(config)
    x = jnp.zeros((1, config.feat_in, example_T), jnp.float32)
    # jit the init: eager flax init dispatches hundreds of single ops, which
    # is pathologically slow on tunneled TPU backends (~0.4 s per op compile)
    variables = jax.jit(model.init)({"params": rng}, x)
    return model, variables
