"""Torch reference implementations of the conformer family — numerical
oracles for the weight converters.

The wav2vec2 converter earned a <1e-4 forward-parity test against a real
torch ``Wav2Vec2ForCTC`` (``tests/test_convert_parity.py``); these modules
give the other two converter families the same bar:

- :class:`TorchSCConformer` — the lcasr SCConformerXL semantics
  (``lcasr/run.py:37-47``, config schema ``earnings_finetune/
  lcasr160rb1.yaml:1-29``) with the module naming observable in the
  reference tree (``model.subsampling`` / ``model.layers[i]`` /
  ``model.decoder`` with ``.num_classes``, ``lcasr/lib.py:148-204``).  The
  external ``lcasr`` package is not importable offline, so conventions that
  are NOT observable from the reference tree (rotary pair layout,
  subsampling flatten order, conv-module mid-norm naming) are pinned here
  and in ``models/convert.py``'s rule table *together*: the oracle proves
  converter ↔ flax consistency at value level — a transposed kernel, a
  mis-fused qkv, or a wrong self-conditioning hookup fails loudly.

- :class:`TorchNeMoConformer` — NeMo 1.x ``ConformerEncoder`` (dw_striding
  subsampling, Transformer-XL ``RelPositionMultiHeadAttention`` with
  pos_bias_u/v and the pad-reshape rel-shift, batch-norm conv modules,
  ``ConvASRDecoder`` 1×1-conv CTC head) semantics and state-dict naming,
  per the nvidia_ctc backend surface (``nvidia_ctc/lib.py:12-14``) and the
  lcasr_nemo old-state-dict loader (``lcasr_nemo/lib.py:24-29``).  NeMo's
  attention/rel-shift/subsampling math is public and stable; this is a
  faithful re-derivation, not a copy.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# lcasr-style SCConformerXL
# ---------------------------------------------------------------------------


class _Subsampling(nn.Module):
    """dw_striding subsampling: full 3×3 s2 conv, then (stages-1) ×
    [depthwise s2 conv → pointwise conv], activation after stage outputs,
    flatten [B, T', F', C] feature-major, linear to d_model."""

    def __init__(self, feat_in, d_model, channels, factor, act="silu"):
        super().__init__()
        n_stages = {2: 1, 4: 2, 8: 3}[factor]
        self.conv_in = nn.Conv2d(1, channels, 3, stride=2, padding=1)
        self.dw_conv = nn.ModuleList(
            nn.Conv2d(channels, channels, 3, stride=2, padding=1, groups=channels)
            for _ in range(n_stages - 1)
        )
        self.pw_conv = nn.ModuleList(
            nn.Conv2d(channels, channels, 1) for _ in range(n_stages - 1)
        )
        f_ds = feat_in
        for _ in range(n_stages):
            f_ds = -(-f_ds // 2)
        self.out = nn.Linear(f_ds * channels, d_model)
        self.act = {"silu": F.silu, "relu": F.relu}[act]

    def forward(self, x):  # [B, T, F]
        h = x.unsqueeze(1)  # [B, 1, T, F]
        h = self.act(self.conv_in(h))
        for dw, pw in zip(self.dw_conv, self.pw_conv):
            h = self.act(pw(dw(h)))
        B, C, T, Fd = h.shape
        h = h.permute(0, 2, 3, 1).reshape(B, T, Fd * C)  # feature-major (f·C+c)
        return self.out(h)


def _rotary_cos_sin(T, head_dim, base, interpolation, device, dtype):
    inv = 1.0 / (
        base ** (torch.arange(0, head_dim, 2, dtype=torch.float32, device=device) / head_dim)
    )
    t = torch.arange(T, dtype=torch.float32, device=device) / interpolation
    ang = torch.outer(t, inv)
    return ang.cos().to(dtype), ang.sin().to(dtype)


def _apply_rotary(x, cos, sin):
    """x: [B, T, H, D]; rotate half-split pairs (x[..., i], x[..., i+D/2])."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1)


class _FeedForward(nn.Module):
    def __init__(self, d_model, expansion, bias):
        super().__init__()
        self.norm = nn.LayerNorm(d_model)
        self.in_proj = nn.Linear(d_model, d_model * expansion, bias=bias)
        self.out_proj = nn.Linear(d_model * expansion, d_model, bias=bias)

    def forward(self, x):
        return self.out_proj(F.silu(self.in_proj(self.norm(x))))


class _Attention(nn.Module):
    def __init__(self, d_model, n_heads, head_dim, rotary_base, rotary_interp, bias):
        super().__init__()
        self.norm = nn.LayerNorm(d_model)
        self.qkv = nn.Linear(d_model, 3 * n_heads * head_dim, bias=bias)
        self.out = nn.Linear(n_heads * head_dim, d_model)
        self.n_heads, self.head_dim = n_heads, head_dim
        self.rotary_base, self.rotary_interp = rotary_base, rotary_interp

    def forward(self, x):
        B, T, _ = x.shape
        H, D = self.n_heads, self.head_dim
        h = self.norm(x)
        q, k, v = self.qkv(h).reshape(B, T, 3, H, D).unbind(2)  # [B, T, H, D]
        cos, sin = _rotary_cos_sin(T, D, self.rotary_base, self.rotary_interp,
                                   x.device, x.dtype)
        q = _apply_rotary(q, cos, sin)
        k = _apply_rotary(k, cos, sin)
        logits = torch.einsum("bthd,bshd->bhts", q, k) / math.sqrt(D)
        attn = logits.softmax(-1)
        o = torch.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, H * D)
        return self.out(o)


class _BatchRenorm1d(nn.Module):
    """Eval-mode batch renorm ≡ batch norm with running statistics — the only
    mode TTA exercises (``model.eval()`` at ``lcasr/lib.py:525-527``)."""

    def __init__(self, features, eps=1e-5):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(features))
        self.bias = nn.Parameter(torch.zeros(features))
        self.register_buffer("running_mean", torch.zeros(features))
        self.register_buffer("running_var", torch.ones(features))
        self.eps = eps

    def forward(self, x):  # [B, T, C]
        xn = (x - self.running_mean) / torch.sqrt(self.running_var + self.eps)
        return xn * self.weight + self.bias


class _ConvModule(nn.Module):
    def __init__(self, d_model, kernel_size, default_norm):
        super().__init__()
        self.norm = nn.LayerNorm(d_model)
        self.pw1 = nn.Conv1d(d_model, 2 * d_model, 1)
        pad_l = (kernel_size - 1) // 2
        self.dw = nn.Conv1d(d_model, d_model, kernel_size, padding=pad_l,
                            groups=d_model)
        if default_norm == "layer_norm":
            self.norm_mid = nn.LayerNorm(d_model)
        else:
            self.norm_mid = _BatchRenorm1d(d_model)
        self.pw2 = nn.Conv1d(d_model, d_model, 1)

    def forward(self, x):
        h = self.norm(x).transpose(1, 2)  # [B, d, T]
        h = F.glu(self.pw1(h), dim=1)
        h = self.dw(h).transpose(1, 2)  # [B, T, d]
        h = F.silu(self.norm_mid(h))
        return self.pw2(h.transpose(1, 2)).transpose(1, 2)


class _Block(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.ff1 = _FeedForward(cfg["d_model"], cfg["expansion"], cfg["bias_in_ff"])
        self.attn = _Attention(cfg["d_model"], cfg["n_heads"], cfg["head_dim"],
                               cfg["rotary_base"], cfg["rotary_interp"],
                               cfg["bias_in_attn"])
        self.conv = _ConvModule(cfg["d_model"], cfg["conv_kernel_size"],
                                cfg["default_norm"])
        self.ff2 = _FeedForward(cfg["d_model"], cfg["expansion"], cfg["bias_in_ff"])
        self.norm_out = nn.LayerNorm(cfg["d_model"])

    def forward(self, x):
        x = x + 0.5 * self.ff1(x)
        x = x + self.attn(x)
        x = x + self.conv(x)
        x = x + 0.5 * self.ff2(x)
        return self.norm_out(x)


class _CTCHead(nn.Linear):
    """The reference reads ``model.decoder.num_classes`` (lcasr/lib.py:92)."""

    def __init__(self, d_model, num_classes):
        super().__init__(d_model, num_classes)
        self.num_classes = num_classes


class TorchSCConformer(nn.Module):
    """lcasr-style self-conditioned conformer-CTC.  ``forward(audio_signal=
    [B, feat_in, T]) -> {'final_posteriors': [B, T_ds, V+1] log-probs}``
    mirroring the reference call surface (``lcasr/lib.py:550``)."""

    def __init__(self, feat_in=80, n_layers=2, d_model=64, n_heads=2,
                 head_dim=32, vocab_size=32, subsampling_factor=8,
                 subsampling_conv_channels=8, conv_kernel_size=9,
                 expansion_factor=4, rotary_base_freq=1_500_000.0,
                 rotary_interpolation_factor=1.0, self_conditioning=True,
                 decoder_norm=True, default_norm="layer_norm",
                 bias_in_ff=False, bias_in_attn=False):
        super().__init__()
        self.subsampling = _Subsampling(feat_in, d_model,
                                        subsampling_conv_channels,
                                        subsampling_factor)
        blk_cfg = dict(d_model=d_model, n_heads=n_heads, head_dim=head_dim,
                       rotary_base=rotary_base_freq,
                       rotary_interp=rotary_interpolation_factor,
                       conv_kernel_size=conv_kernel_size,
                       expansion=expansion_factor, default_norm=default_norm,
                       bias_in_ff=bias_in_ff, bias_in_attn=bias_in_attn)
        self.layers = nn.ModuleList(_Block(blk_cfg) for _ in range(n_layers))
        self.decoder_norm = nn.LayerNorm(d_model) if decoder_norm else None
        self.decoder = _CTCHead(d_model, vocab_size + 1)
        self.self_condition_reembed = (
            nn.Linear(vocab_size + 1, d_model, bias=False)
            if self_conditioning else None
        )

    def _ctc_logits(self, h):
        z = self.decoder_norm(h) if self.decoder_norm is not None else h
        return self.decoder(z).log_softmax(-1)

    def forward(self, audio_signal):
        h = self.subsampling(audio_signal.transpose(1, 2))  # [B, T_ds, d]
        n = len(self.layers)
        for i, block in enumerate(self.layers):
            h = block(h)
            if self.self_condition_reembed is not None and i < n - 1:
                lp = self._ctc_logits(h)
                h = h + self.self_condition_reembed(lp.exp())
        # a_hidden: post-block encoder states consumed by attention decoders
        # (reference 'a_hidden', lcasr/lib.py:1186)
        return {"final_posteriors": self._ctc_logits(h), "a_hidden": h}


# ---------------------------------------------------------------------------
# NeMo-style conformer (rel-pos Transformer-XL attention)
# ---------------------------------------------------------------------------


class _NeMoSubsampling(nn.Module):
    """NeMo ``ConvSubsampling(subsampling='dw_striding')``: Sequential conv
    stack (full s2 conv, ReLU, then [dw s2 conv, pw conv, ReLU] per stage),
    channel-major flatten, linear out."""

    def __init__(self, feat_in, d_model, channels, factor):
        super().__init__()
        n_stages = {2: 1, 4: 2, 8: 3}[factor]
        mods = [nn.Conv2d(1, channels, 3, stride=2, padding=1), nn.ReLU()]
        for _ in range(n_stages - 1):
            mods += [
                nn.Conv2d(channels, channels, 3, stride=2, padding=1,
                          groups=channels),
                nn.Conv2d(channels, channels, 1),
                nn.ReLU(),
            ]
        self.conv = nn.Sequential(*mods)
        f_ds = feat_in
        for _ in range(n_stages):
            f_ds = -(-f_ds // 2)
        self.out = nn.Linear(f_ds * channels, d_model)

    def forward(self, x):  # [B, T, F]
        h = self.conv(x.unsqueeze(1))  # [B, C, T', F']
        B, C, T, Fd = h.shape
        h = h.transpose(1, 2).reshape(B, T, C * Fd)  # channel-major (c·F+f)
        return self.out(h)


def _nemo_rel_pe(T, d_model, device):
    """NeMo RelPositionalEncoding: [1, 2T-1, d] for positions T-1 … -(T-1)."""
    pos = torch.arange(T - 1, -T, -1, dtype=torch.float32, device=device)
    div = torch.exp(
        torch.arange(0, d_model, 2, dtype=torch.float32, device=device)
        * (-math.log(10000.0) / d_model)
    )
    ang = pos[:, None] * div[None, :]
    pe = torch.zeros(2 * T - 1, d_model, device=device)
    pe[:, 0::2] = ang.sin()
    pe[:, 1::2] = ang.cos()
    return pe.unsqueeze(0)


class _NeMoRelPosAttention(nn.Module):
    def __init__(self, d_model, n_heads, head_dim):
        super().__init__()
        self.h, self.d_k = n_heads, head_dim
        self.linear_q = nn.Linear(d_model, n_heads * head_dim)
        self.linear_k = nn.Linear(d_model, n_heads * head_dim)
        self.linear_v = nn.Linear(d_model, n_heads * head_dim)
        self.linear_out = nn.Linear(n_heads * head_dim, d_model)
        self.linear_pos = nn.Linear(d_model, n_heads * head_dim, bias=False)
        self.pos_bias_u = nn.Parameter(torch.zeros(n_heads, head_dim))
        self.pos_bias_v = nn.Parameter(torch.zeros(n_heads, head_dim))

    @staticmethod
    def rel_shift(x):
        """NeMo's pad-reshape relative shift: [B,H,T,2T-1] → entry (i,j)
        picks rel index j-i+T-1."""
        b, h, qlen, pos_len = x.shape
        x = F.pad(x, (1, 0))
        x = x.view(b, h, -1, qlen)
        x = x[:, :, 1:].view(b, h, qlen, pos_len)
        return x

    def forward(self, x, pos_emb):
        B, T, _ = x.shape
        H, D = self.h, self.d_k
        q = self.linear_q(x).view(B, T, H, D)
        k = self.linear_k(x).view(B, T, H, D).transpose(1, 2)  # [B,H,T,D]
        v = self.linear_v(x).view(B, T, H, D).transpose(1, 2)
        p = self.linear_pos(pos_emb).view(1, -1, H, D).transpose(1, 2)  # [1,H,2T-1,D]
        q_u = (q + self.pos_bias_u).transpose(1, 2)  # [B,H,T,D]
        q_v = (q + self.pos_bias_v).transpose(1, 2)
        matrix_ac = q_u @ k.transpose(-2, -1)
        matrix_bd = self.rel_shift(q_v @ p.transpose(-2, -1))[..., :T]
        scores = (matrix_ac + matrix_bd) / math.sqrt(D)
        attn = scores.softmax(-1)
        o = (attn @ v).transpose(1, 2).reshape(B, T, H * D)
        return self.linear_out(o)


class _NeMoFeedForward(nn.Module):
    def __init__(self, d_model, expansion):
        super().__init__()
        self.linear1 = nn.Linear(d_model, d_model * expansion)
        self.linear2 = nn.Linear(d_model * expansion, d_model)

    def forward(self, x):
        return self.linear2(F.silu(self.linear1(x)))


class _NeMoConvModule(nn.Module):
    def __init__(self, d_model, kernel_size):
        super().__init__()
        self.pointwise_conv1 = nn.Conv1d(d_model, 2 * d_model, 1)
        self.depthwise_conv = nn.Conv1d(d_model, d_model, kernel_size,
                                        padding=(kernel_size - 1) // 2,
                                        groups=d_model)
        self.batch_norm = nn.BatchNorm1d(d_model)
        self.pointwise_conv2 = nn.Conv1d(d_model, d_model, 1)

    def forward(self, x):  # [B, T, d]
        h = x.transpose(1, 2)
        h = F.glu(self.pointwise_conv1(h), dim=1)
        h = F.silu(self.batch_norm(self.depthwise_conv(h)))
        return self.pointwise_conv2(h).transpose(1, 2)


class _NeMoLayer(nn.Module):
    def __init__(self, d_model, n_heads, head_dim, conv_kernel_size, expansion=4):
        super().__init__()
        self.norm_feed_forward1 = nn.LayerNorm(d_model)
        self.feed_forward1 = _NeMoFeedForward(d_model, expansion)
        self.norm_self_att = nn.LayerNorm(d_model)
        self.self_attn = _NeMoRelPosAttention(d_model, n_heads, head_dim)
        self.norm_conv = nn.LayerNorm(d_model)
        self.conv = _NeMoConvModule(d_model, conv_kernel_size)
        self.norm_feed_forward2 = nn.LayerNorm(d_model)
        self.feed_forward2 = _NeMoFeedForward(d_model, expansion)
        self.norm_out = nn.LayerNorm(d_model)

    def forward(self, x, pos_emb):
        x = x + 0.5 * self.feed_forward1(self.norm_feed_forward1(x))
        x = x + self.self_attn(self.norm_self_att(x), pos_emb)
        x = x + self.conv(self.norm_conv(x))
        x = x + 0.5 * self.feed_forward2(self.norm_feed_forward2(x))
        return self.norm_out(x)


class _NeMoEncoder(nn.Module):
    def __init__(self, feat_in, n_layers, d_model, n_heads, head_dim,
                 channels, factor, conv_kernel_size):
        super().__init__()
        self.pre_encode = _NeMoSubsampling(feat_in, d_model, channels, factor)
        self.layers = nn.ModuleList(
            _NeMoLayer(d_model, n_heads, head_dim, conv_kernel_size)
            for _ in range(n_layers)
        )
        self.d_model = d_model

    def forward(self, x):  # [B, T, F]
        h = self.pre_encode(x) * math.sqrt(self.d_model)  # xscale
        pos_emb = _nemo_rel_pe(h.shape[1], self.d_model, h.device)
        for layer in self.layers:
            h = layer(h, pos_emb)
        return h


class _NeMoDecoder(nn.Module):
    """ConvASRDecoder: 1×1 Conv1d CTC head, log-softmax output."""

    def __init__(self, d_model, num_classes):
        super().__init__()
        self.decoder_layers = nn.Sequential(nn.Conv1d(d_model, num_classes, 1))

    def forward(self, h):  # [B, T, d]
        return self.decoder_layers(h.transpose(1, 2)).transpose(1, 2).log_softmax(-1)


class TorchNeMoConformer(nn.Module):
    """NeMo-style rel-pos conformer-CTC with NeMo 1.x state-dict naming
    (``encoder.pre_encode.conv.N``, ``encoder.layers.N.self_attn.linear_q``,
    ``decoder.decoder_layers.0`` …)."""

    def __init__(self, feat_in=16, n_layers=2, d_model=32, n_heads=2,
                 head_dim=16, vocab_size=24, subsampling_factor=8,
                 subsampling_conv_channels=8, conv_kernel_size=9):
        super().__init__()
        self.encoder = _NeMoEncoder(feat_in, n_layers, d_model, n_heads,
                                    head_dim, subsampling_conv_channels,
                                    subsampling_factor, conv_kernel_size)
        self.decoder = _NeMoDecoder(d_model, vocab_size + 1)

    def forward(self, audio_signal):  # [B, F, T]
        h = self.encoder(audio_signal.transpose(1, 2))
        return {"final_posteriors": self.decoder(h)}


# ---------------------------------------------------------------------------
# Encoder-decoder twin (attention decoder with joint CTC branch) — mirrors
# dynamic_asr_eval_tpu/models/encdec.py, reference surface lcasr/lib.py:
# 1112-1322 (forward(audio, text_bos) -> final_posteriors_{ctc,lm}).
# ---------------------------------------------------------------------------


class _TorchDecoderBlock(nn.Module):
    """Pre-norm decoder block: causal self-attn, cross-attn, GELU FF."""

    def __init__(self, d_model, heads, ff_mult):
        super().__init__()
        self.heads, self.head_dim = heads, d_model // heads
        hd = heads * self.head_dim
        self.ln_self = nn.LayerNorm(d_model)
        self.self_qkv = nn.Linear(d_model, 3 * hd, bias=False)
        self.self_out = nn.Linear(hd, d_model, bias=False)
        self.ln_cross = nn.LayerNorm(d_model)
        self.cross_q = nn.Linear(d_model, hd, bias=False)
        self.cross_kv = nn.Linear(d_model, 2 * hd, bias=False)
        self.cross_out = nn.Linear(hd, d_model, bias=False)
        self.ln_ff = nn.LayerNorm(d_model)
        self.ff_in = nn.Linear(d_model, d_model * ff_mult)
        self.ff_out = nn.Linear(d_model * ff_mult, d_model)

    def forward(self, x, a_hidden, a_mask, self_mask):
        B, T, _ = x.shape
        H, D = self.heads, self.head_dim
        h = self.ln_self(x)
        qkv = self.self_qkv(h).reshape(B, T, 3, H, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = torch.einsum("bthd,bshd->bhts", q, k) / (D ** 0.5)
        causal = torch.tril(torch.ones(T, T, dtype=torch.bool, device=x.device))
        mask = causal[None, None] & self_mask[:, None, None, :]
        logits = logits.masked_fill(~mask, -1e30)
        attn = logits.softmax(-1)
        out = torch.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, H * D)
        x = x + self.self_out(out)

        h = self.ln_cross(x)
        qc = self.cross_q(h).reshape(B, T, H, D)
        Ta = a_hidden.shape[1]
        kv = self.cross_kv(a_hidden).reshape(B, Ta, 2, H, D)
        kc, vc = kv[:, :, 0], kv[:, :, 1]
        logits = torch.einsum("bthd,bshd->bhts", qc, kc) / (D ** 0.5)
        logits = logits.masked_fill(~a_mask[:, None, None, :], -1e30)
        attn = logits.softmax(-1)
        out = torch.einsum("bhts,bshd->bthd", attn, vc).reshape(B, T, H * D)
        x = x + self.cross_out(out)

        h = self.ln_ff(x)
        h = self.ff_out(torch.nn.functional.gelu(self.ff_in(h), approximate="tanh"))
        return x + h


class TorchEncDec(nn.Module):
    """SCConformer encoder + transformer attention decoder twin.

    ``forward(audio_signal, text_bos=None, text_lengths=None)`` returns
    ``{'a_hidden', 'final_posteriors_ctc'[, 'final_posteriors_lm']}`` like
    the flax ``EncDecConformer`` (and the reference model surface consumed
    at ``lcasr/lib.py:1255-1260``)."""

    def __init__(self, encoder_kwargs, decoder_layers=2, decoder_d_model=32,
                 decoder_heads=2, decoder_ff_mult=4, max_text_len=16):
        super().__init__()
        self.encoder = TorchSCConformer(**encoder_kwargs)
        vocab = encoder_kwargs["vocab_size"]
        d = decoder_d_model
        self.embed = nn.Embedding(vocab, d)
        self.pos_enc = nn.Embedding(max_text_len + 1, d)
        self.dec_layers = nn.ModuleList(
            _TorchDecoderBlock(d, decoder_heads, decoder_ff_mult)
            for _ in range(decoder_layers)
        )
        self.ln_f = nn.LayerNorm(d)
        self.head = nn.Linear(d, vocab)
        self.max_text_len = max_text_len

    def decode(self, tokens, a_hidden, text_lengths=None):
        B, T = tokens.shape
        Ta = a_hidden.shape[1]
        a_mask = torch.ones(B, Ta, dtype=torch.bool, device=tokens.device)
        if text_lengths is None:
            self_mask = torch.ones(B, T, dtype=torch.bool, device=tokens.device)
        else:
            self_mask = (
                torch.arange(T, device=tokens.device)[None, :]
                < text_lengths[:, None]
            )
        pos = torch.arange(T, device=tokens.device).clamp(0, self.max_text_len)
        x = self.embed(tokens) + self.pos_enc(pos)[None]
        for blk in self.dec_layers:
            x = blk(x, a_hidden, a_mask, self_mask)
        return self.head(self.ln_f(x))

    def forward(self, audio_signal, text_bos=None, text_lengths=None):
        enc = self.encoder(audio_signal)
        out = {
            "a_hidden": enc["a_hidden"],
            "final_posteriors_ctc": enc["final_posteriors"],
        }
        if text_bos is not None:
            out["final_posteriors_lm"] = self.decode(
                text_bos, enc["a_hidden"], text_lengths
            )
        return out


class TorchTransformerLM(nn.Module):
    """Full-sequence causal twin of ``lm.transformer_lm.TransformerLM``
    (lming-style decoder-only LM, the reference's fusion LM — consumed via
    ``lcasr/ctc_beam_search.py:45-87``).  Same naming the converter rules in
    ``lm/loader.py`` expect; rotary uses the same half-split convention and
    base; LayerNorm eps matches flax's 1e-6 default; gelu is tanh-approx.
    ``forward(tokens [B, T]) -> log_probs [B, T, V]`` — position t must match
    the flax model's step-t output when the ring cache never evicts."""

    def __init__(self, vocab_size=32, n_layers=2, d_model=32, n_heads=2,
                 rotary_base=10_000.0, expansion_factor=4):
        super().__init__()
        self.n_heads, self.head_dim = n_heads, d_model // n_heads
        self.rotary_base = rotary_base
        self.embed = nn.Embedding(vocab_size, d_model)
        self.layers = nn.ModuleList(
            _TorchLMBlock(d_model, n_heads, expansion_factor)
            for _ in range(n_layers)
        )
        self.ln_f = nn.LayerNorm(d_model, eps=1e-6)
        self.head = nn.Linear(d_model, vocab_size)

    def forward(self, tokens):
        x = self.embed(tokens)
        for blk in self.layers:
            x = blk(x, self.rotary_base)
        return torch.log_softmax(self.head(self.ln_f(x)), dim=-1)


class _TorchLMBlock(nn.Module):
    def __init__(self, d_model, heads, expansion):
        super().__init__()
        self.heads, self.head_dim = heads, d_model // heads
        hd = heads * self.head_dim
        self.ln1 = nn.LayerNorm(d_model, eps=1e-6)
        self.qkv = nn.Linear(d_model, 3 * hd, bias=False)
        self.out = nn.Linear(hd, d_model, bias=False)
        self.ln2 = nn.LayerNorm(d_model, eps=1e-6)
        self.ff_in = nn.Linear(d_model, d_model * expansion)
        self.ff_out = nn.Linear(d_model * expansion, d_model)

    @staticmethod
    def _rope(x, base):
        # x [B, H, T, D]; half-split rotary at absolute positions
        B, H, T, D = x.shape
        inv = 1.0 / (base ** (torch.arange(0, D, 2, dtype=torch.float32) / D))
        ang = torch.arange(T, dtype=torch.float32)[:, None] * inv[None, :]
        cos, sin = torch.cos(ang), torch.sin(ang)  # [T, D/2]
        x1, x2 = x[..., : D // 2], x[..., D // 2:]
        return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1)

    def forward(self, x, rotary_base):
        B, T, _ = x.shape
        H, D = self.heads, self.head_dim
        h = self.ln1(x)
        qkv = self.qkv(h).view(B, T, 3, H, D).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [B, H, T, D]
        q, k = self._rope(q, rotary_base), self._rope(k, rotary_base)
        logits = torch.einsum("bhtd,bhsd->bhts", q, k) / (D ** 0.5)
        causal = torch.tril(torch.ones(T, T, dtype=torch.bool))
        logits = logits.masked_fill(~causal, -1e30)
        attn = torch.softmax(logits, dim=-1)
        o = torch.einsum("bhts,bhsd->bhtd", attn, v)
        o = o.permute(0, 2, 1, 3).reshape(B, T, H * D)
        x = x + self.out(o)
        h2 = self.ln2(x)
        h2 = self.ff_out(torch.nn.functional.gelu(self.ff_in(h2),
                                                  approximate="tanh"))
        return x + h2
