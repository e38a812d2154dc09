"""Fused Pallas TPU kernel for the dw-striding conv subsampling stack.

Why this exists: the subsampling stack is <3 % of the conformer's FLOPs but
~44 % of its forward wall-clock under XLA (PERF.md) — XLA does not fuse the
9-term tap sums of the stride-2 convs and round-trips ~6 GB of
[B, T/2, F/2, C] intermediates through HBM per forward.  Reference surface:
the torch backend's ``nn.Conv2d``-based ``dw_striding`` subsampling (NeMo
convention; SURVEY §2.2 row 8), which cuDNN fuses on GPU.

The kernel computes, entirely in VMEM per (batch, output-row tile)::

    x [B, T, F] ──3×3 s2 conv (C_in=1→C) + bias ── act ──►
      stage i ∈ {1,2}: 3×3 s2 depthwise + bias → 1×1 pointwise + bias → act
      ──► out [B, ⌈T/8⌉, F/8, C]

numerically matching ``models/conformer.py::DWStridingSubsampling``
(subsampling_factor 8): SAME zero padding at every stage boundary (halo rows
outside a stage's valid range are re-zeroed so tiles reproduce the unfused
semantics), configurable compute dtype, f32 matmul accumulation.

Lowering choices (per /opt/skills/guides/pallas_guide.md):
- grid = (B, T_out / tile), sequential on one core; the 7-row input halo
  arrives through a second 8-row BlockSpec over the same top-padded array —
  no manual DMA.
- no strided slices or scatters: stride-2 reads use even/odd phase reshapes;
  the backward's transposed convs use zero-dilated upsampling (stack +
  reshape) followed by ±1-shift windows.
- stage-0 (C_in=1) runs as an im2col ``[R·F0, 9] @ [9, C]`` MXU dot;
  depthwise taps are VPU multiply-adds; pointwise convs are MXU dots.
- backward recomputes the forward per tile (cheaper than saving
  intermediates), accumulates weight grads into f32 whole-array blocks
  revisited by every grid step, and writes input grads as a disjoint main
  block plus a per-tile 8-row halo block the wrapper folds back in (output
  blocks cannot overlap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 7  # input rows needed above a tile: (((1)*2+1)*2+1)*2+1 = 15 → top 7


def _fwd_tile(dtype):
    """VMEM is ~16 MB; the stage-0 activation [4·tile+3, F/2, C] is the big
    buffer (2.7 MB at tile 16 / C 256 / f32 — the kernel accumulates taps
    and activations in f32 regardless of dtype) and several are live at
    once, plus double-buffered input/output blocks."""
    del dtype
    return 12


def _bwd_tile(dtype):
    # backward keeps forward intermediates plus mirrored gradients live
    del dtype
    return 4


def _act(name):
    return {"silu": jax.nn.silu, "relu": jax.nn.relu, "gelu": jax.nn.gelu}[name]


def _act_grad(name, z):
    if name == "relu":
        return (z > 0).astype(z.dtype)
    if name == "silu":
        s = jax.nn.sigmoid(z)
        return s * (1 + z * (1 - s))
    if name == "gelu":  # tanh approximation, matches jax.nn.gelu default
        c = np.float32(np.sqrt(2 / np.pi))
        t = jnp.tanh(c * (z + 0.044715 * z ** 3))
        return 0.5 * (1 + t) + 0.5 * z * (1 - t * t) * c * (1 + 3 * 0.044715 * z * z)
    raise ValueError(name)


# ---------------------------------------------------------------------------
# phase-reshape tap helpers (no strided memory ops)
# ---------------------------------------------------------------------------


def _row_taps(h, R_out):
    """h [R_in≥2·R_out+1, ...] → (rows 2r, 2r+1, 2r+2), each [R_out, ...]."""
    he = h[: 2 * R_out].reshape((R_out, 2) + h.shape[1:])
    ev, od = he[:, 0], he[:, 1]
    c = jnp.concatenate([ev[1:], h[2 * R_out : 2 * R_out + 1]], axis=0)
    return ev, od, c


def _col_taps(h, F_out):
    """h [..., 2·F_out, ...] (axis 1) → cols (2f-1, 2f, 2f+1) with a zero
    column at f=0 for the df=0 tap (SAME left padding)."""
    hc = h.reshape(h.shape[:1] + (F_out, 2) + h.shape[2:])
    ev, od = hc[:, :, 0], hc[:, :, 1]
    a = jnp.concatenate([jnp.zeros_like(od[:, :1]), od[:, : F_out - 1]], axis=1)
    return a, ev, od


def _taps9(h, R_out, F_out):
    """9 tap tensors [(dt, df) row-major], each [R_out, F_out, ...]."""
    rows = _row_taps(h, R_out)
    out = []
    for dt in range(3):
        out.extend(_col_taps(rows[dt], F_out))
    return out


def _dilate2(g):
    """g [R, F, ...] → [2R, 2F, ...] with g at (even, even) positions."""
    z = jnp.zeros_like(g)
    gr = jnp.stack([g, z], axis=1).reshape((2 * g.shape[0],) + g.shape[1:])
    zc = jnp.zeros_like(gr)
    gc = jnp.stack([gr, zc], axis=2).reshape(
        (gr.shape[0], 2 * gr.shape[1]) + gr.shape[2:])
    return gc


def _transposed_taps(g, R_in, W):
    """Scatter-transpose of the stride-2 3×3 tap pattern.

    Returns the 9 shift windows S_j [R_in, W, ...] such that the input grad
    is Σ_j S_j · w_j: S_j[i, w] = ĝ[i - dt, w - df + 1] with ĝ the
    zero-dilated g (g at even/even)."""
    gd = _dilate2(g)  # [2R_out, 2F_out, ...]
    pr = R_in - gd.shape[0]
    P = jnp.pad(gd, ((2, max(pr, 0)), (1, 1)) + ((0, 0),) * (gd.ndim - 2))
    P = P[: R_in + 2]
    wins = []
    for dt in range(3):
        row = P[2 - dt : 2 - dt + R_in]
        for df in range(3):
            wins.append(row[:, 2 - df : 2 - df + W])
    return wins


# ---------------------------------------------------------------------------
# shared tile math
# ---------------------------------------------------------------------------


def _dw_conv(h, w9, b, R_out, F_out):
    """Depthwise 3×3 stride-2: h [R_in, 2F_out, C] → [R_out, F_out, C]."""
    taps = _taps9(h, R_out, F_out)
    w9 = w9.astype(h.dtype)
    acc = taps[0] * w9[0] + b.astype(h.dtype)
    for j in range(1, 9):
        acc = acc + taps[j] * w9[j]
    return acc


def _shift_cols_right(p):
    """p[:, f] → p[:, f-1] with a zero column at f=0 (axis 1 = sublanes:
    all column-plane tensors carry a trailing unit/channel lane dim)."""
    return jnp.concatenate([jnp.zeros_like(p[:, :1]), p[:, :-1]], axis=1)


def _shift_cols_left(p):
    """p[:, f] → p[:, f+1] with a zero column at f=F-1."""
    return jnp.concatenate([p[:, 1:], jnp.zeros_like(p[:, :1])], axis=1)


def _x_taps9(xe, xo, R_out):
    """Stage-0 taps from pre-split column planes xe = x[:, 0::2, None],
    xo = x[:, 1::2, None], each [R, F/2, 1].

    The wrapper splits columns AND appends the unit lane dim in XLA: inside
    the kernel F must live on sublanes (lane-dimension splits/relayouts are
    unsupported or VPU-murder in Mosaic), and with a unit lane dim the
    tap × k9[j] products become free lane broadcasts.  Returns
    9 × [R_out, F_out, 1]."""
    out = []
    for he, ho in zip(_row_taps(xe, R_out), _row_taps(xo, R_out)):
        # col taps for output col f: in cols 2f-1 (=xo[f-1]), 2f, 2f+1
        out.extend([_shift_cols_right(ho), he, ho])
    return out


def _stage0(xe, xo, k9, b, R_out, dtype):
    """3×3 stride-2 conv, 1 input channel: 9 lane-broadcast FMAs on the VPU
    ([R, F0, 1] tap × [C] weight → [R, F0, C], no relayout)."""
    taps = _x_taps9(xe, xo, R_out)
    k9 = k9.astype(jnp.float32)
    acc = taps[0].astype(jnp.float32) * k9[0] + b.astype(jnp.float32)
    for j in range(1, 9):
        acc = acc + taps[j].astype(jnp.float32) * k9[j]
    return acc.astype(dtype)


def _row_mask(val, R, start, limit):
    """Zero rows whose global index (start + r) is outside [0, limit)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (R, 1, 1), 0)
    g = start + r
    return jnp.where((g >= 0) & (g < limit), val, jnp.zeros_like(val))


def _tile_forward(xe, xo, params, t, dims, act_name, dtype, tile):
    """xe/xo [8·tile + 8, F/2] column planes (global rows 8·tile·t − 7 …) →
    intermediates through s3 [tile, F/8, C]."""
    (k9, b0, dw1, bdw1, pw1, bpw1, dw2, bdw2, pw2, bpw2) = params
    F, To0, To1, To2 = dims
    F0, F1, F2 = F // 2, F // 4, F // 8
    R0 = 4 * tile + 3
    R1 = 2 * tile + 1
    act = _act(act_name)

    z0 = _stage0(xe, xo, k9, b0, R0, dtype)
    # activations run in f32: Mosaic mis-verifies logistic on bf16 vectors
    # (f32 scalar broadcast into a bf16 vector), and f32 is more accurate
    s0 = _row_mask(act(z0.astype(jnp.float32)).astype(dtype),
                   R0, 4 * tile * t - 3, To0)

    d1 = _dw_conv(s0, dw1, bdw1, R1, F1)
    z1 = jax.lax.dot_general(
        d1.reshape(R1 * F1, -1), pw1.astype(d1.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(R1, F1, -1).astype(dtype) + bpw1.astype(dtype)
    s1 = _row_mask(act(z1.astype(jnp.float32)).astype(dtype),
                   R1, 2 * tile * t - 1, To1)

    d2 = _dw_conv(s1, dw2, bdw2, tile, F2)
    z2 = jax.lax.dot_general(
        d2.reshape(tile * F2, -1), pw2.astype(d2.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(tile, F2, -1).astype(dtype) + bpw2.astype(dtype)
    s3 = act(z2.astype(jnp.float32)).astype(dtype)
    return z0, s0, d1, z1, s1, d2, z2, s3


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(xe_main, xe_halo, xo_main, xo_halo, *refs,
                dims, act_name, dtype, tile):
    (k9, b0, dw1, bdw1, pw1, bpw1, dw2, bdw2, pw2, bpw2, out) = refs
    t = pl.program_id(1)
    xe = jnp.concatenate([xe_main[0], xe_halo[0]], axis=0)
    xo = jnp.concatenate([xo_main[0], xo_halo[0]], axis=0)
    params = (k9[:], b0[:], dw1[:], bdw1[:], pw1[:], bpw1[:],
              dw2[:], bdw2[:], pw2[:], bpw2[:])
    *_, s3 = _tile_forward(xe, xo, params, t, dims, act_name, dtype, tile)
    out[0] = s3.astype(out.dtype)


def _param_specs():
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(10)]


def _x_specs(F, tile):
    """Main + halo BlockSpecs for one column plane [B, Tp, F/2, 1]."""
    ti = 8 * tile
    return [
        # main block: x_pad rows [ti·t, ti·t + ti)
        pl.BlockSpec((1, ti, F // 2, 1), lambda b, t: (b, t, 0, 0),
                     memory_space=pltpu.VMEM),
        # halo block: x_pad rows [ti·(t+1), ti·(t+1) + 8) — 7 used + 1 pad
        pl.BlockSpec((1, HALO + 1, F // 2, 1),
                     lambda b, t: (b, (t + 1) * ti // (HALO + 1), 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _split_cols(x_pad):
    """x_pad [B, Tp, F] → even/odd column planes [B, Tp, F/2, 1] (in XLA —
    in-kernel, F must sit on sublanes with a unit lane dim: Mosaic cannot
    split or relayout the lane dimension)."""
    B, Tp, F = x_pad.shape
    xr = x_pad.reshape(B, Tp, F // 2, 2)
    return xr[..., 0:1], xr[..., 1:2]


def _fwd_pallas(x_pad, params, *, dims, act_name, interpret, tile):
    B, Tp, F = x_pad.shape
    ti = 8 * tile
    NT = Tp // ti - 1  # last ti block only backs the final halo read
    C = params[0].shape[1]
    dtype = x_pad.dtype
    xe, xo = _split_cols(x_pad)
    kern = functools.partial(_fwd_kernel, dims=dims, act_name=act_name,
                             dtype=dtype, tile=tile)
    return pl.pallas_call(
        kern,
        grid=(B, NT),
        in_specs=_x_specs(F, tile) * 2 + _param_specs(),
        out_specs=pl.BlockSpec((1, tile, F // 8, C), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NT * tile, F // 8, C), dtype),
        interpret=interpret,
    )(xe, xe, xo, xo, *params)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _sum01(v):
    """Σ over the leading axes of [R, F, C] → [C].

    Mosaic rejects float-ADD vector.multi_reduction when the operand layout
    has non-zero offsets over reduced dims; a ones-row MXU dot relayouts
    freely and costs nothing at these sizes."""
    v2 = v.reshape(-1, v.shape[-1]).astype(jnp.float32)
    ones = jnp.ones((1, v2.shape[0]), jnp.float32)
    return jax.lax.dot_general(
        ones, v2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)[0]


def _dw_bwd(g, h, w9, R_in, R_out, F_out):
    """Backward of _dw_conv: g [R_out, F_out, C] at the output, h the conv
    input [R_in, 2F_out, C].  Returns (gh, gw [9, C] f32, gb [C] f32)."""
    taps = _taps9(h, R_out, F_out)
    gf = g.astype(jnp.float32)
    gw = jnp.stack([_sum01(taps[j].astype(jnp.float32) * gf)
                    for j in range(9)])
    gb = _sum01(gf)
    wins = _transposed_taps(g, R_in, 2 * F_out)
    w9 = w9.astype(g.dtype)
    gh = wins[0] * w9[0]
    for j in range(1, 9):
        gh = gh + wins[j] * w9[j]
    return gh, gw, gb


def _bwd_kernel(xe_main, xe_halo, xo_main, xo_halo, g_in, *refs,
                dims, act_name, dtype, tile):
    (k9, b0, dw1, bdw1, pw1, bpw1, dw2, bdw2, pw2, bpw2,
     gxe_main, gxo_main, gxe_halo, gxo_halo,
     gk9, gb0, gdw1, gbdw1, gpw1, gbpw1,
     gdw2, gbdw2, gpw2, gbpw2) = refs
    t = pl.program_id(1)
    b = pl.program_id(0)
    F, To0, To1, To2 = dims
    F0, F1, F2 = F // 2, F // 4, F // 8
    R0 = 4 * tile + 3
    R1 = 2 * tile + 1
    ti = 8 * tile
    Rx = ti + HALO + 1

    xe = jnp.concatenate([xe_main[0], xe_halo[0]], axis=0)
    xo = jnp.concatenate([xo_main[0], xo_halo[0]], axis=0)
    params = (k9[:], b0[:], dw1[:], bdw1[:], pw1[:], bpw1[:],
              dw2[:], bdw2[:], pw2[:], bpw2[:])
    z0, s0, d1, z1, s1, d2, z2, s3 = _tile_forward(
        xe, xo, params, t, dims, act_name, dtype, tile)

    @pl.when(jnp.logical_and(t == 0, b == 0))
    def _():
        for ref in (gk9, gb0, gdw1, gbdw1, gpw1, gbpw1,
                    gdw2, gbdw2, gpw2, gbpw2):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    g3 = g_in[0]
    gz2 = (g3.astype(jnp.float32)
           * _act_grad(act_name, z2.astype(jnp.float32))).astype(dtype)

    gpw2[...] += jax.lax.dot_general(
        d2.reshape(tile * F2, -1), gz2.reshape(tile * F2, -1),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    gbpw2[...] += _sum01(gz2.astype(jnp.float32))
    gd2 = jax.lax.dot_general(
        gz2.reshape(tile * F2, -1), pw2[:].astype(gz2.dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(tile, F2, -1).astype(dtype)

    gs1, gw2, gb2 = _dw_bwd(gd2, s1, dw2[:], R1, tile, F2)
    gdw2[...] += gw2
    gbdw2[...] += gb2
    gs1 = _row_mask(gs1, R1, 2 * tile * t - 1, To1)
    gz1 = (gs1.astype(jnp.float32)
           * _act_grad(act_name, z1.astype(jnp.float32))).astype(dtype)

    gpw1[...] += jax.lax.dot_general(
        d1.reshape(R1 * F1, -1), gz1.reshape(R1 * F1, -1),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    gbpw1[...] += _sum01(gz1.astype(jnp.float32))
    gd1 = jax.lax.dot_general(
        gz1.reshape(R1 * F1, -1), pw1[:].astype(gz1.dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(R1, F1, -1).astype(dtype)

    gs0, gw1, gb1 = _dw_bwd(gd1, s0, dw1[:], R0, R1, F1)
    gdw1[...] += gw1
    gbdw1[...] += gb1
    gs0 = _row_mask(gs0, R0, 4 * tile * t - 3, To0)
    gz0 = (gs0.astype(jnp.float32)
           * _act_grad(act_name, z0.astype(jnp.float32))).astype(dtype)

    # stage 0 (C_in = 1): dW via lane-broadcast products + _sum01 reduce;
    # per-tap scalar grads G_j as [M, C] @ [C, 1] MXU dots (sublane-only
    # reshapes); dx via row-dilated transposed scatter on the column planes
    # (the wrapper interleaves even/odd back in XLA).
    M0 = R0 * F0
    taps = _x_taps9(xe, xo, R0)  # 9 × [R0, F0, 1]
    gz0f = gz0.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    gk9[...] += jnp.stack([
        _sum01(taps[j].astype(jnp.float32) * gz0f) for j in range(9)])
    gb0[...] += _sum01(gz0f)
    gz0m = gz0f.reshape(M0, -1)
    k9f = k9[:].astype(jnp.float32)
    gxe = jnp.zeros((Rx, F0, 1), jnp.float32)
    gxo = jnp.zeros((Rx, F0, 1), jnp.float32)
    for dt in range(3):
        for df in range(3):
            Gj = jax.lax.dot_general(
                gz0m, k9f[3 * dt + df][:, None],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=hi).reshape(R0, F0, 1)
            z = jnp.zeros_like(Gj)
            Gr = jnp.stack([Gj, z], axis=1).reshape(2 * R0, F0, 1)  # row-dilated
            P = jnp.pad(Gr, ((2, max(Rx - 2 * R0, 0)), (0, 0), (0, 0)))[: Rx + 2]
            win = P[2 - dt : 2 - dt + Rx]
            # fwd col taps: a(df=0) = xo[f-1], b(df=1) = xe[f], c(df=2) = xo[f]
            if df == 0:
                gxo = gxo + _shift_cols_left(win)
            elif df == 1:
                gxe = gxe + win
            else:
                gxo = gxo + win
    # gx local row i ↔ x_pad row ti·t + i: rows [0, ti) belong to this
    # tile's main block; rows [ti, ti+8) are contributions to the NEXT
    # block's first rows (folded in by the wrapper; row ti+7 is always 0).
    gxe_main[0] = gxe[:ti].astype(dtype)
    gxo_main[0] = gxo[:ti].astype(dtype)
    gxe_halo[0] = gxe[ti : ti + HALO + 1].astype(dtype)
    gxo_halo[0] = gxo[ti : ti + HALO + 1].astype(dtype)


def _bwd_pallas(x_pad, g, params, *, dims, act_name, interpret, tile):
    B, Tp, F = x_pad.shape
    ti = 8 * tile
    NT = Tp // ti - 1
    C = params[0].shape[1]
    dtype = x_pad.dtype
    xe, xo = _split_cols(x_pad)
    acc = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    plane_main = lambda: pl.BlockSpec((1, ti, F // 2, 1),
                                      lambda b, t: (b, t, 0, 0),
                                      memory_space=pltpu.VMEM)
    plane_halo = lambda: pl.BlockSpec((1, HALO + 1, F // 2, 1),
                                      lambda b, t: (b, t, 0, 0),
                                      memory_space=pltpu.VMEM)
    out_specs = [
        plane_main(), plane_main(), plane_halo(), plane_halo(),
        acc(), acc(), acc(), acc(), acc(), acc(), acc(), acc(), acc(), acc(),
    ]
    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((B, NT * ti, F // 2, 1), dtype),
        jax.ShapeDtypeStruct((B, NT * ti, F // 2, 1), dtype),
        jax.ShapeDtypeStruct((B, NT * (HALO + 1), F // 2, 1), dtype),
        jax.ShapeDtypeStruct((B, NT * (HALO + 1), F // 2, 1), dtype),
        jax.ShapeDtypeStruct((9, C), f32), jax.ShapeDtypeStruct((C,), f32),
        jax.ShapeDtypeStruct((9, C), f32), jax.ShapeDtypeStruct((C,), f32),
        jax.ShapeDtypeStruct((C, C), f32), jax.ShapeDtypeStruct((C,), f32),
        jax.ShapeDtypeStruct((9, C), f32), jax.ShapeDtypeStruct((C,), f32),
        jax.ShapeDtypeStruct((C, C), f32), jax.ShapeDtypeStruct((C,), f32),
    ]
    g_spec = pl.BlockSpec((1, tile, F // 8, C), lambda b, t: (b, t, 0, 0),
                          memory_space=pltpu.VMEM)
    kern = functools.partial(_bwd_kernel, dims=dims, act_name=act_name,
                             dtype=dtype, tile=tile)
    return pl.pallas_call(
        kern,
        grid=(B, NT),
        in_specs=_x_specs(F, tile) * 2 + [g_spec] + _param_specs(),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(xe, xe, xo, xo, g, *params)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def _ceil_chain(T):
    To0 = -(-T // 2)
    To1 = -(-To0 // 2)
    To2 = -(-To1 // 2)
    return To0, To1, To2


def _prep(x, tile):
    """Pad x [B, T, F] with HALO zero rows on top and zeros below so the
    length is (NT + 1) tiles of 8·tile rows (the extra tile backs the last
    halo BlockSpec read).  Row HALO of the result is x row 0."""
    B, T, F = x.shape
    ti = 8 * tile
    NT = -(-T // ti)
    return jnp.pad(x, ((0, 0), (HALO, (NT + 1) * ti - T - HALO), (0, 0))), NT


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def fused_subsample(x, k9, b0, dw1, bdw1, pw1, bpw1, dw2, bdw2, pw2, bpw2,
                    act_name="silu", interpret=False):
    """Fused ×8 dw-striding subsampling: x [B, T, F] → [B, ⌈T/8⌉, F/8, C].

    Weights: k9/dw1/dw2 [9, C] (3×3 kernels, (dt, df) row-major), pw1/pw2
    [C, C], biases [C].  ``F`` must be divisible by 8.  Numerically matches
    ``DWStridingSubsampling`` with ``subsampling_factor=8`` (same SAME-pad
    semantics; f32 matmul accumulation)."""
    out, _ = _fused_fwd(x, k9, b0, dw1, bdw1, pw1, bpw1, dw2, bdw2, pw2,
                        bpw2, act_name, interpret)
    return out


def _fused_fwd(x, k9, b0, dw1, bdw1, pw1, bpw1, dw2, bdw2, pw2, bpw2,
               act_name, interpret):
    B, T, F = x.shape
    if F % 8:
        raise ValueError(f"feat dim {F} must be divisible by 8")
    dims = (F,) + _ceil_chain(T)
    params = (k9, b0, dw1, bdw1, pw1, bpw1, dw2, bdw2, pw2, bpw2)
    fwd_tile = _fwd_tile(x.dtype)
    x_pad, _ = _prep(x, fwd_tile)
    out = _fwd_pallas(x_pad, params, dims=dims, act_name=act_name,
                      interpret=interpret, tile=fwd_tile)
    return out[:, : dims[3]], (x,) + params


def _fused_bwd(act_name, interpret, res, g):
    x, *params = res
    params = tuple(params)
    B, T, F = x.shape
    dims = (F,) + _ceil_chain(T)
    tile = _bwd_tile(x.dtype)
    ti = 8 * tile
    x_pad, NT = _prep(x, tile)
    g_pad = jnp.pad(g.astype(x.dtype),
                    ((0, 0), (0, NT * tile - dims[3]), (0, 0), (0, 0)))
    outs = _bwd_pallas(x_pad, g_pad, params, dims=dims, act_name=act_name,
                       interpret=interpret, tile=tile)
    (gxe_main, gxo_main, gxe_halo, gxo_halo,
     gk9, gb0, gdw1, gbdw1, gpw1, gbpw1,
     gdw2, gbdw2, gpw2, gbpw2) = outs

    # Fold per-tile halo grads: tile t's halo output covers x_pad rows
    # [ti·(t+1), ti·(t+1)+8) — shift one block right and add.  Extend by one
    # block so the last tile's halo (x rows in the final 7) lands in range.
    def fold(main, halo):
        main = main[..., 0].astype(jnp.float32)       # [B, NT·ti, F/2]
        halo = halo[..., 0].astype(jnp.float32).reshape(B, NT, HALO + 1, -1)
        flat = jnp.pad(main, ((0, 0), (0, ti), (0, 0)))
        halo_pad = jnp.pad(halo, ((0, 0), (0, 0), (0, ti - HALO - 1), (0, 0)))
        return flat.at[:, ti:].add(halo_pad.reshape(B, NT * ti, -1))

    ge, go = fold(gxe_main, gxe_halo), fold(gxo_main, gxo_halo)
    gx = jnp.stack([ge, go], axis=-1).reshape(B, ge.shape[1], F)
    gx = gx[:, HALO : HALO + T].astype(x.dtype)
    (k9, b0, dw1, bdw1, pw1, bpw1, dw2, bdw2, pw2, bpw2) = params
    return (gx, gk9.astype(k9.dtype), gb0.astype(b0.dtype),
            gdw1.astype(dw1.dtype), gbdw1.astype(bdw1.dtype),
            gpw1.astype(pw1.dtype), gbpw1.astype(bpw1.dtype),
            gdw2.astype(dw2.dtype), gbdw2.astype(bdw2.dtype),
            gpw2.astype(pw2.dtype), gbpw2.astype(bpw2.dtype))


fused_subsample.defvjp(_fused_fwd, _fused_bwd)
