"""Analytic FLOP model (perf.py): sanity and MFU plumbing."""

import jax.numpy as jnp

from dynamic_asr_eval_tpu.models.conformer import ConformerConfig
from dynamic_asr_eval_tpu.perf import (
    conformer_forward_flops, device_peak_flops, mfu, training_step_flops,
)


def _cfg():
    return ConformerConfig(
        feat_in=80, n_layers=6, d_model=768, n_heads=6, head_dim=128,
        vocab_size=4095, subsampling_factor=8, subsampling_conv_channels=256,
        conv_kernel_size=9, compute_dtype=jnp.float32,
    )


def test_forward_flops_scale_with_batch_and_length():
    cfg = _cfg()
    f1 = conformer_forward_flops(cfg, 16384, batch=1)
    f2 = conformer_forward_flops(cfg, 16384, batch=2)
    assert abs(f2 - 2 * f1) / f2 < 1e-9  # linear in batch
    fs = conformer_forward_flops(cfg, 8192, batch=1)
    assert f1 > fs > 0  # superlinear-ish in T (attention T^2 term)
    # flagship ballpark: ~1 TFLOP per 16384-frame window forward
    assert 0.5e12 < f1 < 5e12


def test_training_step_counts_backward_only_for_grad_batch():
    cfg = _cfg()
    fwd1 = conformer_forward_flops(cfg, 16384, batch=1)
    fwd2 = conformer_forward_flops(cfg, 16384, batch=2)
    # NSTI default: batch = [1 aug + 1 clean], clean is stop_gradient-ed
    step = training_step_flops(cfg, 16384, batch=2)
    assert abs(step - (fwd2 + 2 * fwd1)) / step < 1e-9
    # explicit grad_batch override
    assert training_step_flops(cfg, 16384, batch=2, grad_batch=2) > step


def test_device_peak_and_mfu():
    assert device_peak_flops("TPU v5 lite") == 197e12
    assert device_peak_flops("TPU v4") == 275e12
    assert device_peak_flops("unknown accel") is None
    assert abs(mfu(197e12, 1.0, "TPU v5 lite") - 1.0) < 1e-9
    assert mfu(1.0, 1.0, "unknown") is None
