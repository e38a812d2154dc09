"""Benchmark: Earnings-22-scale online NSTI dynamic evaluation.

Mirrors the reference's headline number (``launch_scripts/timeit_earnings22.sh``):
online dynamic eval (1 epoch, seq 16384 / overlap 14336) on a 4159.9 s
recording took ~82.9 s on an A4500-class GPU → RTF 0.023 ≈ 43.4× real time.

This bench runs the same protocol on the flagship full-size conformer
(lcasr160rb1-class, ~90 M params) with a synthetic spectrogram of the same
length, on one TPU chip.  Compile is excluded via one warmup run (the
reference's eager-PyTorch number has no compile either).

Prints ONE JSON line:
  {"metric": ..., "value": RTFx, "unit": "x_realtime", "vs_baseline": RTFx/43.4}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: warmup cost is paid once per machine, and the
    # axon remote-compile path is both slow and noisy (75-330 s observed)
    cache_dir = os.environ.get("JAX_COMPILE_CACHE", "/tmp/dae_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    # The axon tunnel's FIRST device→host transfer can take minutes (one-time
    # channel init).  Trigger it in a background thread so it overlaps with
    # model build + compile instead of serializing into the warmup.
    import threading

    def _prime_d2h():
        try:
            np.asarray(jnp.zeros((8,), jnp.int32))
        except Exception:
            pass

    threading.Thread(target=_prime_d2h, daemon=True).start()
    audio_seconds = float(os.environ.get("BENCH_SECONDS", 4159.9 if on_tpu else 40.0))
    frames_per_second = 100.0  # 10 ms hop featurizer
    spec_n = int(audio_seconds * frames_per_second)

    from dynamic_asr_eval_tpu.config import SpecAugmentConfig, TTAConfig
    from dynamic_asr_eval_tpu.models import init_conformer
    from dynamic_asr_eval_tpu.tta import DynamicEvalEngine
    from __graft_entry__ import _flagship_config

    if on_tpu:
        cfg = _flagship_config()
        seq_len, overlap = 16384, 14336
    else:  # CPU smoke fallback
        from dynamic_asr_eval_tpu.models import ConformerConfig

        cfg = ConformerConfig(
            feat_in=80, n_layers=2, d_model=64, n_heads=2, head_dim=32,
            vocab_size=128, subsampling_factor=4, subsampling_conv_channels=8,
            conv_kernel_size=5, compute_dtype=jnp.float32,
        )
        seq_len, overlap = 512, 448

    print(f"bench: backend={backend} audio={audio_seconds}s spec_n={spec_n} "
          f"model d={cfg.d_model} L={cfg.n_layers} V={cfg.vocab_size}", file=sys.stderr)

    model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=seq_len)

    tta = TTAConfig(
        seq_len=seq_len,
        overlap=overlap,
        epochs=1,
        online=True,
        shuffle=False,
        spec_augment=SpecAugmentConfig(n_freq_masks=6, freq_mask_param=34),
        optim_args={"lr": 9e-5},
    )
    engine = DynamicEvalEngine(
        model, cfg.blank_id, cfg.subsampling_factor, tta,
    )

    spec = np.random.default_rng(0).standard_normal((cfg.feat_in, spec_n)).astype(np.float32)

    # warmup: compile the exact shapes
    t_warm = time.time()
    out = engine(variables, spec, rng=jax.random.PRNGKey(1))
    ids = out.greedy_ids()
    print(f"bench: warmup (incl. compile) {time.time()-t_warm:.1f}s, "
          f"stitched {out.logits.shape}, {len(ids)} tokens", file=sys.stderr)

    # timed run: adaptation + stitch + on-device greedy decode to host ids —
    # the full per-recording deliverable (stitched matrix stays on device)
    t0 = time.time()
    out = engine(variables, spec, rng=jax.random.PRNGKey(2))
    ids = out.greedy_ids()
    elapsed = time.time() - t0
    assert bool(jnp.isfinite(out.logits).all()), "non-finite stitched logits"

    rtfx = audio_seconds / elapsed
    baseline_rtfx = 43.4  # reference online NSTI, BASELINE.md row 1
    result = {
        "metric": "earnings22_nsti_online_rtfx",
        "value": round(rtfx, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtfx / baseline_rtfx, 3),
    }
    print(f"bench: adapt+stitch {elapsed:.2f}s for {audio_seconds}s audio "
          f"→ RTFx {rtfx:.1f}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
