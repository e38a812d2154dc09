"""Benchmark: Earnings-22-scale adaptation + decode on one TPU chip.

Covers all timed rows of BASELINE.md (reference
``launch_scripts/timeit_earnings22.sh``): a 4159.9 s recording, seq 16384 /
overlap 14336:

1. **NSTI online dynamic eval** (1 epoch) — reference 82.9 s on an
   A4500-class GPU → RTFx 43.4.  Primary metric; an MFU estimate (analytic
   matmul FLOPs vs chip bf16 peak) rides along.
2. **AWMC** — reference 403.6 s → RTFx 10.3.
3. **LM-fused stitched beam decode** — transformer-LM shallow fusion
   (beam 20, α 0.45 β 1.53, blank-run collapse) over the full stitched
   posterior matrix.  The reference publishes no wall-clock for this; we
   report vs the north-star 10× real-time (BASELINE.md).

Compile is excluded via one warmup run per section (the reference's
eager-PyTorch numbers have no compile either).

Prints ONE JSON line: the primary metric at the top level plus
``extra_metrics`` with the remaining rows:
  {"metric": "earnings22_nsti_online_rtfx", "value": N, "unit": "x_realtime",
   "vs_baseline": N/43.4, "extra_metrics": [...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _make_ctc_like_logits(total_ds: int, vocab_plus_blank: int, seed: int = 0):
    """Synthetic stitched CTC posteriors with realistic blank statistics.

    Real conformer-CTC output at 12.5 Hz is blank-dominated (~70-85% of
    frames) with sparse token spikes — exactly what blank-run collapse and
    beam pruning exploit.  Random-init model output is near-uniform and
    would make decode timing unrepresentative, so the decode bench uses this
    shaped distribution instead (token every ~4th frame, Zipf token ids,
    blank log-prob ≈ log 0.95 elsewhere)."""
    rng = np.random.default_rng(seed)
    V = vocab_plus_blank - 1
    lp = np.full((total_ds, vocab_plus_blank), np.log(0.005 / V), np.float32)
    lp[:, V] = np.log(0.995)  # blank-dominant everywhere...
    tok_frames = np.arange(0, total_ds, 4)
    toks = np.minimum((rng.zipf(1.3, size=tok_frames.size) - 1) % (V - 1) + 1, V - 1)
    lp[tok_frames, V] = np.log(0.05)
    lp[tok_frames, toks] = np.log(0.9)
    # renormalize rows to proper log-probs
    lp -= np.log(np.exp(lp).sum(-1, keepdims=True))
    return lp


def _backend_watchdog(deadline_s: float):
    """Fail fast (diagnostic JSON + exit 1) if JAX backend init hangs.

    The axon TPU plugin retries a wedged tunnel forever inside
    ``jax.devices()``; a hung bench run gives the driver nothing to record.
    The probe runs in a daemon thread; if it doesn't come back within the
    deadline the process exits with an explicit error line instead."""
    import threading

    ready = threading.Event()

    def _probe():
        import jax

        jax.devices()
        ready.set()

    threading.Thread(target=_probe, daemon=True).start()
    if not ready.wait(deadline_s):
        print(json.dumps({
            "metric": "earnings22_nsti_online_rtfx",
            "value": 0.0,
            "unit": "x_realtime",
            "vs_baseline": 0.0,
            "error": f"jax backend init exceeded {deadline_s:.0f}s "
                     "(TPU tunnel unreachable) — infrastructure, not repo",
        }))
        os._exit(1)


def _lm_rows(cfg, audio_seconds, total_ds, extra, jax, jnp):
    """LM-fused final decode rows (reference's ``-lm`` decode,
    lcasr/run.py:37-47): single-stream RTFx + a batched-streams aggregate row.

    Instrumented per VERDICT r3 ask #1: the single-stream row reports each
    phase (host blank-collapse over the [54k, 4096] matrix, device upload +
    sync, per-segment device decode) so a host-contention slowdown — which
    hits the numpy pass and the 443 MB tunnel upload, NOT the device scans —
    is visible in the artifact instead of silently deflating RTFx.
    Weights are random-init at the published shape — decode wall-clock is
    weight-independent; blank statistics come from shaped synthetic
    posteriors (see _make_ctc_like_logits)."""
    import sys
    import time

    from dynamic_asr_eval_tpu.lm.transformer_lm import TransformerLMConfig, init_lm
    from dynamic_asr_eval_tpu.ops.beam_search import (
        TransformerLMAdapter, beam_search_segmented, beam_search_streams,
        collapse_blank_frames,
    )

    # bf16 LM: the TPU-native inference dtype (weights + KV cache) — A/B'd
    # on chip at 1.67x over f32 with token-level-identical-to-noise output
    # (9697 vs 9675 tokens on the 27k-frame stream); fused log-probs keep
    # f32 via log_softmax upcast
    lm_cfg = TransformerLMConfig(
        vocab_size=cfg.vocab_size, n_layers=6, d_model=512,
        max_cache_length=128, compute_dtype=jnp.bfloat16,
    )
    lm_model, lm_vars = init_lm(lm_cfg, jax.random.PRNGKey(3))
    lm_vars = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        lm_vars,
    )
    adapter = TransformerLMAdapter(lm_model, lm_vars, lm_cfg, bos_id=0)

    lp_host = _make_ctc_like_logits(total_ds, cfg.n_classes)
    lp_collapsed = collapse_blank_frames(lp_host, threshold=0.99)
    n_collapsed = lp_collapsed.shape[0]
    emit = int((lp_collapsed.argmax(-1) != cfg.n_classes - 1).sum())
    print(f"bench: LM stream stats: {total_ds}→{n_collapsed} frames after "
          f"collapse, {emit} emitting frames "
          f"({100.0 * emit / max(n_collapsed, 1):.1f}%)", file=sys.stderr)

    def lm_decode(lp_np, phases=None):
        t0 = time.time()
        lp_c = collapse_blank_frames(lp_np, threshold=0.99)
        t1 = time.time()
        lp_dev = jnp.asarray(lp_c)
        lp_dev.block_until_ready()
        t2 = time.time()
        toks, lens, _ = beam_search_segmented(
            lp_dev, adapter, beam_width=20,
            alpha=0.45, beta=1.53, top_am_threshold=-6.0,
            prune_less_than_val=3.17,
        )
        out = np.asarray(toks[0])[: int(lens[0])]
        t3 = time.time()
        if phases is not None:
            phases.append((t1 - t0, t2 - t1, t3 - t2))
        return out

    t_warm = time.time()
    lm_decode(lp_host)
    print(f"bench: LM-decode warmup {time.time()-t_warm:.1f}s "
          f"(collapsed {total_ds}→{n_collapsed} frames)", file=sys.stderr)
    lm_elapsed, phases = float("inf"), []
    for _ in range(3):
        t0 = time.time()
        toks = lm_decode(lp_host, phases)
        lm_elapsed = min(lm_elapsed, time.time() - t0)
    for i, (c, u, d) in enumerate(phases):
        print(f"bench: LM rep {i}: collapse {c:.2f}s + upload {u:.2f}s + "
              f"device decode {d:.2f}s", file=sys.stderr)
    lm_rtfx = audio_seconds / lm_elapsed
    print(f"bench: LM beam-20 stitched decode {lm_elapsed:.2f}s → "
          f"RTFx {lm_rtfx:.1f} ({toks.size} tokens)", file=sys.stderr)
    extra.append({
        "metric": "earnings22_lm_beam20_decode_rtfx",
        "value": round(lm_rtfx, 2),
        "unit": "x_realtime",
        # no reference wall-clock exists; compare to the north-star
        # 10x-real-time bar (BASELINE.md)
        "vs_baseline": round(lm_rtfx / 10.0, 3),
    })

    # device-resident decode — the PRODUCT path (lm/loader.py
    # from_engine_output): the engine's stitched matrix is already a device
    # array, so collapse + segmented decode run on chip with no host numpy
    # pass and no re-upload.  This row is immune to the host-contention
    # failure mode the instrumented row above exposes.
    from dynamic_asr_eval_tpu.ops.beam_search import collapse_blank_frames_device

    lp_dev_full = jnp.asarray(lp_host)
    lp_dev_full.block_until_ready()

    def lm_decode_device():
        lp_c, nk = collapse_blank_frames_device(lp_dev_full, threshold=0.99)
        toks, lens, _ = beam_search_segmented(
            lp_c[: int(nk)], adapter, beam_width=20, alpha=0.45, beta=1.53,
            top_am_threshold=-6.0, prune_less_than_val=3.17)
        return np.asarray(toks[0])[: int(lens[0])]

    t_warm = time.time()
    lm_decode_device()
    print(f"bench: LM device-resident warmup {time.time()-t_warm:.1f}s",
          file=sys.stderr)
    dev_elapsed = float("inf")
    for _ in range(2):
        t0 = time.time()
        toks_d = lm_decode_device()
        dev_elapsed = min(dev_elapsed, time.time() - t0)
    dev_rtfx = audio_seconds / dev_elapsed
    print(f"bench: LM device-resident decode {dev_elapsed:.2f}s → "
          f"RTFx {dev_rtfx:.1f} ({toks_d.size} tokens)", file=sys.stderr)
    assert toks_d.size == toks.size, (toks_d.size, toks.size)
    extra.append({
        "metric": "earnings22_lm_beam20_device_resident_rtfx",
        "value": round(dev_rtfx, 2),
        "unit": "x_realtime",
        "vs_baseline": round(dev_rtfx / 10.0, 3),
    })

    # LM-decode MFU (VERDICT r4 ask #7): the decode's matmul work is the
    # incremental LM advance — once per EMITTING collapsed frame (the blank
    # fast path skips the LM), beam_width streams each (lazy permutation
    # reuses, never recomputes).  Analytic flops per advance from
    # perf.transformer_lm_step_flops; this row is LM-only by construction
    # (there is no AM in the decode program).
    from dynamic_asr_eval_tpu.perf import device_peak_flops, transformer_lm_step_flops

    kind = jax.devices()[0].device_kind
    peak = device_peak_flops(kind)
    if peak:
        lm_flops = emit * transformer_lm_step_flops(lm_cfg, batch=20)
        extra.append({
            "metric": "earnings22_lm_decode_mfu",
            "value": round(100.0 * lm_flops / dev_elapsed / peak, 2),
            "unit": "percent_of_bf16_peak",
            "vs_baseline": None,
        })

    # batched cross-recording decode (--decode_batch S): the vmapped streams
    # path — per-stream latency RISES (vmap executes all branches of the
    # blank fast path), and at realistic emission density (~50% after
    # collapse) the measured AGGREGATE also loses to single-stream
    # (PERF.md round-4 item 3) — this row keeps that honest in the artifact
    # (VERDICT r3 weak #6).
    S = int(os.environ.get("DAE_BENCH_LM_STREAMS", "4"))
    lp_s = jnp.asarray(np.stack([lp_collapsed] * S))
    lp_s.block_until_ready()

    def lm_decode_streams():
        toks, lens, _ = beam_search_streams(
            lp_s, adapter, beam_width=20,
            alpha=0.45, beta=1.53, top_am_threshold=-6.0,
            prune_less_than_val=3.17,
        )
        return np.asarray(toks[:, 0]), np.asarray(lens[:, 0])

    t_warm = time.time()
    lm_decode_streams()
    print(f"bench: LM batched-decode warmup {time.time()-t_warm:.1f}s "
          f"(S={S})", file=sys.stderr)
    bat_elapsed = float("inf")
    for _ in range(2):
        t0 = time.time()
        toks_s, lens_s = lm_decode_streams()
        bat_elapsed = min(bat_elapsed, time.time() - t0)
    bat_rtfx = S * audio_seconds / bat_elapsed
    print(f"bench: LM batched decode S={S}: {bat_elapsed:.2f}s → aggregate "
          f"RTFx {bat_rtfx:.1f} (per-stream {bat_rtfx / S:.1f}, "
          f"{int(lens_s[0])} tokens/stream)", file=sys.stderr)
    extra.append({
        "metric": "earnings22_lm_beam20_decode_batch4_aggregate_rtfx",
        "value": round(bat_rtfx, 2),
        "unit": "x_realtime",
        "vs_baseline": round(bat_rtfx / 10.0, 3),
    })


def _corpus_rows(extra):
    """Corpus-level north-star measurement (VERDICT r4 ask #2): a
    heterogeneous-duration synthetic corpus through the ACTUAL CLI driver
    (``evals/run.py``: adapt → stitched decode → normalize → WER → pickle),
    cold then warm, with the flagship model config.

    Default corpus: 6 recordings, 0.30/0.31/0.50/0.51/1.19/1.20 h (4.0 h
    total), chosen so the window counts land in THREE ``pad_num_chunks``
    buckets (48, 88, 208) with two recordings each — exercising bucket-
    executable reuse across different recording lengths (the round-5
    ``_plan`` shape-bucketing fix) plus the per-record host phases (spec
    build, upload, decode-to-host, normalize) that the single-recording rows
    exclude.

    One CLI invocation with ``-r 2``: the two repeats share the driver's
    engine (and therefore its traced executables), exactly like a long real
    corpus where dozens of recordings share each bucket's program.  Repeat 1
    is the cold pass (carries per-bucket trace + compile-cache load inside
    its per-record walls); repeat 2 is the steady state.  Warm RTFx divides
    audio by the repeat-2 per-record walls (WER aggregation + pickle dump,
    <1 s for 6 records, excluded); cold RTFx divides by everything else —
    process model build, compiles, and the full repeat-1 loop."""
    import dataclasses
    import pickle
    import tempfile

    import yaml

    from dynamic_asr_eval_tpu.evals import run as run_driver
    from __graft_entry__ import _flagship_config

    frames_env = os.environ.get(
        "DAE_BENCH_CORPUS_FRAMES",
        "108000,110000,180000,184000,428000,432000")
    frames = [int(x) for x in frames_env.split(",")]
    audio_s = sum(frames) / 100.0  # 10 ms hop
    os.environ["DAE_SYNTH_SPEC_FRAMES"] = frames_env
    seq = os.environ.get("DAE_BENCH_CORPUS_SEQ", "16384")
    overlap = os.environ.get("DAE_BENCH_CORPUS_OVERLAP", "14336")

    tmpdir = tempfile.mkdtemp(prefix="dae_corpus_")
    cfg_args = []
    if not int(os.environ.get("DAE_BENCH_CORPUS_SMALL_MODEL", "0")):
        cfg_dict = dataclasses.asdict(_flagship_config())
        cfg_dict.pop("compute_dtype", None)  # bf16 is the dataclass default
        cfg_path = os.path.join(tmpdir, "flagship.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump({"model": cfg_dict}, f)
        cfg_args = ["-config", cfg_path]

    argv = ["-d", "synthetic_spec", "--quiet", *cfg_args,
            "-r", "2",
            "-seq", seq, "-o", overlap,
            "-s", os.path.join(tmpdir, "corpus", "r.pkl"),
            "-kwargs", "epochs=1", "online=true", "shuffle=false",
            "optim_lr=9e-5", "spec_augment_n_freq_masks=6",
            "spec_augment_freq_mask_param=34"]

    # the driver prints per-repeat WER lines on stdout; bench's stdout must
    # stay a single JSON line, so route them to stderr
    import contextlib

    with contextlib.redirect_stdout(sys.stderr):
        t0 = time.time()
        run_driver.cli(list(argv))
        wall = time.time() - t0

    def _eng(repeat):
        with open(os.path.join(tmpdir, "corpus", f"r_{repeat}.pkl"), "rb") as f:
            return [float(x) for x in pickle.load(f)["elapsed_times"]]

    per_rec_1, per_rec_2 = _eng(1), _eng(2)
    warm = sum(per_rec_2)
    cold = wall - warm
    rtfx_warm = audio_s / warm
    rtfx_cold = audio_s / cold
    print(f"bench: corpus {len(frames)} recordings ({audio_s:.0f}s audio), "
          f"one -r 2 run {wall:.1f}s: cold (model build + compiles + repeat-1 "
          f"loop) {cold:.1f}s (RTFx {rtfx_cold:.1f}) / warm (repeat-2 record "
          f"walls) {warm:.1f}s (RTFx {rtfx_warm:.1f}); warm per-record "
          f"{[round(x, 2) for x in per_rec_2]}, cold repeat-1 per-record "
          f"{[round(x, 2) for x in per_rec_1]}", file=sys.stderr)
    extra.append({
        "metric": "earnings22_corpus_nsti_rtfx",
        "value": round(rtfx_warm, 2),
        "unit": "x_realtime",
        # the north star is corpus-level ≥10x real time (BASELINE.md)
        "vs_baseline": round(rtfx_warm / 10.0, 3),
    })
    extra.append({
        "metric": "earnings22_corpus_nsti_rtfx_cold",
        "value": round(rtfx_cold, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtfx_cold / 10.0, 3),
    })


def main():
    _backend_watchdog(float(os.environ.get("DAE_BACKEND_DEADLINE_S", "900")))
    import jax
    import jax.numpy as jnp

    # persistent compile cache: warmup cost is paid once per machine, and the
    # axon remote-compile path is both slow and noisy (75-330 s observed)
    cache_dir = os.environ.get(
        "JAX_COMPILE_CACHE", os.path.expanduser("~/.cache/dae_jax_cache"))
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
    fast = bool(int(os.environ.get("DAE_BENCH_FAST", "0")))  # primary metric only
    # LM-decode row only (skips NSTI/AWMC; for iterating on the decode path)
    lm_only = bool(int(os.environ.get("DAE_BENCH_LM_ONLY", "0")))
    # corpus rows only (skips everything else; for iterating on the corpus CLI path)
    corpus_only = bool(int(os.environ.get("DAE_BENCH_CORPUS_ONLY", "0")))

    if corpus_only:
        rows = []
        _corpus_rows(rows)
        out = dict(rows[0])
        out["extra_metrics"] = rows[1:]
        print(json.dumps(out))
        return

    from dynamic_asr_eval_tpu.config import SpecAugmentConfig, TTAConfig
    from dynamic_asr_eval_tpu.models import init_conformer
    from dynamic_asr_eval_tpu.ops.chunk import chunk_starts_and_lengths
    from dynamic_asr_eval_tpu.perf import device_peak_flops, training_step_flops
    from dynamic_asr_eval_tpu.tta import DynamicEvalEngine
    from dynamic_asr_eval_tpu.tta.awmc import AWMCEngine
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
    # bf16 spec upload: halves the 133 MB host→device transfer per run (the
    # model computes in bf16 regardless); measured |Δ| 0 beyond bf16 noise
    engine = DynamicEvalEngine(
        model, cfg.blank_id, cfg.subsampling_factor, tta,
        transfer_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )

    spec = np.random.default_rng(0).standard_normal((cfg.feat_in, spec_n)).astype(np.float32)
    n_real = len(chunk_starts_and_lengths(spec_n, seq_len, overlap)[0])

    if lm_only:
        ds = cfg.subsampling_factor
        total_ds = -(-spec_n // ds) + -(-seq_len // ds)
        rows = []
        _lm_rows(cfg, audio_seconds, total_ds, rows, jax, jnp)
        out = dict(rows[0])
        out["extra_metrics"] = rows[1:]
        print(json.dumps(out))
        return

    # ---- 1. NSTI online dynamic eval (primary) ----------------------------
    t_warm = time.time()
    out = engine(variables, spec, rng=jax.random.PRNGKey(1))
    ids = out.greedy_ids()
    print(f"bench: NSTI warmup (incl. compile) {time.time()-t_warm:.1f}s, "
          f"stitched {out.logits.shape}, {len(ids)} tokens", file=sys.stderr)

    # timed runs: adaptation + stitch + on-device greedy decode to host ids —
    # the full per-recording deliverable (stitched matrix stays on device).
    # min of 2 derates axon-tunnel jitter (the GPU baseline is local-machine).
    nsti_elapsed = float("inf")
    for rep in (2, 3):
        t0 = time.time()
        out = engine(variables, spec, rng=jax.random.PRNGKey(rep))
        ids = out.greedy_ids()
        nsti_elapsed = min(nsti_elapsed, time.time() - t0)
    assert bool(jnp.isfinite(out.logits).all()), "non-finite stitched logits"
    total_ds = int(out.logits.shape[0])

    nsti_rtfx = audio_seconds / nsti_elapsed
    baseline_nsti_rtfx = 43.4  # reference online NSTI, BASELINE.md row 1
    print(f"bench: NSTI adapt+stitch {nsti_elapsed:.2f}s for {audio_seconds}s "
          f"audio → RTFx {nsti_rtfx:.1f}", file=sys.stderr)

    # Decode-representativeness evidence: random-init output is blank-
    # collapsed (few tokens), but every decode-path op in these rows is
    # SHAPE-STATIC (masked argmax/collapse/CTC DPs over padded buffers), so
    # the timing cannot depend on token density.  Demonstrate by re-timing
    # the stitched greedy decode on shaped realistic-density posteriors
    # (~1 token per 4 frames) vs this run's real output.
    from dynamic_asr_eval_tpu.tta.runner import EngineOutput

    shaped_lp = _make_ctc_like_logits(int(out.logits.shape[0]), cfg.n_classes)
    shaped_out = EngineOutput(
        jnp.asarray(shaped_lp), jnp.ones((shaped_lp.shape[0],), jnp.float32),
        None, 0.0, cfg.blank_id,
    )
    # drain the 885 MB shaped-logits upload BEFORE timing (it is lazy and
    # would otherwise dominate the first decode's wall-clock)
    shaped_out.logits.block_until_ready()
    t0 = time.time()
    n_shaped = len(shaped_out.greedy_ids())
    t_shaped = time.time() - t0
    t0 = time.time()
    n_real_toks = len(out.greedy_ids())
    t_real = time.time() - t0
    print(f"bench: stitched greedy decode {t_real:.3f}s on real output "
          f"({n_real_toks} tokens) vs {t_shaped:.3f}s on shaped density "
          f"({n_shaped} tokens) — shape-static cost", file=sys.stderr)

    extra = []

    if on_tpu:
        # On-chip Pallas kernel health checks (these paths are off-default —
        # flagship uses attention_impl="xla" and subsampling_impl="conv" by
        # measured choice — so this is where a kernel regression would
        # otherwise hide; see PERF.md).
        try:
            from dynamic_asr_eval_tpu.kernels.attention import flash_attention

            rng = np.random.default_rng(0)
            q = jnp.asarray(rng.standard_normal((2, 1024, 6, 128)), jnp.bfloat16)
            mask = jnp.ones((2, 1024), bool)
            os.environ["DAE_STRICT_FLASH_ATTENTION"] = "1"
            try:
                fa = flash_attention(q, q, q, mask)
            finally:
                os.environ.pop("DAE_STRICT_FLASH_ATTENTION", None)
            from dynamic_asr_eval_tpu.kernels.attention import _xla_attention

            ref = _xla_attention(q, q, q, mask)
            err = float(jnp.max(jnp.abs(fa.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            assert err < 0.05, f"flash attention drift {err}"
            print(f"bench: pallas flash-attention on-chip check OK (|Δ|≤{err:.4f})",
                  file=sys.stderr)
        except Exception as exc:  # report, never block the benchmark
            print(f"bench: WARNING pallas flash-attention check FAILED: {exc}",
                  file=sys.stderr)

    # MFU estimate: analytic matmul FLOPs of the adaptation forwards+backwards
    # (batch = num_negatives aug + 1 clean per window) vs chip bf16 peak.
    kind = jax.devices()[0].device_kind
    flops_total = training_step_flops(cfg, seq_len, batch=1 + tta.num_negatives) * n_real
    peak = device_peak_flops(kind)
    achieved = flops_total / nsti_elapsed
    print(f"bench: NSTI ~{flops_total/1e12:.0f} TFLOP over {n_real} windows → "
          f"{achieved/1e12:.1f} TFLOP/s on {kind!r}", file=sys.stderr)
    if peak:
        extra.append({
            "metric": "earnings22_nsti_mfu",
            "value": round(100.0 * achieved / peak, 1),
            "unit": "percent_of_bf16_peak",
            "vs_baseline": None,  # reference publishes no GPU MFU
        })

    if not fast:
        # ---- 2. AWMC -------------------------------------------------------
        awmc = AWMCEngine(model, cfg.blank_id, cfg.subsampling_factor, tta,
                          transfer_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
        t_warm = time.time()
        awmc(variables, spec, rng=jax.random.PRNGKey(1)).logits.block_until_ready()
        print(f"bench: AWMC warmup {time.time()-t_warm:.1f}s", file=sys.stderr)
        awmc_elapsed = float("inf")
        for rep in (2, 3):
            t0 = time.time()
            awmc_out = awmc(variables, spec, rng=jax.random.PRNGKey(rep))
            awmc_ids = awmc_out.greedy_ids()
            awmc_elapsed = min(awmc_elapsed, time.time() - t0)
        assert bool(jnp.isfinite(awmc_out.logits).all())
        awmc_rtfx = audio_seconds / awmc_elapsed
        baseline_awmc_rtfx = 4159.9 / 403.6  # 10.31, BASELINE.md row 2
        print(f"bench: AWMC {awmc_elapsed:.2f}s → RTFx {awmc_rtfx:.1f} "
              f"({len(awmc_ids)} tokens)", file=sys.stderr)
        extra.append({
            "metric": "earnings22_awmc_rtfx",
            "value": round(awmc_rtfx, 2),
            "unit": "x_realtime",
            "vs_baseline": round(awmc_rtfx / baseline_awmc_rtfx, 3),
        })
        # AWMC MFU (VERDICT r4 ask #7): anchor+leader decodes, student
        # fwd+bwd, final clean forward per chunk (perf.awmc_step_flops)
        from dynamic_asr_eval_tpu.perf import awmc_step_flops

        kind = jax.devices()[0].device_kind
        peak = device_peak_flops(kind)
        if peak:
            awmc_flops = awmc_step_flops(cfg, seq_len, epochs=tta.epochs) * n_real
            extra.append({
                "metric": "earnings22_awmc_mfu",
                "value": round(100.0 * awmc_flops / awmc_elapsed / peak, 1),
                "unit": "percent_of_bf16_peak",
                "vs_baseline": None,
            })

        # ---- 3. LM-fused stitched beam decode ------------------------------
        _lm_rows(cfg, audio_seconds, total_ds, extra, jax, jnp)

        # ---- 4. corpus-level north star (real CLI, cold + warm) -----------
        if on_tpu and not int(os.environ.get("DAE_BENCH_NO_CORPUS", "0")):
            # never let a corpus-stage failure (tunnel hiccup, OOM, cut-off
            # signal) take down the rows already measured above
            try:
                _corpus_rows(extra)
            except BaseException as exc:  # noqa: BLE001
                print(f"bench: WARNING corpus rows FAILED: {exc!r}",
                      file=sys.stderr)

    result = {
        "metric": "earnings22_nsti_online_rtfx",
        "value": round(nsti_rtfx, 2),
        "unit": "x_realtime",
        "vs_baseline": round(nsti_rtfx / baseline_nsti_rtfx, 3),
        "extra_metrics": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
