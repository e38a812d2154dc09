"""Multi-device mesh tests on the 8 virtual CPU devices (conftest.py).

Covers the parallel/ package end-to-end: mesh construction, TP sharding rules
(divisibility fallback to replication), distributed WER accumulation, and a
full dp×tp×sp NSTI training step that must agree with the single-device step
(reference parity surface: SURVEY.md §2.3 — the reference is single-GPU, so
sharded-vs-unsharded agreement IS the correctness bar).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynamic_asr_eval_tpu.augment import apply_augmentation_pipeline
from dynamic_asr_eval_tpu.config import (
    CutoutConfig,
    FrameShuffleConfig,
    SpecAugmentConfig,
)
from dynamic_asr_eval_tpu.models import ConformerConfig, init_conformer
from dynamic_asr_eval_tpu.ops.ctc import ctc_loss, greedy_labels
from dynamic_asr_eval_tpu.optim import madgrad
from dynamic_asr_eval_tpu.parallel import (
    batch_sharding,
    conformer_param_sharding,
    make_mesh,
    psum_wer_counts,
    replicate,
    shard_params,
)


def _tiny_cfg(d_model=64, n_heads=2, ff_mult=4):
    return ConformerConfig(
        feat_in=16,
        n_layers=2,
        d_model=d_model,
        n_heads=n_heads,
        head_dim=32,
        vocab_size=64,
        subsampling_factor=4,
        subsampling_conv_channels=8,
        conv_kernel_size=5,
        compute_dtype=jnp.float32,
    )


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["dp"] == 8 and mesh.shape["tp"] == 1
    mesh = make_mesh(tp=2)
    assert mesh.shape["dp"] == 4 and mesh.shape["tp"] == 2
    mesh = make_mesh(n_devices=4, tp=4)
    assert mesh.shape["dp"] == 1 and mesh.shape["tp"] == 4
    with pytest.raises(ValueError):
        make_mesh(n_devices=6, tp=4)


def test_tp_sharding_rules_and_divisibility():
    mesh = make_mesh(tp=2)
    cfg = _tiny_cfg()
    _, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=64)
    shardings = conformer_param_sharding(variables["params"], mesh)

    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    sharded_paths = [
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, s in flat
        if s.spec != P()
    ]
    # FF + attention + conv pointwise kernels must actually be TP-sharded
    assert any("ff1" in p for p in sharded_paths), sharded_paths
    assert any("qkv" in p for p in sharded_paths)
    assert any("pw1" in p for p in sharded_paths)
    # biases / norms stay replicated
    assert not any("scale" in p for p in sharded_paths)

    # placing params must succeed and preserve values
    placed, _ = shard_params(variables["params"], mesh)
    orig = jax.tree.leaves(variables["params"])
    new = jax.tree.leaves(placed)
    for a, b in zip(orig, new):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tp_indivisible_falls_back_to_replication():
    # tp=8 does not divide the tiny model's head count (2 heads × 32 = 64
    # divides, but d_ff etc. may not) — the rule must never produce an
    # invalid sharding; everything indivisible is replicated
    mesh = Mesh(np.asarray(jax.devices()).reshape(1, 8), ("dp", "tp"))
    cfg = _tiny_cfg()
    _, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=64)
    placed, shardings = shard_params(variables["params"], mesh)
    for leaf, s in zip(jax.tree.leaves(placed), jax.tree.leaves(shardings)):
        for dim, name in zip(leaf.shape, s.spec + (None,) * leaf.ndim):
            if name is not None:
                assert dim % mesh.shape[name] == 0


def test_psum_wer_counts():
    mesh = make_mesh()  # dp=8

    from jax import shard_map

    counts = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)

    f = shard_map(
        lambda c: psum_wer_counts(c, "dp"),
        mesh=mesh,
        in_specs=P("dp", None),
        out_specs=P("dp", None),
    )
    out = np.asarray(f(counts))
    expect = counts.sum(axis=0)
    for row in out:
        np.testing.assert_allclose(row, expect)


def _nsti_step_fn(model, optimizer, blank, max_tokens, sa, fs, co):
    def train_step(params, opt_state, windows, lengths, key):
        B = windows.shape[0]
        aug = apply_augmentation_pipeline(windows, key, sa, fs, co, 0.0)
        batch = jnp.concatenate([aug, windows], axis=0)
        lens2 = jnp.concatenate([lengths, lengths])

        def loss_fn(p):
            out = model.apply({"params": p}, batch, length=lens2)
            lp = out["final_posteriors"]
            ds_len = out["length"]
            clean_lp = jax.lax.stop_gradient(lp[B:])
            labels, lab_lens = jax.vmap(
                lambda l, n: greedy_labels(l, n, blank, max_tokens)
            )(clean_lp, ds_len[B:])
            loss = ctc_loss(lp[:B], ds_len[:B], labels, lab_lens, blank_id=blank)
            return loss / (B * lp.shape[1])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


@pytest.mark.slow
def test_dp_tp_sp_step_matches_single_device():
    """One NSTI update on a dp=2×tp=2×sp=2 mesh must (a) run, (b) produce a
    finite loss, (c) move the parameters, and (d) agree with the identical
    step executed unsharded on one device."""
    devices = jax.devices()
    mesh = Mesh(np.asarray(devices).reshape(2, 2, 2), ("dp", "tp", "sp"))

    cfg = _tiny_cfg()
    W = 128
    model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=W)
    params = variables["params"]
    opt = madgrad(1e-3)

    sa = SpecAugmentConfig(n_freq_masks=1, freq_mask_param=2)
    fs = FrameShuffleConfig()
    co = CutoutConfig(seq_len=W, num_rectangles=0)
    step = _nsti_step_fn(model, opt, cfg.blank_id, 8, sa, fs, co)

    B = 4
    windows = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, cfg.feat_in, W)), jnp.float32
    )
    lengths = jnp.full((B,), W, jnp.int32)
    key = jax.random.PRNGKey(2)

    # single-device reference
    ref_params, _, ref_loss = jax.jit(step)(params, opt.init(params), windows, lengths, key)

    # sharded
    sh_params, param_shardings = shard_params(params, mesh)
    opt_state = opt.init(sh_params)
    jitted = jax.jit(
        step,
        in_shardings=(
            param_shardings,
            None,
            NamedSharding(mesh, P("dp", None, "sp")),
            NamedSharding(mesh, P("dp")),
            NamedSharding(mesh, P()),
        ),
        out_shardings=(param_shardings, None, NamedSharding(mesh, P())),
    )
    with mesh:
        new_params, _, loss = jitted(sh_params, opt_state, windows, lengths, key)
    loss = float(loss)
    assert np.isfinite(loss)
    np.testing.assert_allclose(loss, float(ref_loss), rtol=2e-4, atol=2e-5)

    deltas = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), params, new_params
    )
    assert max(jax.tree.leaves(deltas)) > 0, "sharded step did not update params"

    agree = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), ref_params, new_params
    )
    assert max(jax.tree.leaves(agree)) < 1e-3, (
        "sharded step diverged from the single-device step"
    )


@pytest.mark.slow
def test_seq_shard_reduces_per_device_activation_memory():
    """Real sequence parallelism, not placement: an sp-sharded window with
    seq_shard_axes set must (a) cut the compiled per-device temp allocation
    (dominated by the [B, H, T, T] scores) by ~1/sp vs the replicated
    program, (b) all-gather only K/V-sized buffers — never a score-sized
    one, and (c) match single-device numerics."""
    import dataclasses
    import re

    devices = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devices, ("dp", "sp"))
    T = 1024  # T_ds = 256 → scores dominate the temps
    base = _tiny_cfg(d_model=32)
    base = dataclasses.replace(base, n_heads=2, head_dim=16)
    model, variables = init_conformer(base, jax.random.PRNGKey(0), example_T=T)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, base.feat_in, T)), jnp.float32
    )
    repl = NamedSharding(mesh, P())
    T_ds = T // base.subsampling_factor

    def build(cfg, in_spec):
        from dynamic_asr_eval_tpu.models.conformer import SCConformer

        m = SCConformer(cfg)

        def fwd(v, x):
            return m.apply(v, x)["final_posteriors"]

        with mesh:
            compiled = (
                jax.jit(fwd, in_shardings=(repl, NamedSharding(mesh, in_spec)),
                        out_shardings=repl)
                .lower(variables, x)
                .compile()
            )
            out = compiled(variables, x)
        return compiled, np.asarray(out)

    sp_cfg = dataclasses.replace(base, seq_shard_axes=("dp", "sp"))
    c_repl, o_repl = build(base, P())
    c_sp, o_sp = build(sp_cfg, P("dp", None, "sp"))

    t_repl = c_repl.memory_analysis().temp_size_in_bytes
    t_sp = c_sp.memory_analysis().temp_size_in_bytes
    # sp=4 over the time axis: per-device temps must drop well below half
    assert t_sp < 0.5 * t_repl, (t_sp, t_repl)

    # every all-gather must be K/V-sized (≤ T_ds·d·B elements) — a gathered
    # score matrix (B·H·T_ds²) would mean sp degenerated to placement
    score_elems = 2 * base.n_heads * T_ds * T_ds
    for line in c_sp.as_text().splitlines():
        if "all-gather" in line and "=" in line:
            for shape in re.findall(r"f32\[([\d,]+)\]", line):
                elems = int(np.prod([int(s) for s in shape.split(",")]))
                assert elems < score_elems // 2, (line[:120], elems)

    # numerics: sp program == replicated program == single-device apply
    assert np.abs(o_repl - o_sp).max() < 1e-4
    from dynamic_asr_eval_tpu.models.conformer import SCConformer

    single = np.asarray(SCConformer(base).apply(variables, x)["final_posteriors"])
    assert np.abs(o_sp - single).max() < 1e-4


def test_batch_sharding_and_replicate_roundtrip():
    mesh = make_mesh()
    x = jnp.arange(16.0).reshape(8, 2)
    placed = jax.device_put(x, batch_sharding(mesh))
    np.testing.assert_array_equal(np.asarray(placed), np.asarray(x))
    tree = {"a": jnp.ones((3,)), "b": jnp.zeros((2, 2))}
    rep = replicate(tree, mesh)
    np.testing.assert_array_equal(np.asarray(rep["a"]), np.ones((3,)))


@pytest.mark.slow
def test_dp_infer_matches_single_device():
    """DynamicEvalEngine(mesh=...) shards the no-grad window batch over dp;
    stitched output must match the unsharded engine bit-for-bit (same fp32
    math, GSPMD only changes placement)."""
    from dynamic_asr_eval_tpu.config import TTAConfig
    from dynamic_asr_eval_tpu.tta import DynamicEvalEngine

    cfg = _tiny_cfg()
    model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=256)
    tta = TTAConfig(seq_len=256, overlap=192, epochs=0, online=False, shuffle=False)

    spec = np.random.default_rng(3).standard_normal((cfg.feat_in, 2000)).astype(np.float32)

    plain = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor, tta)
    out_plain = plain(variables, spec)

    mesh = make_mesh()  # ('dp','tp') = (8,1)
    dp = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor, tta, mesh=mesh)
    out_dp = dp(variables, spec)

    np.testing.assert_allclose(
        np.asarray(out_dp.logits), np.asarray(out_plain.logits), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(out_dp.counts), np.asarray(out_plain.counts))


@pytest.mark.slow
def test_dp_infer_batch_rounds_to_mesh():
    from dynamic_asr_eval_tpu.config import TTAConfig
    from dynamic_asr_eval_tpu.tta import DynamicEvalEngine

    cfg = _tiny_cfg()
    model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=256)
    tta = TTAConfig(seq_len=256, overlap=128, epochs=0, online=False, shuffle=False)
    mesh = make_mesh()
    eng = DynamicEvalEngine(
        model, cfg.blank_id, cfg.subsampling_factor, tta, infer_batch=3, mesh=mesh
    )
    spec = np.random.default_rng(4).standard_normal((cfg.feat_in, 1500)).astype(np.float32)
    out = eng(variables, spec)  # b=3 must round up to 8 without breaking stitch
    assert np.isfinite(np.asarray(out.logits)).all()


@pytest.mark.slow
def test_dp_records_batched_matches_serial():
    """Records-level data parallelism (SURVEY §2.3 row 1, ``--dp_records``):
    R recordings adapted SIMULTANEOUSLY in one vmapped+dp-sharded device
    program must reproduce the serial per-recording adaptation — same
    per-record RNG keys, same window plans, same stitched posteriors —
    including ragged record lengths (shorter records ride padded window
    plans inside the batch)."""
    from dynamic_asr_eval_tpu.config import TTAConfig
    from dynamic_asr_eval_tpu.tta import DynamicEvalEngine

    cfg = _tiny_cfg()
    model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=128)
    tta = TTAConfig(
        seq_len=128, overlap=64, epochs=1, online=True, shuffle=False,
        lm_tta_beams=0,
    )

    rng = np.random.default_rng(7)
    # ragged (2 distinct lengths — each extra distinct length is a whole
    # extra XLA compile of the serial adapt scan on this 1-CPU box)
    lengths = [320, 256, 320, 256]
    specs = [rng.standard_normal((cfg.feat_in, T)).astype(np.float32)
             for T in lengths]
    base = jax.random.PRNGKey(11)
    keys = [jax.random.fold_in(base, i) for i in range(len(specs))]

    serial = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor, tta)
    ref = [serial(variables, s, rng=k, shuffle_rng=np.random.default_rng(0))
           for s, k in zip(specs, keys)]

    mesh = make_mesh(n_devices=4)  # dp=4: one record per virtual device
    eng = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor, tta,
                            mesh=mesh)
    outs = eng.batched(variables, specs, rngs=keys,
                       shuffle_rng=np.random.default_rng(0))

    assert len(outs) == len(ref)
    for r, (o, e) in enumerate(zip(outs, ref)):
        n = int(np.sum(np.asarray(e.counts) > 0))
        np.testing.assert_array_equal(
            np.asarray(o.counts)[:n], np.asarray(e.counts)[:n],
            err_msg=f"record {r} coverage counts diverged",
        )
        assert not np.any(np.asarray(o.counts)[n:] > 0)
        np.testing.assert_allclose(
            np.asarray(o.logits)[:n], np.asarray(e.logits)[:n],
            rtol=5e-4, atol=5e-4,
            err_msg=f"record {r} stitched posteriors diverged",
        )
        np.testing.assert_array_equal(o.greedy_ids(), e.greedy_ids())


@pytest.mark.slow
def test_dp_records_shuffle_multi_epoch_matches_serial():
    """shuffle=True with epochs>1 under records batching must reproduce the
    serial loop (ADVICE r4 #1): the serial loop consumes shuffle_rng
    RECORD-major (all of record i's epoch permutations before record i+1),
    so batched() pre-draws in that order.  Offline mode (the only mode the
    reference allows shuffle+epochs>1 in, lcasr/lib.py:516-517)."""
    from dynamic_asr_eval_tpu.config import TTAConfig
    from dynamic_asr_eval_tpu.tta import DynamicEvalEngine

    cfg = _tiny_cfg()
    model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=128)
    tta = TTAConfig(seq_len=128, overlap=64, epochs=2, online=False,
                    shuffle=True, lm_tta_beams=0)

    rng = np.random.default_rng(9)
    specs = [rng.standard_normal((cfg.feat_in, 320)).astype(np.float32)
             for _ in range(2)]
    keys = [jax.random.fold_in(jax.random.PRNGKey(13), i) for i in range(2)]

    serial = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor, tta)
    sr = np.random.default_rng(5)
    ref = [serial(variables, s, rng=k, shuffle_rng=sr)
           for s, k in zip(specs, keys)]

    eng = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor, tta)
    outs = eng.batched(variables, specs, rngs=keys,
                       shuffle_rng=np.random.default_rng(5))
    for r, (o, e) in enumerate(zip(outs, ref)):
        n = int(np.sum(np.asarray(e.counts) > 0))
        np.testing.assert_allclose(
            np.asarray(o.logits)[:n], np.asarray(e.logits)[:n],
            rtol=5e-4, atol=5e-4,
            err_msg=f"record {r}: shuffle+epochs=2 batched != serial")


@pytest.mark.slow
def test_dp_records_single_window_group_matches_serial():
    """A group where every record fits one window must not trip the
    overlap-multiple-of-ds check (ADVICE r4 #3): serial _plan zeroes the
    overlap for single-window recordings, and batched() now mirrors that.
    overlap=66 is NOT a multiple of ds=4 — only the zeroing makes either
    path legal."""
    from dynamic_asr_eval_tpu.config import TTAConfig
    from dynamic_asr_eval_tpu.tta import DynamicEvalEngine

    cfg = _tiny_cfg()
    model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=128)
    tta = TTAConfig(seq_len=128, overlap=66, epochs=1, online=True,
                    shuffle=False, lm_tta_beams=0)

    rng = np.random.default_rng(11)
    specs = [rng.standard_normal((cfg.feat_in, 96)).astype(np.float32)
             for _ in range(2)]
    keys = [jax.random.fold_in(jax.random.PRNGKey(17), i) for i in range(2)]

    serial = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor, tta)
    ref = [serial(variables, s, rng=k) for s, k in zip(specs, keys)]
    eng = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor, tta)
    outs = eng.batched(variables, specs, rngs=keys)
    for o, e in zip(outs, ref):
        n = int(np.sum(np.asarray(e.counts) > 0))
        np.testing.assert_allclose(
            np.asarray(o.logits)[:n], np.asarray(e.logits)[:n],
            rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_dp_records_per_device_memory_matches_single_record():
    """The shard_map claim at tta/runner.py (records-DP "keeps the per-device
    executable identical to the proven no-mesh program") as a compiled-memory
    assertion (VERDICT r4 ask #5): the R=dp records program over a dp mesh
    must cost per-device what the single-record program costs on one device —
    temps AND argument bytes — because each device runs exactly one record's
    scan with zero collectives."""
    from dynamic_asr_eval_tpu.config import TTAConfig
    from dynamic_asr_eval_tpu.ops.chunk import chunk_starts_and_lengths, pad_num_chunks
    from dynamic_asr_eval_tpu.tta import DynamicEvalEngine

    cfg = _tiny_cfg()
    model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=128)
    tta = TTAConfig(seq_len=128, overlap=64, epochs=1, online=True,
                    shuffle=False, lm_tta_beams=0)
    W, overlap, T = 128, 64, 320
    ds = cfg.subsampling_factor
    starts, lens = chunk_starts_and_lengths(T, W, overlap)
    N = pad_num_chunks(len(starts))
    total_ds = -(-T // ds) + -(-W // ds)
    T_pad = int(max(max(starts) + W, T))

    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    starts_np = np.zeros((N,), np.int32)
    lens_np = np.zeros((N,), np.int32)
    starts_np[: len(starts)] = starts
    lens_np[: len(lens)] = lens
    order = np.arange(N, dtype=np.int32)

    # -- single-record, single-device (the proven no-mesh program) ----------
    single = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor, tta)
    single.optimizer_wrapped = single._wrap_optimizer(params)
    opt1 = single._build_opt_init()(params)
    args1 = (params, opt1, extra, jnp.zeros((cfg.feat_in, T_pad), jnp.float32),
             jnp.asarray(starts_np), jnp.asarray(lens_np),
             jnp.asarray(starts_np // ds), jnp.asarray(order),
             jax.random.PRNGKey(0))
    c1 = single._build_adapt(W, N, total_ds, True).lower(*args1).compile()
    m1 = c1.memory_analysis()

    # -- R=4 records over dp=4 (one record per device) -----------------------
    R = 4
    mesh = make_mesh(n_devices=R)
    eng = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor, tta,
                            mesh=mesh)
    eng.optimizer_wrapped = eng._wrap_optimizer(params)

    def dp_put(a):
        a = jnp.asarray(a)
        return jax.device_put(
            a, NamedSharding(mesh, P(*(("dp",) + (None,) * (a.ndim - 1)))))

    params_b = jax.tree.map(
        lambda a: dp_put(jnp.broadcast_to(a[None], (R,) + a.shape)), params)
    opt_b = eng._build_opt_init_batched()(params_b)
    args_b = (params_b, opt_b, extra,
              dp_put(jnp.zeros((R, cfg.feat_in, T_pad), jnp.float32)),
              dp_put(np.tile(starts_np, (R, 1))),
              dp_put(np.tile(lens_np, (R, 1))),
              dp_put(np.tile(starts_np // ds, (R, 1))),
              dp_put(np.tile(order, (R, 1))),
              dp_put(jax.random.split(jax.random.PRNGKey(0), R)))
    cb = eng._build_adapt_batched(W, N, total_ds, True).lower(*args_b).compile()
    mb = cb.memory_analysis()

    # Per-device argument bytes ≈ the single-device program's (each device
    # holds exactly 1 record's params/opt/spec slice + the replicated
    # extra_vars).  memory_analysis() reports per-device sizes here (probed:
    # it equals the sum of device-0 addressable-shard bytes to within
    # alignment).  This assertion caught a real bug: the vmapped opt-init
    # used to come back REPLICATED from XLA ((R-1)x wasted state per device)
    # until _build_opt_init_batched pinned its output sharding to dp.
    assert mb.argument_size_in_bytes <= 1.25 * m1.argument_size_in_bytes + (1 << 16), (
        mb.argument_size_in_bytes, m1.argument_size_in_bytes)
    # Per-device temps = single-device temps + at most one extra params-copy
    # (materialized at the shard_map region boundary; probed R-invariant —
    # identical bytes at dp=2 and dp=4, i.e. cost per device does not grow
    # with R, which is the claim).
    params_bytes = sum(x.nbytes for x in jax.tree.leaves(params))
    assert mb.temp_size_in_bytes <= m1.temp_size_in_bytes + params_bytes + (1 << 17), (
        mb.temp_size_in_bytes, m1.temp_size_in_bytes, params_bytes)

    # and zero cross-device traffic: no collectives anywhere in the program
    txt = cb.as_text()
    for coll in ("all-reduce", "all-gather", "reduce-scatter",
                 "collective-permute", "all-to-all"):
        assert coll not in txt, f"records-DP program contains a {coll}"


def test_reduce_wer_counts_matches_host_sum():
    from dynamic_asr_eval_tpu.parallel import reduce_wer_counts

    mesh = make_mesh()
    counts = np.arange(24, dtype=np.int64).reshape(6, 4)  # 6 records, dp=8 pads
    tot = reduce_wer_counts(counts, mesh)
    np.testing.assert_array_equal(np.asarray(tot), counts.sum(axis=0))


@pytest.mark.slow
def test_engine_adapt_under_dp_tp_mesh_matches_single_device():
    """The DynamicEvalEngine's OWN adapt scan (not a hand-rolled step) run
    with a dp×tp mesh and tp-sharded parameters must match the single-device
    engine within fp32 tolerance (VERDICT r3 ask #7 — the --dp --tp 2 driver
    path's engine seam)."""
    from dynamic_asr_eval_tpu.config import TTAConfig
    from dynamic_asr_eval_tpu.tta import DynamicEvalEngine

    cfg = _tiny_cfg()
    model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=128)
    tta = TTAConfig(seq_len=128, overlap=64, epochs=1, online=True,
                    shuffle=False, lm_tta_beams=0)
    spec = np.random.default_rng(5).standard_normal((cfg.feat_in, 320)).astype(np.float32)
    key = jax.random.PRNGKey(3)

    plain = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor, tta)
    ref = plain(variables, spec, rng=key, shuffle_rng=np.random.default_rng(0))

    mesh = make_mesh(tp=2)  # dp=4 × tp=2
    eng = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor, tta,
                            mesh=mesh)
    placed, _ = shard_params(variables["params"], mesh)
    out = eng({**variables, "params": placed}, spec, rng=key,
              shuffle_rng=np.random.default_rng(0))

    np.testing.assert_array_equal(np.asarray(out.counts), np.asarray(ref.counts))
    np.testing.assert_allclose(
        np.asarray(out.logits), np.asarray(ref.logits), rtol=5e-4, atol=5e-4)
