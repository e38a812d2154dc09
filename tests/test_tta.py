import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_asr_eval_tpu.config import SpecAugmentConfig, TTAConfig
from dynamic_asr_eval_tpu.models import ConformerConfig, init_conformer
from dynamic_asr_eval_tpu.ops.chunk import chunk_spectrogram
from dynamic_asr_eval_tpu.ops.stitch import stitch_chunk_probs, trim_stitched
from dynamic_asr_eval_tpu.tta import AWMCEngine, DynamicEvalEngine


CFG = ConformerConfig(
    feat_in=16,
    n_layers=2,
    d_model=32,
    n_heads=2,
    head_dim=16,
    vocab_size=28,
    subsampling_factor=4,
    subsampling_conv_channels=8,
    conv_kernel_size=5,
    compute_dtype=jnp.float32,
)

SEQ, OVER = 64, 32  # tiny windows


@pytest.fixture(scope="module")
def model_and_vars():
    return init_conformer(CFG, jax.random.PRNGKey(0), example_T=SEQ)


def make_spec(T=200, seed=0):
    return np.random.default_rng(seed).standard_normal((16, T)).astype(np.float32)


def tta_cfg(**kw):
    base = dict(seq_len=SEQ, overlap=OVER, epochs=1, shuffle=False,
                spec_augment=SpecAugmentConfig(n_freq_masks=2, freq_mask_param=4),
                optim_args={"lr": 1e-4})
    base.update(kw)
    return TTAConfig(**base)


class TestInferencePath:
    def test_epochs0_matches_manual_stitch(self, model_and_vars):
        """epochs=0 turns the engine into pure windowed inference
        (the reference reuse trick, run_in_dataset_eval.py:96-99)."""
        model, variables = model_and_vars
        spec = make_spec(200)
        engine = DynamicEvalEngine(model, CFG.blank_id, CFG.subsampling_factor, tta_cfg(epochs=0))
        out = engine(variables, spec)

        # manual: forward each window, stitch
        windows, lengths, starts, n_real = chunk_spectrogram(spec, SEQ, OVER)
        lps, ds_lens = [], []
        for i in range(windows.shape[0]):
            o = model.apply(variables, jnp.asarray(windows[i][None]), length=jnp.asarray([lengths[i]]))
            lps.append(o["final_posteriors"][0])
            ds_lens.append(int(np.ceil(lengths[i] / CFG.subsampling_factor)) if lengths[i] else 0)
        probs = jnp.exp(jnp.stack(lps))
        total_ds = -(-200 // 4) + SEQ // 4
        log_avg, counts = stitch_chunk_probs(
            probs, jnp.asarray(ds_lens), jnp.asarray(starts // 4), total_ds
        )
        manual = trim_stitched(log_avg, counts)
        logits = out.numpy_logits()
        assert logits.shape == manual.shape
        np.testing.assert_allclose(logits, manual, rtol=1e-4, atol=1e-5)

    def test_short_spec_single_window(self, model_and_vars):
        model, variables = model_and_vars
        spec = make_spec(40)  # shorter than seq_len
        engine = DynamicEvalEngine(model, CFG.blank_id, CFG.subsampling_factor, tta_cfg(epochs=0))
        out = engine(variables, spec)
        logits = out.numpy_logits()
        assert logits.shape == (10, CFG.n_classes)
        direct = model.apply(variables, jnp.asarray(spec[None]))["final_posteriors"][0]
        np.testing.assert_allclose(logits, np.asarray(direct), rtol=1e-4, atol=1e-5)


class TestAdaptation:
    def test_adapt_changes_params_and_returns_finite(self, model_and_vars):
        model, variables = model_and_vars
        spec = make_spec(200)
        engine = DynamicEvalEngine(model, CFG.blank_id, CFG.subsampling_factor, tta_cfg(epochs=1))
        out = engine(variables, spec, return_params=True)
        assert np.isfinite(out.numpy_logits()).all()
        # params adapted
        diffs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), variables["params"], out.params
        )
        assert max(jax.tree.leaves(diffs)) > 0
        # originals untouched (restore-invariance is structural in JAX)
        assert out.numpy_logits().shape[1] == CFG.n_classes

    @pytest.mark.slow
    def test_determinism(self, model_and_vars):
        model, variables = model_and_vars
        spec = make_spec(200)
        engine = DynamicEvalEngine(model, CFG.blank_id, CFG.subsampling_factor, tta_cfg(epochs=1))
        o1 = engine(variables, spec, rng=jax.random.PRNGKey(7), shuffle_rng=np.random.default_rng(1))
        o2 = engine(variables, spec, rng=jax.random.PRNGKey(7), shuffle_rng=np.random.default_rng(1))
        np.testing.assert_array_equal(o1.numpy_logits(), o2.numpy_logits())

    @pytest.mark.slow
    def test_online_mode(self, model_and_vars):
        model, variables = model_and_vars
        spec = make_spec(200)
        engine = DynamicEvalEngine(
            model, CFG.blank_id, CFG.subsampling_factor, tta_cfg(online=True, shuffle=False)
        )
        out = engine(variables, spec)
        assert np.isfinite(out.numpy_logits()).all()

    @pytest.mark.slow
    def test_shuffle_mode(self, model_and_vars):
        model, variables = model_and_vars
        spec = make_spec(300)
        engine = DynamicEvalEngine(model, CFG.blank_id, CFG.subsampling_factor, tta_cfg(shuffle=True))
        out = engine(variables, spec)
        assert np.isfinite(out.numpy_logits()).all()

    @pytest.mark.slow
    def test_epochs2(self, model_and_vars):
        model, variables = model_and_vars
        spec = make_spec(150)
        engine = DynamicEvalEngine(model, CFG.blank_id, CFG.subsampling_factor, tta_cfg(epochs=2))
        out = engine(variables, spec)
        assert np.isfinite(out.numpy_logits()).all()

    @pytest.mark.slow
    def test_bitfit_only_touches_biases(self, model_and_vars):
        model, variables = model_and_vars
        spec = make_spec(150)
        engine = DynamicEvalEngine(
            model, CFG.blank_id, CFG.subsampling_factor,
            tta_cfg(bitfit=True, optim_args={"lr": 1e-3}),
        )
        out = engine(variables, spec, return_params=True)

        def check(path, a, b):
            name = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
            changed = float(jnp.abs(a - b).max()) > 0
            if name != "bias":
                assert not changed, f"non-bias param changed: {path}"

        jax.tree_util.tree_map_with_path(check, variables["params"], out.params)


class TestAWMC:
    @pytest.mark.slow
    def test_awmc_runs(self, model_and_vars):
        model, variables = model_and_vars
        spec = make_spec(200)
        cfg = tta_cfg(epochs=1, ema_decay=0.99)
        engine = AWMCEngine(model, CFG.blank_id, CFG.subsampling_factor, cfg)
        out = engine(variables, spec, return_params=True)
        assert np.isfinite(out.numpy_logits()).all()
        diffs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), variables["params"], out.params
        )
        assert max(jax.tree.leaves(diffs)) > 0

    def test_awmc_short_spec(self, model_and_vars):
        model, variables = model_and_vars
        spec = make_spec(40)
        engine = AWMCEngine(model, CFG.blank_id, CFG.subsampling_factor, tta_cfg())
        out = engine(variables, spec)
        assert out.numpy_logits().shape == (10, CFG.n_classes)


@pytest.mark.slow
class TestConsistency:
    def test_consistency_runs_and_adapts(self, model_and_vars):
        from dynamic_asr_eval_tpu.tta import ConsistencyEngine

        model, variables = model_and_vars
        spec = make_spec(200)
        engine = ConsistencyEngine(
            model, CFG.blank_id, CFG.subsampling_factor, tta_cfg(epochs=1)
        )
        out = engine(variables, spec, return_params=True)
        assert np.isfinite(out.numpy_logits()).all()
        # per-chunk stacked params: leading chunk axis, chunks diverge from init
        leaf = jax.tree.leaves(out.params)[0]
        n_chunks = leaf.shape[0]
        assert n_chunks >= 4
        p0 = jax.tree.map(lambda s: s[0], out.params)
        delta = max(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), variables["params"], p0)))
        assert delta > 0

    def test_sequential_mix_matrix_matches_reference_loop(self):
        """The one-matmul mixing operator must equal the reference's
        sequential in-place loop (lcasr/lib.py:817-848): walk chunks in
        ascending order, overwrite each gradient with the decay mix before
        later chunks read it."""
        from dynamic_asr_eval_tpu.tta.consistency import sequential_mix_matrix

        rng = np.random.default_rng(0)
        N, P, decay = 7, 5, 0.95
        n_real = 5
        grads = rng.standard_normal((N, P)).astype(np.float32)
        grads[n_real:] = 0.0
        mask = (np.arange(N) < n_real).astype(np.float32)

        # brute-force reference loop (fp64 intermediates like the reference)
        g = grads.astype(np.float64).copy()
        for i in range(n_real):
            cur, total = g[i].copy(), 1.0
            for q in range(n_real):
                if q == i:
                    continue
                d = decay ** abs(i - q)
                total += d
                cur += d * g[q]
            g[i] = cur / total

        L = np.asarray(sequential_mix_matrix(jnp.asarray(mask), decay))
        mixed = L @ grads
        np.testing.assert_allclose(mixed[:n_real], g[:n_real], rtol=1e-5)
        np.testing.assert_allclose(mixed[n_real:], 0.0)

    def test_consistency_online(self, model_and_vars):
        from dynamic_asr_eval_tpu.tta import ConsistencyEngine

        model, variables = model_and_vars
        spec = make_spec(150)
        engine = ConsistencyEngine(
            model, CFG.blank_id, CFG.subsampling_factor, tta_cfg(epochs=1, online=True)
        )
        out = engine(variables, spec)
        assert np.isfinite(out.numpy_logits()).all()


class TestEntropyAugmentation:
    @pytest.mark.slow
    def test_entropy_augmentation_runs(self, model_and_vars):
        model, variables = model_and_vars
        spec = make_spec(150)
        engine = DynamicEvalEngine(
            model, CFG.blank_id, CFG.subsampling_factor,
            tta_cfg(entropy_augmentation=True),
        )
        out = engine(variables, spec)
        assert np.isfinite(out.numpy_logits()).all()


class _BiasedLMAdapter:
    """Test LM: constant distribution strongly favoring one token."""

    def __init__(self, vocab_size: int, favored: int):
        self.V = vocab_size
        self.favored = favored

    def _lps(self, B):
        lps = jnp.full((B, self.V), -8.0)
        return lps.at[:, self.favored].set(-0.01)

    def init_state(self, batch: int):
        return (), self._lps(batch)

    def advance(self, state, tokens, mask):
        return state, self._lps(tokens.shape[0])

    def gather(self, state, idx):
        return state


class TestLMTTABeams:
    """lm_tta_beams: LM-fused pseudo-labels inside the NSTI engine
    (lcasr/lib.py:515,558-563)."""

    def _ambiguous_lp(self, T=12, V=CFG.n_classes):
        # frames where token 2 narrowly beats token 3 acoustically; an LM
        # favoring 3 must flip the beam pseudo-label away from greedy
        lp = np.full((T, V), -12.0, np.float32)
        blank = CFG.blank_id
        lp[:, blank] = -3.0
        lp[4] = -12.0
        lp[4, 2] = -0.35
        lp[4, 3] = -0.50
        lp[4, blank] = -4.0
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        return jnp.asarray(lp)

    def test_beam_pseudo_labels_differ_from_greedy(self, model_and_vars):
        model, _ = model_and_vars
        adapter = _BiasedLMAdapter(CFG.n_classes, favored=3)
        engine = DynamicEvalEngine(
            model, CFG.blank_id, CFG.subsampling_factor,
            tta_cfg(lm_tta_beams=3),
            lm_adapter=adapter,
            lm_beam_kwargs={"alpha": 2.0, "beta": 0.0,
                            "top_am_threshold": -20.0},
        )
        greedy_engine = DynamicEvalEngine(
            model, CFG.blank_id, CFG.subsampling_factor, tta_cfg()
        )
        lp = self._ambiguous_lp()
        T = lp.shape[0]
        beam_labels, beam_len = jax.jit(
            lambda l: engine._pseudo_labels(l, jnp.asarray(T), 8)
        )(lp)
        g_labels, g_len = jax.jit(
            lambda l: greedy_engine._pseudo_labels(l, jnp.asarray(T), 8)
        )(lp)
        assert int(g_len) == 1 and int(g_labels[0]) == 2  # greedy: AM winner
        assert int(beam_len) == 1 and int(beam_labels[0]) == 3  # LM flipped it

    @pytest.mark.slow
    def test_engine_runs_with_lm_pseudo_labels(self, model_and_vars):
        model, variables = model_and_vars
        adapter = _BiasedLMAdapter(CFG.n_classes, favored=3)
        engine = DynamicEvalEngine(
            model, CFG.blank_id, CFG.subsampling_factor,
            tta_cfg(lm_tta_beams=2),
            lm_adapter=adapter,
        )
        out = engine(variables, make_spec(150), return_params=True)
        assert np.isfinite(out.numpy_logits()).all()
        delta = max(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            variables["params"], out.params)))
        assert delta > 0

    @pytest.mark.slow
    def test_batched_records_with_lm_pseudo_labels_matches_serial(
            self, model_and_vars):
        """--dp_records composed with lm_tta_beams: the LM-fused beam runs
        INSIDE the vmapped adapt scan; results must match the serial engine
        per record (the beam's cond/switch branches and the lazy LM carry
        must survive the record-axis vmap)."""
        model, variables = model_and_vars
        adapter = _BiasedLMAdapter(CFG.n_classes, favored=3)

        def engine():
            return DynamicEvalEngine(
                model, CFG.blank_id, CFG.subsampling_factor,
                tta_cfg(lm_tta_beams=2, online=True),
                lm_adapter=adapter,
            )

        specs = [make_spec(150, seed=1), make_spec(150, seed=2)]
        keys = [jax.random.fold_in(jax.random.PRNGKey(4), i) for i in (0, 1)]
        serial = engine()
        ref = [serial(variables, s, rng=k) for s, k in zip(specs, keys)]
        outs = engine().batched(variables, specs, rngs=keys)
        for o, e in zip(outs, ref):
            n = int(np.sum(np.asarray(e.counts) > 0))
            np.testing.assert_allclose(
                np.asarray(o.logits)[:n], np.asarray(e.logits)[:n],
                rtol=5e-4, atol=5e-4)


@pytest.mark.slow
class TestPseudoLabelDebugPrint:
    def test_prints_pseudo_and_noisy_per_chunk(self, model_and_vars, capfd):
        """config.print_pseudo_labels: the per-chunk "Pseudo targets / Noisy
        predictions" debug affordance (lcasr/lib.py:566-568 prints these
        unconditionally; ours is an opt-in host callback from inside the
        jitted scan, decoded through the engine tokenizer when present)."""
        from dynamic_asr_eval_tpu.text import CharTokenizer

        model, variables = model_and_vars
        engine = DynamicEvalEngine(
            model, CFG.blank_id, CFG.subsampling_factor,
            tta_cfg(print_pseudo_labels=True, online=True),
            tokenizer=CharTokenizer(),
        )
        out = engine(variables, make_spec(150))
        jax.effects_barrier()
        assert np.isfinite(out.numpy_logits()).all()
        captured = capfd.readouterr().out
        assert "Pseudo targets:" in captured
        assert "Noisy predictions:" in captured
        # one print per real window
        from dynamic_asr_eval_tpu.ops.chunk import chunk_starts_and_lengths

        n_real = len(chunk_starts_and_lengths(150, SEQ, OVER)[0])
        assert captured.count("Pseudo targets:") == n_real

    def test_batched_rejects_debug_print(self, model_and_vars):
        model, _ = model_and_vars
        engine = DynamicEvalEngine(
            model, CFG.blank_id, CFG.subsampling_factor,
            tta_cfg(print_pseudo_labels=True))
        with pytest.raises(ValueError, match="print_pseudo_labels"):
            engine.batched({"params": {}}, [make_spec(64)])


@pytest.mark.slow
class TestRepeats:
    def test_distinct_rng_per_repeat_changes_output(self, model_and_vars):
        """evals/run.py threads PRNGKey(seed*1000 + repeat): with stochastic
        augmentation, repeats must NOT be bit-identical (lcasr/run.py:76)."""
        model, variables = model_and_vars
        spec = make_spec(200)
        engine = DynamicEvalEngine(
            model, CFG.blank_id, CFG.subsampling_factor, tta_cfg(epochs=1)
        )
        o1 = engine(variables, spec, rng=jax.random.PRNGKey(0),
                    shuffle_rng=np.random.default_rng(0))
        o2 = engine(variables, spec, rng=jax.random.PRNGKey(1),
                    shuffle_rng=np.random.default_rng(1))
        assert np.abs(o1.numpy_logits() - o2.numpy_logits()).max() > 0

    def test_driver_folds_distinct_key_per_record(self, monkeypatch):
        """evals/run.py must fold the record index into the per-repeat key so
        recordings within a repeat do not share augmentation-noise sequences
        (the reference's global RNG advances across recordings,
        lcasr/run.py:76)."""
        from dynamic_asr_eval_tpu.evals import run as run_mod
        from dynamic_asr_eval_tpu.tta.runner import DynamicEvalEngine as Eng

        seen = []
        orig = Eng.__call__

        def spy(self, variables, spec, seq_len=-1, overlap=-1, **kw):
            seen.append(np.asarray(jax.random.key_data(kw["rng"])).copy())
            return orig(self, variables, spec, seq_len, overlap, **kw)

        monkeypatch.setattr(Eng, "__call__", spy)
        run_mod.cli(["-d", "synthetic", "--quiet",
                     "-kwargs", "epochs=1", "seq_len=512", "overlap=0"])
        assert len(seen) >= 2
        assert not np.array_equal(seen[0], seen[1]), "records share one key"


class TestBucketedProgramShapes:
    """Round-5 corpus fix: program shapes (padded spec length, stitched
    buffer length) must derive from the window-count bucket alone, never
    from the exact frame count — otherwise every distinct recording length
    recompiles the adapt executable (measured on chip: corpus RTFx 83 → 278
    once shapes were bucketed; PERF.md round-5)."""

    @staticmethod
    def _same_bucket_lengths(seq, overlap, lo=150, hi=400):
        """Find two distinct multi-window frame counts whose window counts
        share one pad_num_chunks bucket."""
        from dynamic_asr_eval_tpu.ops.chunk import (
            chunk_starts_and_lengths, pad_num_chunks)

        by_bucket = {}
        for T in range(lo, hi):
            n_real = len(chunk_starts_and_lengths(T, seq, overlap)[0])
            if n_real < 2:
                continue
            by_bucket.setdefault(pad_num_chunks(n_real), []).append(T)
        for bucket, ts in sorted(by_bucket.items()):
            if len(ts) >= 2 and ts[-1] - ts[0] >= 8:
                return ts[0], ts[-1]
        raise AssertionError("no same-bucket length pair found")

    def test_plan_shapes_keyed_on_bucket_not_frame_count(self, model_and_vars):
        model, variables = model_and_vars
        engine = DynamicEvalEngine(
            model, CFG.blank_id, CFG.subsampling_factor, tta_cfg())
        t_a, t_b = self._same_bucket_lengths(SEQ, OVER)
        plan_a = engine._plan(make_spec(t_a), -1, -1)
        plan_b = engine._plan(make_spec(t_b), -1, -1)
        # (spec_padded.shape, W, N, total_ds) — everything that enters the
        # compiled program's signature — must be identical
        sig_a = (plan_a[0].shape, plan_a[2], plan_a[3], plan_a[7])
        sig_b = (plan_b[0].shape, plan_b[2], plan_b[3], plan_b[7])
        assert sig_a == sig_b, (sig_a, sig_b)

    @pytest.mark.slow
    def test_same_bucket_recordings_share_one_adapt_executable(
            self, model_and_vars):
        model, variables = model_and_vars
        engine = DynamicEvalEngine(
            model, CFG.blank_id, CFG.subsampling_factor, tta_cfg())
        t_a, t_b = self._same_bucket_lengths(SEQ, OVER)
        out_a = engine(variables, make_spec(t_a, seed=1),
                       rng=jax.random.PRNGKey(1))
        out_b = engine(variables, make_spec(t_b, seed=2),
                       rng=jax.random.PRNGKey(2))
        adapt_keys = [k for k in engine._adapt_cache
                      if isinstance(k, tuple) and k and k[0] not in
                      ("tile", "dp_records")]
        assert len(adapt_keys) == 1, adapt_keys
        # bucket padding must not leak into the trimmed deliverable: valid
        # stitched rows still cover exactly ceil(spec_n / ds)
        ds = CFG.subsampling_factor
        assert out_a.numpy_logits().shape[0] == -(-t_a // ds)
        assert out_b.numpy_logits().shape[0] == -(-t_b // ds)

    @pytest.mark.slow
    def test_batched_groups_share_one_executable_across_max_lengths(
            self, model_and_vars):
        model, variables = model_and_vars
        engine = DynamicEvalEngine(
            model, CFG.blank_id, CFG.subsampling_factor, tta_cfg())
        t_a, t_b = self._same_bucket_lengths(SEQ, OVER)
        # two groups whose MAX lengths differ but share a window bucket
        engine.batched(variables, [make_spec(t_a, seed=1),
                                   make_spec(t_a - 4, seed=2)],
                       rng=jax.random.PRNGKey(1))
        engine.batched(variables, [make_spec(t_b, seed=3),
                                   make_spec(t_b - 4, seed=4)],
                       rng=jax.random.PRNGKey(2))
        dp_keys = [k for k in engine._adapt_cache
                   if isinstance(k, tuple) and k and k[0] == "dp_records"]
        assert len(dp_keys) == 1, dp_keys
