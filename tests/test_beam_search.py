import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_asr_eval_tpu.ops.beam_search import (
    BeamSearchHost,
    NGramAdapter,
    TransformerLMAdapter,
    UniformLMAdapter,
    beam_search_device,
    _roll_hash,
)
from dynamic_asr_eval_tpu.lm.ngram import NGramLM, _hash_ctx, load_arpa


def clean_emissions(tokens, V, blank, frames_per=2, blanks_between=1, peak=6.0):
    """Sharp emissions realizing a token sequence."""
    rows = []
    for t in tokens:
        for _ in range(frames_per):
            rows.append(t)
        for _ in range(blanks_between):
            rows.append(blank)
    T = len(rows)
    lp = np.full((T, V + 1), -peak, dtype=np.float32)
    for i, k in enumerate(rows):
        lp[i, k] = 0.0
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    return lp


class TestHostBeamSearch:
    def test_recovers_clean_sequence(self):
        V, blank = 10, 10
        seq = [3, 5, 3, 7]
        lp = clean_emissions(seq, V, blank)
        bs = BeamSearchHost(lp, UniformLMAdapter(V), beam_width=4, alpha=0.0, beta=0.0)
        results = bs.run_search()
        assert list(results[0][0]) == seq

    def test_repeated_token_needs_blank(self):
        V, blank = 6, 6
        # 2 2 (no blank) → single token; 2 blank 2 → two tokens
        lp1 = clean_emissions([2], V, blank, frames_per=4, blanks_between=0)
        bs1 = BeamSearchHost(lp1, UniformLMAdapter(V), beam_width=4, alpha=0.0, beta=0.0)
        assert list(bs1.run_search()[0][0]) == [2]

        lp2 = clean_emissions([2, 2], V, blank, frames_per=2, blanks_between=1)
        bs2 = BeamSearchHost(lp2, UniformLMAdapter(V), beam_width=4, alpha=0.0, beta=0.0)
        assert list(bs2.run_search()[0][0]) == [2, 2]

    def test_beta_rewards_insertions(self):
        V, blank = 6, 6
        rng = np.random.default_rng(0)
        lp = np.log(jax.nn.softmax(jnp.asarray(rng.standard_normal((6, V + 1)) * 2)))
        lp = np.asarray(lp)
        n0 = len(BeamSearchHost(lp, UniformLMAdapter(V), 4, alpha=0.0, beta=-5.0,
                                prune_less_than_val=None).run_search()[0][0])
        n1 = len(BeamSearchHost(lp, UniformLMAdapter(V), 4, alpha=0.0, beta=5.0,
                                prune_less_than_val=None).run_search()[0][0])
        assert n1 >= n0

    def test_token_zero_never_proposed(self):
        V, blank = 5, 5
        lp = clean_emissions([0, 3], V, blank)
        bs = BeamSearchHost(lp, UniformLMAdapter(V), beam_width=4, alpha=0.0, beta=0.0)
        top = bs.run_search()[0][0]
        assert 0 not in top


class TestDeviceMatchesHost:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_uniform_lm_agreement(self, seed):
        V, blank = 8, 8
        rng = np.random.default_rng(seed)
        logits = rng.standard_normal((12, V + 1)).astype(np.float32) * 2
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits)))
        kw = dict(beam_width=6, alpha=0.3, beta=0.5, top_am_threshold=-6.0,
                  prune_less_than_val=None)
        host = BeamSearchHost(lp, UniformLMAdapter(V), **kw).run_search()
        toks, lens, scores = beam_search_device(
            jnp.asarray(lp), UniformLMAdapter(V), top_k_tokens=V - 1, **kw
        )
        h_prefix, h_score = host[0]
        d_prefix = list(np.asarray(toks[0])[: int(lens[0])])
        assert list(h_prefix) == d_prefix
        assert h_score == pytest.approx(float(scores[0]), abs=1e-3)

    def test_ngram_agreement(self):
        V, blank = 8, 8
        # bigram LM favoring 3 -> 5
        tables = {
            1: (np.array([_hash_ctx([v]) for v in range(V)], dtype=np.uint64),
                np.full((V,), -2.0, np.float32),
                np.zeros((V,), np.float32)),
            2: (np.array([_hash_ctx([3, 5])], dtype=np.uint64),
                np.array([-0.1], np.float32),
                np.zeros((1,), np.float32)),
        }
        lm = NGramLM(2, tables, V)
        rng = np.random.default_rng(5)
        logits = rng.standard_normal((10, V + 1)).astype(np.float32) * 2
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits)))
        kw = dict(beam_width=5, alpha=0.5, beta=0.2, prune_less_than_val=None)
        host = BeamSearchHost(lp, NGramAdapter(lm), **kw).run_search()
        toks, lens, scores = beam_search_device(
            jnp.asarray(lp), NGramAdapter(lm), top_k_tokens=V - 1, **kw
        )
        assert list(host[0][0]) == list(np.asarray(toks[0])[: int(lens[0])])
        assert host[0][1] == pytest.approx(float(scores[0]), abs=1e-3)


class TestBlankFastPath:
    """Frames where ONLY blank clears top_am_threshold take the device
    search's dedicated blank branch (no candidate fan-out, no LM); these
    inputs make most frames such, and a transformer LM exercises the lazy
    permutation-carried KV cache across the emit/no-emit boundary."""

    @pytest.mark.parametrize("seed", [0, 1])
    def test_blank_dominant_agreement(self, seed):
        from dynamic_asr_eval_tpu.lm.transformer_lm import (
            TransformerLMConfig, init_lm,
        )

        V, blank = 12, 12
        rng = np.random.default_rng(seed)
        T = 24
        lp = np.full((T, V + 1), np.log(0.002 / V), np.float32)
        lp[:, blank] = np.log(0.998)  # blank-only frames (fast path)
        for t in range(1, T, 5):  # sparse token spikes (full path + LM)
            tok = int(rng.integers(1, V))
            lp[t, tok], lp[t, blank] = np.log(0.9), np.log(0.05)
        lp -= np.log(np.exp(lp).sum(-1, keepdims=True))

        cfg = TransformerLMConfig(vocab_size=V, n_layers=2, d_model=32,
                                  n_heads=2, max_cache_length=8)
        model, variables = init_lm(cfg, jax.random.PRNGKey(3))
        adapter = TransformerLMAdapter(model, variables, cfg, bos_id=1)
        kw = dict(beam_width=5, alpha=0.4, beta=1.0, top_am_threshold=-6.0,
                  prune_less_than_val=None)
        host = BeamSearchHost(lp, adapter, **kw).run_search()
        toks, lens, scores = beam_search_device(jnp.asarray(lp), adapter, **kw)
        assert tuple(np.asarray(toks[0])[: int(lens[0])].tolist()) == host[0][0]
        assert float(scores[0]) == pytest.approx(host[0][1], abs=2e-3)


class TestHash:
    def test_host_device_hash_agree(self):
        seqs = [[1], [3, 5], [7, 7, 2], [100, 4095, 17]]
        for seq in seqs:
            h = _hash_ctx(seq)
            hi = jnp.asarray([np.uint32(1442695040888963407 >> 32)])
            lo = jnp.asarray([np.uint32(1442695040888963407 & 0xFFFFFFFF)])
            for t in seq:
                hi, lo = _roll_hash(hi, lo, jnp.asarray([t], jnp.int32))
            got = (int(hi[0]) << 32) | int(lo[0])
            assert got == h, f"hash mismatch for {seq}"


class TestNGram:
    def test_backoff_scoring(self):
        V = 6
        # unigrams: all logp -1.0, backoff -0.5 ; bigram (2,3): logp -0.2
        tables = {
            1: (np.array([_hash_ctx([v]) for v in range(V)], dtype=np.uint64),
                np.full((V,), -1.0, np.float32),
                np.full((V,), -0.5, np.float32)),
            2: (np.array([_hash_ctx([2, 3])], dtype=np.uint64),
                np.array([-0.2], np.float32),
                np.zeros((1,), np.float32)),
        }
        lm = NGramLM(2, tables, V)
        ctx = jnp.asarray([[-1, 2]], jnp.int32)
        lens = jnp.asarray([1], jnp.int32)
        scores = np.asarray(lm.score_next(ctx, lens))[0]
        # seen bigram: exact
        assert scores[3] == pytest.approx(-0.2, abs=1e-5)
        # unseen bigram: unigram + backoff(context 2)
        assert scores[4] == pytest.approx(-1.0 + -0.5, abs=1e-5)

    def test_long_equal_hi32_run_still_hits(self):
        """Regression: a run of >8 keys sharing the hi-32 bits must not turn
        a table hit into a silent unk — the probe width is audited at build
        time (probe_width) to cover the longest duplicate run."""
        from dynamic_asr_eval_tpu.lm.ngram import probe_width

        V = 40
        n_run = 20
        hi = np.uint64(0xDEADBEEF) << np.uint64(32)
        # 20 colliding keys (same hi32, distinct lo32) + some non-colliding
        keys = np.array(
            [int(hi | np.uint64(lo)) for lo in range(100, 100 + n_run)]
            + [_hash_ctx([v]) for v in range(5)],
            dtype=np.uint64,
        )
        logp = np.arange(len(keys), dtype=np.float32) * -0.1 - 0.1
        tables = {1: (keys, logp, np.zeros_like(logp))}
        lm = NGramLM(1, tables, V)
        assert lm.probe[1] >= n_run
        assert probe_width(np.asarray([1, 1, 1, 2], np.uint32)) == 8  # min 8
        # query the LAST key of the colliding run directly via _lookup
        q = keys[n_run - 1]
        found, lp, _ = lm._lookup(
            1,
            jnp.asarray([np.uint32(q >> np.uint64(32))]),
            jnp.asarray([np.uint32(q & np.uint64(0xFFFFFFFF))]),
        )
        assert bool(found[0]), "deep-run key silently missed"
        # value must match the entry for that exact key after the stable sort
        order = np.argsort(keys, kind="stable")
        expect = logp[order][int(np.searchsorted(keys[order], q))]
        assert float(lp[0]) == pytest.approx(float(expect), abs=1e-6)

    def test_word_adapter_probe_covers_duplicates(self):
        """WordNGramAdapter audits its word-hash table the same way."""
        from dynamic_asr_eval_tpu.lm.ngram import probe_width
        from dynamic_asr_eval_tpu.lm.word_fusion import WordNGramAdapter

        class _Tok:
            def vocab_size(self):
                return 4

            def id_to_piece(self, i):
                return ["▁a", "b", "▁c", "d"][i]

        words = {w: i for i, w in enumerate(["a", "ab", "c", "cd", "<unk>"])}
        tables = {1: (np.array([_hash_ctx([v]) for v in range(5)], np.uint64),
                      np.full((5,), -1.0, np.float32),
                      np.zeros((5,), np.float32))}
        ad = WordNGramAdapter(NGramLM(1, tables, 5), words, _Tok())
        hi = np.asarray(ad.wh_hi, np.uint32)
        assert ad._probe == probe_width(np.sort(hi))

    def test_empty_context_uses_unigrams(self):
        V = 4
        tables = {
            1: (np.array([_hash_ctx([v]) for v in range(V)], dtype=np.uint64),
                np.array([-1.0, -2.0, -3.0, -4.0], np.float32),
                np.zeros((V,), np.float32)),
        }
        lm = NGramLM(1, tables, V)
        scores = np.asarray(lm.score_next(jnp.full((1, 1), -1, jnp.int32), jnp.asarray([0])))[0]
        np.testing.assert_allclose(scores, [-1, -2, -3, -4], rtol=1e-5)

    def test_arpa_loader(self, tmp_path):
        arpa = tmp_path / "tiny.arpa"
        arpa.write_text(
            "\\data\\\n"
            "ngram 1=3\n"
            "ngram 2=1\n"
            "\n"
            "\\1-grams:\n"
            "-1.0\ta\t-0.30103\n"
            "-1.3\tb\t0.0\n"
            "-2.0\t<unk>\n"
            "\n"
            "\\2-grams:\n"
            "-0.5\ta b\n"
            "\n"
            "\\end\\\n"
        )
        token_to_id = {"a": 1, "b": 2, "<unk>": 0}
        lm = load_arpa(str(arpa), token_to_id, vocab_size=4)
        import math

        LOG10 = math.log(10)
        # P(b | a): seen bigram
        scores = np.asarray(
            lm.score_next(jnp.asarray([[1]], jnp.int32), jnp.asarray([1]))
        )[0]
        assert scores[2] == pytest.approx(-0.5 * LOG10, abs=1e-4)
        # P(a | b): backoff — b has backoff 0 → unigram a
        scores_b = np.asarray(
            lm.score_next(jnp.asarray([[2]], jnp.int32), jnp.asarray([1]))
        )[0]
        assert scores_b[1] == pytest.approx(-1.0 * LOG10, abs=1e-4)


class TestTransformerLM:
    def test_step_determinism_and_cache_wrap(self):
        from dynamic_asr_eval_tpu.lm.transformer_lm import (
            TransformerLM, TransformerLMConfig, empty_cache, init_lm,
        )

        cfg_small = TransformerLMConfig(vocab_size=16, n_layers=2, d_model=32,
                                        n_heads=2, max_cache_length=8)
        model, variables = init_lm(cfg_small, jax.random.PRNGKey(0))

        def run(tokens, cfg):
            m = TransformerLM(cfg)
            cache = empty_cache(cfg, 1)
            outs = []
            for t in tokens:
                lps, cache = m.apply(variables, jnp.asarray([t], jnp.int32), cache)
                outs.append(np.asarray(lps)[0])
            return np.stack(outs)

        toks = [1, 5, 3]
        a = run(toks, cfg_small)
        b = run(toks, cfg_small)
        np.testing.assert_array_equal(a, b)
        # short sequence: cache length 4 vs 8 identical (no eviction yet)
        cfg4 = TransformerLMConfig(vocab_size=16, n_layers=2, d_model=32,
                                   n_heads=2, max_cache_length=4)
        c = run(toks, cfg4)
        np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-6)

    def test_ring_buffer_eviction_limits_context(self):
        from dynamic_asr_eval_tpu.lm.transformer_lm import (
            TransformerLM, TransformerLMConfig, empty_cache, init_lm,
        )

        cfg = TransformerLMConfig(vocab_size=16, n_layers=1, d_model=32,
                                  n_heads=2, max_cache_length=4)
        model, variables = init_lm(cfg, jax.random.PRNGKey(1))

        def last_lps(tokens):
            cache = empty_cache(cfg, 1)
            lps = None
            for t in tokens:
                lps, cache = model.apply(variables, jnp.asarray([t], jnp.int32), cache)
            return np.asarray(lps)[0]

        # with window 4, the first token of a 6-token history is evicted:
        # histories differing only in evicted positions give identical output
        a = last_lps([1, 2, 3, 4, 5, 6])
        b = last_lps([9, 2, 3, 4, 5, 6])
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
        # but differing within the window matters
        c = last_lps([1, 2, 3, 4, 9, 6])
        assert not np.allclose(a, c, rtol=1e-4)

    def test_adapter_in_beam_search(self):
        from dynamic_asr_eval_tpu.lm.transformer_lm import TransformerLMConfig, init_lm

        V = 12
        cfg = TransformerLMConfig(vocab_size=V, n_layers=1, d_model=32,
                                  n_heads=2, max_cache_length=8)
        model, variables = init_lm(cfg, jax.random.PRNGKey(2))
        adapter = TransformerLMAdapter(model, variables, cfg, bos_id=0)
        lp = clean_emissions([3, 5], V, V)
        kw = dict(beam_width=4, alpha=0.3, beta=0.2, prune_less_than_val=None)
        host = BeamSearchHost(lp, adapter, **kw).run_search()
        toks, lens, scores = beam_search_device(
            jnp.asarray(lp), adapter, top_k_tokens=V - 1, **kw
        )
        assert list(host[0][0]) == list(np.asarray(toks[0])[: int(lens[0])])
        assert host[0][1] == pytest.approx(float(scores[0]), abs=1e-2)


class TestBlankCollapse:
    def test_collapse_preserves_decode(self):
        from dynamic_asr_eval_tpu.ops.beam_search import collapse_blank_frames

        V, blank = 10, 10
        seq = [3, 5, 5, 7, 2]
        lp = clean_emissions(seq, V, blank, frames_per=2, blanks_between=6, peak=9.0)
        lpc = collapse_blank_frames(lp, threshold=0.9)
        assert lpc.shape[0] < lp.shape[0]
        kw = dict(beam_width=4, alpha=0.0, beta=0.0, prune_less_than_val=None)
        full = beam_search_device(jnp.asarray(lp), UniformLMAdapter(V), top_k_tokens=V - 1, **kw)
        coll = beam_search_device(jnp.asarray(lpc), UniformLMAdapter(V), top_k_tokens=V - 1, **kw)
        a = list(np.asarray(full[0][0])[: int(full[1][0])])
        b = list(np.asarray(coll[0][0])[: int(coll[1][0])])
        assert a == b == seq

    def test_repeated_tokens_survive_collapse(self):
        """The kept blank per run must preserve the repeat separator."""
        from dynamic_asr_eval_tpu.ops.beam_search import collapse_blank_frames

        V, blank = 6, 6
        lp = clean_emissions([2, 2, 2], V, blank, frames_per=2, blanks_between=5, peak=9.0)
        lpc = collapse_blank_frames(lp, threshold=0.9)
        toks, lens, _ = beam_search_device(
            jnp.asarray(lpc), UniformLMAdapter(V), beam_width=4,
            alpha=0.0, beta=0.0, prune_less_than_val=None, top_k_tokens=V - 1,
        )
        assert list(np.asarray(toks[0])[: int(lens[0])]) == [2, 2, 2]

    def test_device_collapse_matches_host(self):
        """collapse_blank_frames_device (the TPU-resident final-decode path)
        must reproduce the host keep rule row-for-row, incl. valid_frames
        masking of the engine's stitch padding."""
        from dynamic_asr_eval_tpu.ops.beam_search import (
            collapse_blank_frames,
            collapse_blank_frames_device,
        )

        V, blank = 10, 10
        lp = clean_emissions([3, 5, 5, 7, 2], V, blank, frames_per=2,
                             blanks_between=6, peak=9.0)
        host = collapse_blank_frames(lp, threshold=0.9)
        dev, n = collapse_blank_frames_device(jnp.asarray(lp), threshold=0.9)
        assert int(n) == host.shape[0]
        np.testing.assert_allclose(np.asarray(dev)[: int(n)], host,
                                   rtol=1e-6, atol=1e-6)
        assert not np.any(np.asarray(dev)[int(n):])  # compaction zero-fills

        # padded stitch rows (all-zero log-probs) must be excluded by
        # valid_frames, not treated as emitting frames
        T = lp.shape[0]
        padded = np.concatenate([lp, np.zeros((7, V + 1), np.float32)])
        dev_p, n_p = collapse_blank_frames_device(
            jnp.asarray(padded), threshold=0.9,
            valid_frames=jnp.asarray(T, jnp.int32))
        assert int(n_p) == host.shape[0]
        np.testing.assert_allclose(np.asarray(dev_p)[: int(n_p)], host,
                                   rtol=1e-6, atol=1e-6)


class TestSegmentedDecode:
    """beam_search_segmented must be bit-equivalent to one long scan — it is
    the stitched-scale decode path (a recording is 25-55k frames after blank
    collapse; one XLA program that long has killed the TPU worker)."""

    def _lp(self, T, V, seed=0):
        rng = np.random.default_rng(seed)
        logits = rng.standard_normal((T, V + 1)).astype(np.float32) * 2
        logits[:, V] += 2.0  # blank-lean, like real CTC output
        return np.asarray(jax.nn.log_softmax(jnp.asarray(logits)))

    @pytest.mark.parametrize("seg", [16, 50, 64])
    def test_matches_unsegmented(self, seg):
        from dynamic_asr_eval_tpu.ops.beam_search import beam_search_segmented

        V = 8
        lp = self._lp(200, V, seed=7)
        kw = dict(beam_width=5, alpha=0.3, beta=0.4, top_am_threshold=-6.0,
                  prune_less_than_val=None, top_k_tokens=V - 1)
        t1, l1, s1 = beam_search_device(jnp.asarray(lp), UniformLMAdapter(V), **kw)
        t2, l2, s2 = beam_search_segmented(
            jnp.asarray(lp), UniformLMAdapter(V), segment_frames=seg, **kw
        )
        assert int(l1[0]) == int(l2[0])
        np.testing.assert_array_equal(
            np.asarray(t1[0])[: int(l1[0])], np.asarray(t2[0])[: int(l2[0])]
        )
        assert float(s1[0]) == pytest.approx(float(s2[0]), abs=1e-4)

    def test_segmented_with_transformer_lm(self):
        from dynamic_asr_eval_tpu.lm.transformer_lm import TransformerLMConfig, init_lm
        from dynamic_asr_eval_tpu.ops.beam_search import (
            TransformerLMAdapter, beam_search_segmented,
        )

        V = 8
        cfg = TransformerLMConfig(vocab_size=V, n_layers=1, d_model=16,
                                  n_heads=2, max_cache_length=8)
        model, variables = init_lm(cfg, jax.random.PRNGKey(0))
        ad = TransformerLMAdapter(model, variables, cfg, bos_id=0)
        lp = self._lp(90, V, seed=11)
        kw = dict(beam_width=4, alpha=0.4, beta=0.3, top_am_threshold=-6.0,
                  prune_less_than_val=None, top_k_tokens=V - 1)
        t1, l1, s1 = beam_search_device(jnp.asarray(lp), ad, **kw)
        t2, l2, s2 = beam_search_segmented(
            jnp.asarray(lp), ad, segment_frames=32, **kw
        )
        np.testing.assert_array_equal(
            np.asarray(t1[0])[: int(l1[0])], np.asarray(t2[0])[: int(l2[0])]
        )
        assert float(s1[0]) == pytest.approx(float(s2[0]), abs=1e-4)

    def test_short_input_passthrough(self):
        from dynamic_asr_eval_tpu.ops.beam_search import beam_search_segmented

        V = 8
        lp = self._lp(20, V, seed=3)
        kw = dict(beam_width=4, prune_less_than_val=None, top_k_tokens=V - 1)
        t1, l1, _ = beam_search_device(jnp.asarray(lp), UniformLMAdapter(V), **kw)
        t2, l2, _ = beam_search_segmented(
            jnp.asarray(lp), UniformLMAdapter(V), segment_frames=4096, **kw
        )
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


class TestStreams:
    """beam_search_streams: vmapped multi-stream decode must agree EXACTLY
    per stream with beam_search_segmented on the same stream — including
    ragged stream lengths, segment-boundary state carry, and the transformer
    LM's permutation-carried KV cache under vmapped lax.switch."""

    def _blanky_stream(self, seed, T, V, blank):
        rng = np.random.default_rng(seed)
        lp = np.full((T, V + 1), np.log(0.002 / V), np.float32)
        lp[:, blank] = np.log(0.998)
        for t in range(1, T, 4):
            tok = int(rng.integers(1, V))
            lp[t, tok], lp[t, blank] = np.log(0.9), np.log(0.05)
        lp -= np.log(np.exp(lp).sum(-1, keepdims=True))
        return lp

    @pytest.mark.slow
    def test_streams_match_segmented_transformer_lm(self):
        from dynamic_asr_eval_tpu.lm.transformer_lm import (
            TransformerLMConfig, init_lm,
        )
        from dynamic_asr_eval_tpu.ops.beam_search import (
            beam_search_segmented, beam_search_streams,
        )

        V, blank, T = 12, 12, 40
        lens = [40, 33, 21]  # ragged: stream 2 ends mid-segment
        streams = np.stack([
            np.concatenate([
                self._blanky_stream(s, n, V, blank),
                np.zeros((T - n, V + 1), np.float32),
            ]) for s, n in enumerate(lens)
        ])
        cfg = TransformerLMConfig(vocab_size=V, n_layers=2, d_model=32,
                                  n_heads=2, max_cache_length=8)
        model, variables = init_lm(cfg, jax.random.PRNGKey(3))
        adapter = TransformerLMAdapter(model, variables, cfg, bos_id=1)
        kw = dict(beam_width=5, alpha=0.4, beta=1.0, top_am_threshold=-6.0,
                  prune_less_than_val=3.0)

        toks, lns, scores = beam_search_streams(
            jnp.asarray(streams), adapter,
            valid_frames=jnp.asarray(lens), segment_frames=16, **kw)
        assert toks.shape[0] == 3

        for s, n in enumerate(lens):
            want_t, want_l, want_s = beam_search_segmented(
                jnp.asarray(streams[s, :n]), adapter, segment_frames=16,
                max_tokens=T, **kw)
            got = np.asarray(toks[s, 0])[: int(lns[s, 0])]
            want = np.asarray(want_t[0])[: int(want_l[0])]
            np.testing.assert_array_equal(got, want)
            assert float(scores[s, 0]) == pytest.approx(float(want_s[0]), abs=2e-3)

    def test_streams_single_segment_ngram(self):
        from dynamic_asr_eval_tpu.ops.beam_search import beam_search_streams

        V, blank = 8, 8
        tokens = [[1, 2, 3], [4, 5, 6, 7]]
        lps = [clean_emissions(t, V, blank) for t in tokens]
        T = max(lp.shape[0] for lp in lps)
        streams = np.stack([
            np.concatenate([lp, np.zeros((T - lp.shape[0], V + 1), np.float32)])
            for lp in lps
        ])
        lens = [lp.shape[0] for lp in lps]
        kw = dict(beam_width=4, alpha=0.0, beta=0.0, prune_less_than_val=None)
        toks, lns, _ = beam_search_streams(
            jnp.asarray(streams), UniformLMAdapter(V),
            valid_frames=jnp.asarray(lens), **kw)
        for s, t in enumerate(tokens):
            got = np.asarray(toks[s, 0])[: int(lns[s, 0])].tolist()
            assert got == t
