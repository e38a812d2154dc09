import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_asr_eval_tpu.text import CharTokenizer


class TestSyntheticSpecDataset:
    def test_frames_from_env_and_record_contract(self, monkeypatch):
        """bench.py's corpus mode feeds the real driver via this adapter:
        per-record frame counts from DAE_SYNTH_SPEC_FRAMES, records carry the
        standard {'id','text','audio','process_fn'} contract, and process_fn
        returns ([1, 80, T] float32 spec, normalized gold)."""
        from dynamic_asr_eval_tpu.data import get_dataset

        monkeypatch.setenv("DAE_SYNTH_SPEC_FRAMES", "120,250,120")
        recs = get_dataset("synthetic_spec", "test")
        assert [r["frames"] for r in recs] == [120, 250, 120]
        assert len({r["id"] for r in recs}) == 3
        spec, gold = recs[1]["process_fn"](recs[1])
        assert spec.shape == (1, 80, 250) and spec.dtype == np.float32
        assert isinstance(gold, str) and gold
        # deterministic per record (seeded)
        spec2, _ = recs[1]["process_fn"](recs[1])
        np.testing.assert_array_equal(spec, spec2)


class TestLexicon:
    def _emissions(self, text, tok):
        V = tok.vocab_size()
        blank = tok.blank_id
        ids = tok.encode(text)
        frames = []
        for i in ids:
            frames += [i, blank]
        lp = np.full((len(frames), V + 1), -5.0, np.float32)
        for t, k in enumerate(frames):
            lp[t, k] = 0.0
        return lp - np.log(np.exp(lp).sum(-1, keepdims=True))

    def test_constrained_decode_picks_lexicon_word(self):
        from dynamic_asr_eval_tpu.ops.lexicon import word_beam_search

        tok = CharTokenizer()
        # emissions spell "catt" (an OOV); lexicon only has cat / cart
        lp = self._emissions("catt", tok)
        out = word_beam_search(lp, ["cat", "cart"], tok, beam_width=8)
        assert out == "cat"

    def test_unconstrained_would_emit_oov(self):
        from dynamic_asr_eval_tpu.ops.beam_search import (
            UniformLMAdapter, beam_search_device,
        )

        tok = CharTokenizer()
        lp = self._emissions("catt", tok)
        toks, lens, _ = beam_search_device(
            jnp.asarray(lp), UniformLMAdapter(tok.vocab_size()), beam_width=8,
            alpha=0.0, beta=0.0, exclude_token_zero=False,
        )
        assert tok.decode([int(x) for x in np.asarray(toks[0])[: int(lens[0])]]) == "catt"

    def test_multiword_constrained(self):
        from dynamic_asr_eval_tpu.ops.lexicon import word_beam_search

        tok = CharTokenizer()
        lp = self._emissions("the cat", tok)
        out = word_beam_search(lp, ["the", "cat", "dog"], tok, beam_width=8)
        assert out == "the cat"

    def test_alpha_zero_rejected(self):
        from dynamic_asr_eval_tpu.ops.lexicon import word_beam_search

        tok = CharTokenizer()
        lp = self._emissions("cat", tok)
        with pytest.raises(ValueError, match="alpha > 0"):
            word_beam_search(lp, ["cat"], tok, alpha=0.0)


class TestTLMTools:
    @pytest.mark.slow
    def test_create_logits_and_rescore(self, tmp_path):
        from dynamic_asr_eval_tpu.config import TTAConfig
        from dynamic_asr_eval_tpu.evals.tlm_tools import create_logits, tlm_beam_rescore
        from dynamic_asr_eval_tpu.models import ConformerConfig, init_conformer
        from dynamic_asr_eval_tpu.ops.beam_search import UniformLMAdapter
        from dynamic_asr_eval_tpu.tta import DynamicEvalEngine

        cfg = ConformerConfig(
            feat_in=16, n_layers=1, d_model=32, n_heads=2, head_dim=16,
            vocab_size=28, subsampling_factor=4, subsampling_conv_channels=8,
            conv_kernel_size=5, compute_dtype=jnp.float32,
        )
        model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=64)
        engine = DynamicEvalEngine(
            model, cfg.blank_id, cfg.subsampling_factor,
            TTAConfig(seq_len=64, overlap=32, epochs=0, shuffle=False),
        )
        records = [
            {"id": f"r{i}", "text": "x",
             "process_fn": lambda rec, i=i: (
                 np.random.default_rng(i).standard_normal((16, 100)).astype(np.float32),
                 "hello world",
             )}
            for i in range(2)
        ]
        paths = create_logits(engine, variables, records, str(tmp_path), 64, 32)
        assert len(paths) == 2
        with open(paths[0], "rb") as f:
            d = pickle.load(f)
        assert d["logits"].shape[1] == 29 and d["gold"] == "hello world"

        tok = CharTokenizer()
        wer, detail = tlm_beam_rescore(
            paths, lambda: UniformLMAdapter(tok.vocab_size()), tok,
            beam_width=4, alpha=0.0, beta=0.0, num_workers=2,
        )
        assert np.isfinite(wer)
        assert len(detail) == 2

        # device-batched streams path (stream_batch > available recordings
        # exercises the zero-length pad lane) must match the per-recording
        # device path id-for-id
        wer_s, detail_s = tlm_beam_rescore(
            paths, lambda: UniformLMAdapter(28), tok,
            beam_width=4, alpha=0.0, beta=0.0, use_device=True,
            stream_batch=3, segment_frames=8,
        )
        wer_d, detail_d = tlm_beam_rescore(
            paths, lambda: UniformLMAdapter(28), tok,
            beam_width=4, alpha=0.0, beta=0.0, use_device=True,
        )
        assert [d["hyp"] for d in detail_s] == [d["hyp"] for d in detail_d]
        assert wer_s == pytest.approx(wer_d)

    def test_lm_prefill_ring_buffer(self):
        from dynamic_asr_eval_tpu.evals.tlm_tools import lm_init_state_from_text
        from dynamic_asr_eval_tpu.lm.transformer_lm import TransformerLMConfig, init_lm

        cfg = TransformerLMConfig(vocab_size=30, n_layers=1, d_model=32,
                                  n_heads=2, max_cache_length=8)
        model, variables = init_lm(cfg, jax.random.PRNGKey(0))
        tok = CharTokenizer()
        cache, lps = lm_init_state_from_text(model, variables, cfg, tok, "hello there friend")
        # cache length == number of consumed tokens; ring keeps last 8
        assert int(cache["lengths"][0]) == len(tok.encode("hello there friend")) + 1
        assert lps.shape == (1, 30)


class TestAnalysis:
    def test_aggregate_and_latex(self, tmp_path):
        from dynamic_asr_eval_tpu import analysis

        for i in range(2):
            with open(tmp_path / f"run_{i}.pkl", "wb") as f:
                pickle.dump({"wer": 0.1 * (i + 1), "words": 100, "ins_rate": 0.01,
                             "del_rate": 0.02, "sub_rate": 0.03}, f)
        agg = analysis.aggregate_per_recording(str(tmp_path / "*.pkl"))
        assert agg["n_runs"] == 2
        assert agg["wer"] == pytest.approx(0.15)

        tex = analysis.to_latex_table(
            [{"name": "a", "wer": 0.1}], ["name", "wer"], caption="test"
        )
        assert r"\begin{tabular}" in tex and "0.1000" in tex

    def test_plot(self, tmp_path):
        from dynamic_asr_eval_tpu import analysis

        p = analysis.plot_wer_bars(["a", "b"], [0.1, 0.2], str(tmp_path / "x.png"),
                                   baseline=0.15)
        assert os.path.exists(p)

    def test_plot_protocol_scheme(self, tmp_path):
        from dynamic_asr_eval_tpu import analysis

        for proto in ("within_loo", "half_concat"):
            p = analysis.plot_protocol_scheme(proto, str(tmp_path / f"{proto}.png"))
            assert os.path.exists(p)
        with pytest.raises(ValueError):
            analysis.plot_protocol_scheme("nope", str(tmp_path / "x.png"))

    def test_gap_audit(self):
        from dynamic_asr_eval_tpu.analysis import audit_transcript_gaps

        recs = [{"id": "r", "timings": [(0, 5), (30, 40)]}]
        gaps = audit_transcript_gaps(recs, min_gap_seconds=10)
        assert len(gaps) == 1 and gaps[0]["gap_seconds"] == 25


class TestPyctcCompat:
    def test_build_and_decode(self):
        import numpy as np
        from dynamic_asr_eval_tpu.ops.pyctc_compat import CTCDecoder, decode_beams_lm
        from dynamic_asr_eval_tpu.text import CharTokenizer

        tok = CharTokenizer()
        V, blank = tok.vocab_size(), tok.blank_id
        ids = tok.encode("hi there")
        frames = []
        for i in ids:
            frames += [i, blank]
        lp = np.full((len(frames), V + 1), -8.0, np.float32)
        for t, k in enumerate(frames):
            lp[t, k] = 0.0
        lp -= np.log(np.exp(lp).sum(-1, keepdims=True))
        dec = CTCDecoder(tok, exclude_token_zero=False)
        assert dec.decode(lp, beam_width=1) == "hi there"
        texts, offsets = decode_beams_lm([lp], dec, beam_width=4, ds_factor=4)
        assert texts[0] == "hi there"
        assert offsets[0][0][0] == "hi"


class TestReplaceWithFrame:
    def test_all_frames_identical(self):
        import numpy as np
        import jax, jax.numpy as jnp
        from dynamic_asr_eval_tpu.augment import replace_with_frame

        s = jnp.asarray(np.random.default_rng(0).standard_normal((8, 20)), jnp.float32)
        out = np.asarray(replace_with_frame(s, jax.random.PRNGKey(0)))
        assert (out == out[:, :1]).all()
        # the chosen column exists in the source
        assert any(np.allclose(out[:, 0], np.asarray(s)[:, j]) for j in range(20))


class TestEvalForEachCpt:
    @pytest.mark.slow
    def test_iterates_checkpoints_and_reports_best(self, tmp_path, capsys):
        """Parity with lcasr/tedlium/bin/eval_for_each_cpt.py: every .ckpt in
        the folder is evaluated through the per-recording driver."""
        import jax
        import jax.numpy as jnp

        from dynamic_asr_eval_tpu.evals.eval_for_each_cpt import cli
        from dynamic_asr_eval_tpu.models import ConformerConfig, init_conformer
        from dynamic_asr_eval_tpu.models.checkpoint import save_checkpoint

        cfg = ConformerConfig(
            feat_in=80, n_layers=1, d_model=32, n_heads=2, head_dim=16,
            vocab_size=28, subsampling_factor=4, subsampling_conv_channels=8,
            conv_kernel_size=5, compute_dtype=jnp.float32,
        )
        for seed in (0, 1):
            _, variables = init_conformer(cfg, jax.random.PRNGKey(seed), 128)
            save_checkpoint(str(tmp_path / f"cpt_{seed}.ckpt"), variables, cfg)
        (tmp_path / "notes.txt").write_text("ignored")

        results = cli(["-cf", str(tmp_path), "-d", "synthetic", "--quiet",
                       "-kwargs", "epochs=0", "seq_len=512", "overlap=0"])
        assert [n for n, _ in results] == ["cpt_0.ckpt", "cpt_1.ckpt"]
        assert all(0.0 <= w <= 10.0 for _, w in results)
        assert "<- best" in capsys.readouterr().out


class TestConvert:
    def test_rule_mapping_and_unmatched(self):
        import numpy as np
        from dynamic_asr_eval_tpu.models.convert import convert_state_dict

        state = {
            "decoder.weight": np.zeros((29, 32), np.float32),
            "decoder.bias": np.zeros((29,), np.float32),
            "layers.0.attn.qkv.weight": np.zeros((96, 32), np.float32),
            "layers.0.conv.dw.weight": np.zeros((32, 1, 5), np.float32),
            "mystery.param": np.zeros((3,), np.float32),
        }
        tree, unmatched = convert_state_dict(state)
        assert tree["decoder"]["kernel"].shape == (32, 29)
        assert tree["layer_0"]["attn"]["qkv"]["kernel"].shape == (32, 96)
        assert tree["layer_0"]["conv"]["dw_kernel"].shape == (5, 1, 32)
        assert unmatched == ["mystery.param"]


class TestLMLoader:
    def test_lm_checkpoint_roundtrip_and_beamsearch(self, tmp_path):
        import jax
        from dynamic_asr_eval_tpu.lm.loader import (
            load_beamsearch, load_lm_checkpoint, save_lm_checkpoint,
        )
        from dynamic_asr_eval_tpu.lm.transformer_lm import TransformerLMConfig, init_lm
        from dynamic_asr_eval_tpu.text import CharTokenizer

        tok = CharTokenizer()
        cfg = TransformerLMConfig(vocab_size=tok.vocab_size(), n_layers=1,
                                  d_model=32, n_heads=2, max_cache_length=8)
        model, variables = init_lm(cfg, jax.random.PRNGKey(0))
        path = str(tmp_path / "lm.ckpt")
        save_lm_checkpoint(path, variables, cfg)
        m2, v2, c2 = load_lm_checkpoint(path)
        assert c2.d_model == 32

        fn = load_beamsearch(path, tok, alpha=0.2, beta=0.1)
        V, blank = tok.vocab_size(), tok.blank_id
        ids = tok.encode("hi")
        frames = []
        for i in ids:
            frames += [i, blank]
        lp = np.full((len(frames), V + 1), -8.0, np.float32)
        for t, k in enumerate(frames):
            lp[t, k] = 0.0
        lp -= np.log(np.exp(lp).sum(-1, keepdims=True))
        text = fn(lp, beam_width=4)
        assert isinstance(text, str)

        # device-resident path: collapsing + decoding the engine's device
        # matrix (EngineOutput) must emit the SAME text as the host path,
        # including when the stitch buffer carries zero-count padding rows
        import jax.numpy as jnp

        from dynamic_asr_eval_tpu.tta.runner import EngineOutput

        pad = 5
        lp_padded = np.concatenate([lp, np.zeros((pad, V + 1), np.float32)])
        counts = np.concatenate([np.ones((lp.shape[0],), np.float32),
                                 np.zeros((pad,), np.float32)])
        out = EngineOutput(jnp.asarray(lp_padded), jnp.asarray(counts),
                           None, 0.0, blank)
        assert fn.from_engine_output(out, beam_width=4) == text


class TestLexiconReviewRegressions:
    def test_incomplete_final_word_not_returned(self):
        """Audio ending mid-word must not emit a non-lexicon fragment."""
        from dynamic_asr_eval_tpu.ops.lexicon import word_beam_search

        tok = CharTokenizer()
        V, blank = tok.vocab_size(), tok.blank_id
        ids = tok.encode("ac")  # spells a prefix of nothing in lexicon
        frames = []
        for i in ids:
            frames += [i, blank]
        lp = np.full((len(frames), V + 1), -5.0, np.float32)
        for t, k in enumerate(frames):
            lp[t, k] = 0.0
        lp -= np.log(np.exp(lp).sum(-1, keepdims=True))
        out = word_beam_search(lp, ["ab", "ca", "b"], tok, beam_width=8)
        assert out == "" or all(w in {"ab", "ca", "b"} for w in out.split())

    def test_token_zero_symbol_decodable(self):
        """Vocabs with a real symbol at id 0 must still decode it."""
        from dynamic_asr_eval_tpu.ops.lexicon import word_beam_search

        tok = CharTokenizer(alphabet="abc ")  # 'a'=0, separator ' '=3
        V, blank = tok.vocab_size(), tok.blank_id
        ids = tok.encode("ab ca")
        frames = []
        for i in ids:
            frames += [i, blank]
        lp = np.full((len(frames), V + 1), -5.0, np.float32)
        for t, k in enumerate(frames):
            lp[t, k] = 0.0
        lp -= np.log(np.exp(lp).sum(-1, keepdims=True))
        out = word_beam_search(lp, ["ab", "ca"], tok, separator_id=3, beam_width=8)
        assert out == "ab ca"
