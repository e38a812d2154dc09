"""Pseudo-label re-tokenization: quantifying and (opt-in) closing the one
documented LM-TTA divergence vs the reference (VERDICT r4 ask #3).

The reference builds CTC pseudo-targets from TEXT (``lcasr/lib.py:558-571``):
greedy ``decoder(...)`` / ``beam_search.return_text(0)`` → ``tokenizer.encode``.
Our engine uses the decoded token ids directly.  These tests (a) prove the
round trip is identity exactly when the decoded path is tokenizer-canonical,
(b) measure the divergence rate on non-canonical paths and greedy decodes,
and (c) verify ``pseudo_label_retokenize=True`` reproduces the reference
semantics inside the jitted adapt path via the host callback.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_asr_eval_tpu.config import TTAConfig
from dynamic_asr_eval_tpu.text.tokenizer import SentencePieceTokenizer
from dynamic_asr_eval_tpu.tta.retokenize import (
    divergence_report,
    make_retokenize_callback,
    retokenize,
)


def _spm():
    """Unigram SPM with merged pieces preferred over their char splits, so a
    character-level piece path is NON-canonical (like a real ASR spm model,
    where encode() picks the longest high-score segmentation)."""
    pieces = ["▁a", "b", "▁ab", "c", "▁c", "▁abc", "d", "▁d"]
    scores = [-2.0, -2.0, -1.0, -2.0, -2.0, -0.5, -2.0, -2.0]
    return SentencePieceTokenizer(pieces, scores, [1] * len(pieces))


class TestRoundTrip:
    def test_canonical_path_is_fixed_point(self):
        tok = _spm()
        for text in ("ab", "abc", "ab c", "c d", "abc ab d"):
            ids = tok.encode(text)
            assert retokenize(ids, tok) == ids
        rep = divergence_report(
            [tok.encode(t) for t in ("ab", "abc", "ab c")], tok)
        assert rep["rate"] == 0.0 and rep["text_preserved"] == 3

    def test_noncanonical_path_diverges_but_preserves_text(self):
        tok = _spm()
        # the char-level spelling of "ab": decode → "ab", re-encode → ["▁ab"]
        ids = [tok.pieces.index("▁a"), tok.pieces.index("b")]
        new = retokenize(ids, tok)
        assert new == [tok.pieces.index("▁ab")]
        assert tok.decode(new) == tok.decode(ids) == "ab"
        rep = divergence_report([ids], tok)
        assert rep["rate"] == 1.0
        assert rep["mean_len_delta"] == -1.0
        assert rep["text_preserved"] == 1

    def test_divergence_rate_on_random_piece_paths(self):
        """The quantification harness itself: random piece paths (worst case)
        vs canonical encodes (best case) — the documented bracket for the
        default id-path labels."""
        tok = _spm()
        rng = np.random.RandomState(0)
        random_paths = [
            [int(i) for i in rng.randint(0, tok.vocab_size(), size=rng.randint(1, 8))]
            for _ in range(200)
        ]
        rep = divergence_report(random_paths, tok)
        assert rep["text_preserved"] == rep["n_cases"]  # NEVER a transcript change
        assert rep["rate"] > 0.3  # random paths are mostly non-canonical
        canon = [retokenize(p, tok) for p in random_paths]
        rep2 = divergence_report(canon, tok)
        assert rep2["rate"] == 0.0  # one round trip reaches the fixed point

    def test_callback_shapes_and_truncation(self):
        tok = _spm()
        cb = make_retokenize_callback(tok, max_tokens=4)
        labels = np.zeros((4,), np.int32)
        labels[:2] = [tok.pieces.index("▁a"), tok.pieces.index("b")]
        out, n = cb(labels, np.int32(2))
        assert out.shape == (4,) and out.dtype == np.int32
        assert int(n) == 1 and int(out[0]) == tok.pieces.index("▁ab")
        assert not out[1:].any()
        # truncation: 6 canonical singles re-encode to 6 > max_tokens=4
        ids = tok.encode("c d") * 3  # [▁c, ▁d] * 3 — already canonical, len 6
        labels6 = np.zeros((8,), np.int32)
        labels6[:6] = ids
        cb8 = make_retokenize_callback(tok, max_tokens=4)
        out, n = cb8(labels6, np.int32(6))
        assert int(n) == 4 and list(out) == ids[:4]
        # empty in → empty out
        out, n = cb(np.zeros((4,), np.int32), np.int32(0))
        assert int(n) == 0 and not out.any()


class TestEnginePath:
    def _engine(self, tok, retok: bool, **cfg_kw):
        cfg = TTAConfig(seq_len=64, overlap=0, epochs=1, online=True,
                        shuffle=False, lm_tta_beams=0,
                        pseudo_label_retokenize=retok, **cfg_kw)
        from dynamic_asr_eval_tpu.tta import DynamicEvalEngine

        return DynamicEvalEngine(
            model=None, blank_id=tok.vocab_size(), subsampling_factor=4,
            config=cfg, tokenizer=tok if retok else None,
        )

    def _char_path_lp(self, tok):
        """Logits whose greedy decode is the NON-canonical [▁a, b] path."""
        V = tok.vocab_size() + 1
        blank = tok.vocab_size()
        lp = np.full((6, V), -10.0, np.float32)
        lp[:, blank] = -0.1
        lp[1, :] = -10.0
        lp[1, tok.pieces.index("▁a")] = -0.05
        lp[3, :] = -10.0
        lp[3, tok.pieces.index("b")] = -0.05
        lp -= np.log(np.exp(lp).sum(-1, keepdims=True))
        return jnp.asarray(lp)

    def test_pseudo_labels_retokenized_under_jit(self):
        """The engine's jitted pseudo-label step with the exact mode ON must
        return the reference's re-encoded labels; OFF returns the raw greedy
        path (the quantified default)."""
        tok = _spm()
        lp = self._char_path_lp(tok)
        T = lp.shape[0]

        off = self._engine(tok, retok=False)
        labels, n = jax.jit(
            lambda l: off._pseudo_labels(l, jnp.asarray(T), 4))(lp)
        assert int(n) == 2
        assert [int(labels[0]), int(labels[1])] == [
            tok.pieces.index("▁a"), tok.pieces.index("b")]

        on = self._engine(tok, retok=True)
        labels, n = jax.jit(
            lambda l: on._pseudo_labels(l, jnp.asarray(T), 4))(lp)
        assert int(n) == 1
        assert int(labels[0]) == tok.pieces.index("▁ab")

    def test_requires_tokenizer(self):
        tok = _spm()
        with pytest.raises(ValueError, match="tokenizer"):
            from dynamic_asr_eval_tpu.tta import DynamicEvalEngine

            DynamicEvalEngine(
                model=None, blank_id=tok.vocab_size(), subsampling_factor=4,
                config=TTAConfig(pseudo_label_retokenize=True),
            )

    def test_batched_rejects_retokenize(self):
        tok = _spm()
        eng = self._engine(tok, retok=True)
        with pytest.raises(ValueError, match="dp_records"):
            eng.batched({"params": {}}, [np.zeros((4, 32), np.float32)])

    def test_build_engine_wires_tokenizer(self):
        """-kwargs pseudo_label_retokenize=true reaches the engine with the
        driver's tokenizer attached (evals/common.build_engine)."""
        from dynamic_asr_eval_tpu.evals.common import build_engine
        from dynamic_asr_eval_tpu.models import ConformerConfig, init_conformer

        cfg = ConformerConfig(
            feat_in=16, n_layers=1, d_model=32, n_heads=2, head_dim=16,
            vocab_size=8, subsampling_factor=4, subsampling_conv_channels=4,
            conv_kernel_size=5, compute_dtype=jnp.float32)
        model, _ = init_conformer(cfg, jax.random.PRNGKey(0), example_T=64)
        tok = _spm()
        args = argparse.Namespace(pseudo_label_retokenize=True)
        eng = build_engine(args, model, cfg, "dynamic_eval", tokenizer=tok)
        assert eng.tokenizer is tok
        assert eng.config.pseudo_label_retokenize is True
        args_off = argparse.Namespace()
        eng = build_engine(args_off, model, cfg, "dynamic_eval", tokenizer=tok)
        # tokenizer rides along (debug prints decode through it) but the
        # exact mode stays off by default
        assert eng.tokenizer is tok
        assert eng.config.pseudo_label_retokenize is False


@pytest.mark.slow
class TestEngineEndToEnd:
    def test_adapt_scan_with_retokenize_runs_and_matches_host_semantics(self):
        """Full tiny-engine run with the host callback inside the adapt scan:
        finite stitched output, and the adapted params match a run whose
        pseudo-labels were precomputed... cheaper and sharper: the engine
        with retokenize ON must differ from OFF exactly when greedy paths are
        non-canonical — with a CHAR tokenizer the round trip is identity, so
        ON == OFF bit-for-bit (plumbing adds nothing), which is what we
        assert here."""
        from dynamic_asr_eval_tpu.models import ConformerConfig, init_conformer
        from dynamic_asr_eval_tpu.text import CharTokenizer
        from dynamic_asr_eval_tpu.tta import DynamicEvalEngine

        tok = CharTokenizer()
        cfg = ConformerConfig(
            feat_in=16, n_layers=1, d_model=32, n_heads=2, head_dim=16,
            vocab_size=tok.vocab_size(), subsampling_factor=4,
            subsampling_conv_channels=4, conv_kernel_size=5,
            compute_dtype=jnp.float32)
        model, variables = init_conformer(cfg, jax.random.PRNGKey(0), example_T=64)
        spec = np.random.default_rng(0).standard_normal((16, 150)).astype(np.float32)

        def run(retok):
            tta = TTAConfig(seq_len=64, overlap=32, epochs=1, online=True,
                            shuffle=False, lm_tta_beams=0,
                            pseudo_label_retokenize=retok)
            eng = DynamicEvalEngine(model, cfg.blank_id, cfg.subsampling_factor,
                                    tta, tokenizer=tok if retok else None)
            return eng(variables, spec, rng=jax.random.PRNGKey(1))

        out_on = run(True)
        out_off = run(False)
        a, b = out_on.numpy_logits(), out_off.numpy_logits()
        assert np.isfinite(a).all()
        np.testing.assert_array_equal(a, b)
