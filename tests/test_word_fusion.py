"""Word-boundary KenLM fusion tests (reference: pyctcdecode + 4gram_big
word-level ARPA, wav2vec2/tedlium/run.py:127-133).

Verifies the device adapter against brute-force host scoring on a toy
corpus, that a word-level LM measurably changes a char-vocab decode, and
that the token-level loader now warns loudly on vocabulary mismatch.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_asr_eval_tpu.lm.ngram import load_arpa, load_word_arpa
from dynamic_asr_eval_tpu.lm.word_fusion import (
    WordNGramAdapter,
    _hash_bytes,
)
from dynamic_asr_eval_tpu.text import CharTokenizer

LOG10 = math.log(10.0)

TOY_ARPA = """\\data\\
ngram 1=6
ngram 2=4

\\1-grams:
-1.0\t<s>\t-0.5
-2.0\t</s>
-1.3\tthe\t-0.4
-1.7\tcat\t-0.3
-1.9\tdog\t-0.2
-2.2\tsat\t-0.1

\\2-grams:
-0.3\t<s> the
-0.5\tthe cat
-0.9\tthe dog
-1.1\tcat sat

\\end\\
"""


@pytest.fixture(scope="module")
def toy_arpa(tmp_path_factory):
    p = tmp_path_factory.mktemp("arpa") / "toy.arpa"
    p.write_text(TOY_ARPA)
    return str(p)


def brute_force_word_score(words, unis, bis, unk=-20.0 / LOG10):
    """KenLM backoff scoring of a word sequence given dicts of
    (log10 p, log10 backoff) — natural-log result."""
    total = 0.0
    hist = "<s>"
    for w in words:
        if (hist, w) in bis:
            total += bis[(hist, w)] * LOG10
        elif w in unis:
            bo = unis[hist][1] if hist in unis else 0.0
            total += (bo + unis[w][0]) * LOG10
        else:
            total += unk * LOG10
        hist = w
    return total


UNIS = {"<s>": (-1.0, -0.5), "</s>": (-2.0, 0.0), "the": (-1.3, -0.4),
        "cat": (-1.7, -0.3), "dog": (-1.9, -0.2), "sat": (-2.2, -0.1)}
BIS = {("<s>", "the"): -0.3, ("the", "cat"): -0.5,
       ("the", "dog"): -0.9, ("cat", "sat"): -1.1}


class TestWordAdapter:
    def test_device_hash_matches_host(self, toy_arpa):
        tok = CharTokenizer()
        lm, w2i = load_word_arpa(toy_arpa)
        ad = WordNGramAdapter(lm, w2i, tok)
        state, _ = ad.init_state(1)
        for ch in "cat":
            ids = jnp.asarray([tok.encode(ch)[0]], jnp.int32)
            state, _ = ad.advance(state, ids, jnp.asarray([True]))
        _, _, h_hi, h_lo, wlen, _ = state
        h = (int(h_hi[0]) << 32) | int(h_lo[0])
        assert h == _hash_bytes("cat")
        assert int(wlen[0]) == 3
        found, wid = ad._word_id(h_hi, h_lo)
        assert bool(found[0]) and int(wid[0]) == w2i["cat"]

    def test_close_scores_match_brute_force(self, toy_arpa):
        """Drive the adapter over 'the cat sat ' character by character; the
        sum of close scores fired at separators must equal brute-force
        backoff scoring of the completed words."""
        tok = CharTokenizer()
        lm, w2i = load_word_arpa(toy_arpa)
        ad = WordNGramAdapter(lm, w2i, tok)
        state, lps = ad.init_state(1)
        total = 0.0
        for ch in "the cat sat ":
            tid = tok.encode(ch)[0]
            total += float(lps[0, tid])  # score charged when emitting tid
            state, lps = ad.advance(
                state, jnp.asarray([tid], jnp.int32), jnp.asarray([True])
            )
        expect = brute_force_word_score(["the", "cat", "sat"], UNIS, BIS)
        assert abs(total - expect) < 1e-4, (total, expect)

    def test_final_unterminated_word_scored(self, toy_arpa):
        """pyctcdecode scores the LAST word of an utterance at finalization
        even without a trailing separator: close scores over 'the cat' (no
        final space) plus final_scores must equal brute force over both
        words."""
        tok = CharTokenizer()
        lm, w2i = load_word_arpa(toy_arpa)
        ad = WordNGramAdapter(lm, w2i, tok)
        state, lps = ad.init_state(1)
        total = 0.0
        for ch in "the cat":  # note: no trailing separator
            tid = tok.encode(ch)[0]
            total += float(lps[0, tid])
            state, lps = ad.advance(
                state, jnp.asarray([tid], jnp.int32), jnp.asarray([True])
            )
        total += float(ad.final_scores(state)[0])
        expect = brute_force_word_score(["the", "cat"], UNIS, BIS)
        assert abs(total - expect) < 1e-4, (total, expect)
        # nothing pending → finalization adds nothing
        state2, _ = ad.init_state(1)
        assert float(ad.final_scores(state2)[0]) == 0.0

    def test_final_word_changes_beam_ranking(self, toy_arpa):
        """End-to-end: an utterance ENDING mid-word ('the ca[x|t]') must let
        the word LM flip the final-word choice in both searches."""
        from dynamic_asr_eval_tpu.ops.pyctc_compat import build_ctcdecoder

        tok = CharTokenizer()
        V = tok.vocab_size() + 1
        blank = V - 1

        def frame(char=None, margin=None):
            row = np.full((V,), -15.0, np.float32)
            row[blank] = -6.0
            if char is not None:
                row[tok.encode(char)[0]] = 0.0
            if margin is not None:
                a, la, b, lb = margin
                row[tok.encode(a)[0]] = la
                row[tok.encode(b)[0]] = lb
            return row

        rows = []
        for ch in "the ca":
            rows.append(frame(ch))
            rows.append(frame())
        rows.append(frame(margin=("x", -0.55, "t", -0.85)))
        rows.append(frame())  # stream ends here — no separator after the word
        lp = np.stack(rows)
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))

        no_lm = build_ctcdecoder(tok)
        with_lm = build_ctcdecoder(tok, kenlm_model_path=toy_arpa,
                                   alpha=0.6, beta=0.0, lm_level="word")
        assert no_lm.decode(lp, beam_width=8).strip() == "the cax"
        assert with_lm.decode(lp, beam_width=8).strip() == "the cat"

    def test_oov_word_gets_unk_penalty(self, toy_arpa):
        tok = CharTokenizer()
        lm, w2i = load_word_arpa(toy_arpa)
        ad = WordNGramAdapter(lm, w2i, tok, unk_logp=-20.0)
        state, lps = ad.init_state(1)
        total = 0.0
        for ch in "zzz ":
            tid = tok.encode(ch)[0]
            total += float(lps[0, tid])
            state, lps = ad.advance(
                state, jnp.asarray([tid], jnp.int32), jnp.asarray([True])
            )
        assert total == pytest.approx(-20.0, abs=1e-4)

    def test_partial_lookahead_penalizes_oov_prefix_midword(self, toy_arpa):
        """pyctcdecode score_partial_token: mid-word, a partial that is no
        lexicon word's prefix carries a provisional unk penalty; an in-vocab
        prefix carries none.  Telescoping removes it at the boundary."""
        tok = CharTokenizer()
        lm, w2i = load_word_arpa(toy_arpa)
        ad = WordNGramAdapter(lm, w2i, tok, unk_score_offset=-10.0)

        def drive(text):
            state, lps = ad.init_state(1)
            total = 0.0
            for ch in text:
                tid = tok.encode(ch)[0]
                total += float(lps[0, tid])
                state, lps = ad.advance(
                    state, jnp.asarray([tid], jnp.int32), jnp.asarray([True])
                )
            return total, state

        in_vocab, _ = drive("ca")   # prefix of 'cat' → no penalty
        oov, _ = drive("cx")        # no lexicon word starts with 'cx'
        assert in_vocab == pytest.approx(0.0, abs=1e-5)
        assert oov == pytest.approx(-10.0, abs=1e-5)

        # penalty scales past AVG_TOKEN_LEN (6): 8 bytes → ×8/6
        long_oov, _ = drive("cxxxxxxx")
        assert long_oov == pytest.approx(-10.0 * 8 / 6, abs=1e-4)

        # ...and telescopes away once the word closes: the completed-word
        # total equals pure backoff scoring regardless of the lookahead
        closed, state = drive("cxxxxxxx ")
        no_la = WordNGramAdapter(lm, w2i, tok, unk_score_offset=None,
                                 unk_logp=-20.0)
        ref_total = 0.0
        st2, lps2 = no_la.init_state(1)
        for ch in "cxxxxxxx ":
            tid = tok.encode(ch)[0]
            ref_total += float(lps2[0, tid])
            st2, lps2 = no_la.advance(
                st2, jnp.asarray([tid], jnp.int32), jnp.asarray([True])
            )
        assert closed == pytest.approx(ref_total, abs=1e-4)

    def test_partial_lookahead_final_scores_retire_penalty(self, toy_arpa):
        """Ending mid-word: final_scores must both score the pending word AND
        retire the provisional penalty, matching the no-lookahead total."""
        tok = CharTokenizer()
        lm, w2i = load_word_arpa(toy_arpa)
        for offset in (-10.0, None):
            ad = WordNGramAdapter(lm, w2i, tok, unk_score_offset=offset)
            state, lps = ad.init_state(1)
            total = 0.0
            for ch in "the zq":  # ends inside OOV partial 'zq'
                tid = tok.encode(ch)[0]
                total += float(lps[0, tid])
                state, lps = ad.advance(
                    state, jnp.asarray([tid], jnp.int32), jnp.asarray([True])
                )
            total += float(ad.final_scores(state)[0])
            expect = brute_force_word_score(["the", "zq"], UNIS, BIS)
            assert total == pytest.approx(expect, abs=1e-4), offset

    def test_history_survives_gather(self, toy_arpa):
        tok = CharTokenizer()
        lm, w2i = load_word_arpa(toy_arpa)
        ad = WordNGramAdapter(lm, w2i, tok)
        state, _ = ad.init_state(4)
        idx = jnp.asarray([2, 0, 1, 3])
        g = ad.gather(state, idx)
        assert g[0].shape == state[0].shape


class TestWordLevelDecode:
    def _ambiguous_logits(self, tok):
        """AM narrowly prefers 'the cax ' over 'the cat ' — the word LM must
        flip the decode to the in-vocabulary word."""
        V = tok.vocab_size() + 1
        blank = V - 1

        def frame(char=None, margin=None):
            row = np.full((V,), -15.0, np.float32)
            row[blank] = -6.0
            if char is not None:
                row[tok.encode(char)[0]] = 0.0
            if margin is not None:  # (char_a, lp_a, char_b, lp_b)
                a, la, b, lb = margin
                row[tok.encode(a)[0]] = la
                row[tok.encode(b)[0]] = lb
            return row

        rows = []
        for ch in "the ca":
            rows.append(frame(ch))
            rows.append(frame())  # blank spacer
        rows.append(frame(margin=("x", -0.55, "t", -0.85)))
        rows.append(frame())
        rows.append(frame(" "))
        rows.append(frame())
        lp = np.stack(rows)
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        return lp

    def test_word_lm_changes_decode(self, toy_arpa):
        from dynamic_asr_eval_tpu.ops.pyctc_compat import build_ctcdecoder

        tok = CharTokenizer()
        lp = self._ambiguous_logits(tok)

        no_lm = build_ctcdecoder(tok)
        with_lm = build_ctcdecoder(tok, kenlm_model_path=toy_arpa,
                                   alpha=0.6, beta=0.0, lm_level="word")
        base = no_lm.decode(lp, beam_width=8)
        fused = with_lm.decode(lp, beam_width=8)
        assert base.strip() == "the cax"
        assert fused.strip() == "the cat"

    def test_auto_detects_word_level(self, toy_arpa):
        from dynamic_asr_eval_tpu.ops.pyctc_compat import build_ctcdecoder

        tok = CharTokenizer()
        dec = build_ctcdecoder(tok, kenlm_model_path=toy_arpa, lm_level="auto")
        assert dec.word_adapter is not None  # words aren't char pieces


class TestDropWarning:
    def test_token_level_load_warns_on_word_arpa(self, toy_arpa):
        tok = CharTokenizer()
        token_to_id = {tok.id_to_piece(i): i for i in range(tok.vocab_size())}
        with pytest.warns(UserWarning, match="WORD-level"):
            load_arpa(toy_arpa, token_to_id, tok.vocab_size())
