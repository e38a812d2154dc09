"""Native Levenshtein (native/levenshtein.cc) vs the pure-Python DP.

The C path must reproduce text/wer.py::_edit_ops bit-for-bit — same unit
costs and the same sub < del < ins tie-break — so corpus WER detail is
identical whichever backend runs."""

import os

import numpy as np
import pytest

from dynamic_asr_eval_tpu.text import wer as wer_mod
from dynamic_asr_eval_tpu.text.wer import word_error_rate_detail


def _python_detail(hyps, refs, use_cer=False):
    os.environ["DAE_NO_NATIVE_LEV"] = "1"
    try:
        return word_error_rate_detail(hyps, refs, use_cer=use_cer)
    finally:
        del os.environ["DAE_NO_NATIVE_LEV"]


@pytest.fixture(scope="module")
def native_lib():
    lib = wer_mod._native_lev()
    if lib is None:
        pytest.skip("native levenshtein unavailable (no toolchain)")
    return lib


def _rand_corpus(rng, n, vocab, max_len):
    out = []
    for _ in range(n):
        L = int(rng.integers(0, max_len))
        out.append(" ".join(rng.choice(vocab, size=L)))
    return out


class TestNativeLevenshtein:
    def test_matches_python_on_random_corpus(self, native_lib):
        rng = np.random.default_rng(0)
        vocab = np.array([f"w{i}" for i in range(30)])
        hyps = _rand_corpus(rng, 40, vocab, 25)
        refs = _rand_corpus(rng, 40, vocab, 25)
        nat = word_error_rate_detail(hyps, refs)
        py = _python_detail(hyps, refs)
        assert nat == py

    def test_matches_python_cer(self, native_lib):
        rng = np.random.default_rng(1)
        letters = np.array(list("abcdef "))
        hyps = ["".join(rng.choice(letters, size=int(rng.integers(0, 40))))
                for _ in range(20)]
        refs = ["".join(rng.choice(letters, size=int(rng.integers(0, 40))))
                for _ in range(20)]
        nat = word_error_rate_detail(hyps, refs, use_cer=True)
        py = _python_detail(hyps, refs, use_cer=True)
        assert nat == py

    def test_empty_cases(self, native_lib):
        assert word_error_rate_detail([""], ["a b"])[0] == 1.0  # 2 del / 2
        assert word_error_rate_detail(["a b"], [""])[0] == float("inf")
        assert word_error_rate_detail([""], [""])[0] == 0.0
        nat, py = word_error_rate_detail([], []), _python_detail([], [])
        assert nat[:2] == py[:2] == (0.0, 0)
        assert all(np.isnan(v) for v in nat[2:]) and all(np.isnan(v) for v in py[2:])

    def test_known_alignment(self, native_lib):
        # ref "the cat sat", hyp "the fat cat" -> sub(fat/cat)... the minimal
        # alignment is 1 sub + 1 ins + 1 del OR 2 subs; tie-break prefers sub.
        w, n, ins, dl, sub = word_error_rate_detail(["the fat cat"], ["the cat sat"])
        pw, pn, pins, pdl, psub = _python_detail(["the fat cat"], ["the cat sat"])
        assert (w, n, ins, dl, sub) == (pw, pn, pins, pdl, psub)
        assert n == 3 and w == pytest.approx(2 / 3)

    def test_long_transcript_speed_sanity(self, native_lib):
        # an hour-long transcript pair (~9k words) must align well under a
        # second natively — this is the per-recording driver cost
        rng = np.random.default_rng(2)
        vocab = np.array([f"w{i}" for i in range(500)])
        ref = " ".join(rng.choice(vocab, size=9000))
        hyp_words = rng.choice(vocab, size=9000)
        keep = rng.random(9000) > 0.1
        hyp = " ".join(np.asarray(ref.split())[keep].tolist()
                       + hyp_words[:300].tolist())
        import time

        t0 = time.time()
        w, n, *_ = word_error_rate_detail([hyp], [ref])
        assert time.time() - t0 < 2.0
        assert n == 9000 and 0.0 < w < 1.0
