"""Native C++ ARPA reader (native/arpa_reader.cc) vs the pure-Python parser.

The native reader is the TPU build's counterpart of KenLM's C++ loader
(reference path: pyctcdecode + kenlm, wav2vec2/tedlium/run.py:127-133).
These tests build the shared library on demand and assert the two parsers
produce bit-identical NGramLM tables and scores, on both plain and gzipped
files."""

import gzip
import os

import numpy as np
import pytest

from dynamic_asr_eval_tpu.lm import arpa_native
from dynamic_asr_eval_tpu.lm.ngram import load_arpa, load_word_arpa

ARPA = """\
\\data\\
ngram 1=5
ngram 2=4
ngram 3=2

\\1-grams:
-1.0\t<s>\t-0.30103
-1.2\tthe\t-0.2
-1.5\tcat\t-0.1
-1.7\tsat\t-0.15
-2.0\t</s>

\\2-grams:
-0.5\t<s> the\t-0.05
-0.4\tthe cat\t-0.02
-0.6\tcat sat\t-0.01
-0.9\tsat </s>

\\3-grams:
-0.2\t<s> the cat
-0.3\tthe cat sat

\\end\\
"""


@pytest.fixture(scope="module")
def arpa_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("arpa")
    plain = d / "toy.arpa"
    plain.write_text(ARPA)
    gz = d / "toy.arpa.gz"
    with gzip.open(gz, "wt") as f:
        f.write(ARPA)
    return str(plain), str(gz)


needs_native = pytest.mark.skipif(
    not arpa_native.available(), reason="native ARPA reader failed to build"
)


@needs_native
class TestNativeReader:
    def test_parse_raw(self, arpa_paths):
        plain, _ = arpa_paths
        vocab, tables = arpa_native.parse_arpa(plain)
        assert set(tables) == {1, 2, 3}
        assert tables[1][0].shape == (5, 1)
        assert tables[2][0].shape == (4, 2)
        assert tables[3][0].shape == (2, 3)
        # unigram interning order = file order
        assert vocab[:5] == ["<s>", "the", "cat", "sat", "</s>"]
        np.testing.assert_allclose(tables[1][1], [-1.0, -1.2, -1.5, -1.7, -2.0])
        np.testing.assert_allclose(
            tables[1][2], [-0.30103, -0.2, -0.1, -0.15, 0.0]
        )
        np.testing.assert_allclose(tables[2][1], [-0.5, -0.4, -0.6, -0.9])
        # 3-grams have no backoff column
        np.testing.assert_allclose(tables[3][2], [0.0, 0.0])

    def test_gzip_matches_plain(self, arpa_paths):
        plain, gz = arpa_paths
        v1, t1 = arpa_native.parse_arpa(plain)
        v2, t2 = arpa_native.parse_arpa(gz)
        assert v1 == v2
        for k in t1:
            np.testing.assert_array_equal(t1[k][0], t2[k][0])
            np.testing.assert_array_equal(t1[k][1], t2[k][1])

    def test_max_order(self, arpa_paths):
        plain, _ = arpa_paths
        _, tables = arpa_native.parse_arpa(plain, max_order=2)
        assert set(tables) == {1, 2}

    def test_missing_file_raises(self):
        with pytest.raises((FileNotFoundError, RuntimeError)):
            arpa_native.parse_arpa("/nonexistent/nope.arpa")

    def test_load_arpa_native_matches_python(self, arpa_paths):
        plain, _ = arpa_paths
        tok2id = {"<s>": 0, "the": 1, "cat": 2, "sat": 3, "</s>": 4}
        lm_n = load_arpa(plain, tok2id, vocab_size=5, use_native=True)
        lm_p = load_arpa(plain, tok2id, vocab_size=5, use_native=False)
        assert lm_n.order == lm_p.order == 3
        for k in range(1, 4):
            np.testing.assert_array_equal(
                np.asarray(lm_n.keys_hi[k]), np.asarray(lm_p.keys_hi[k])
            )
            np.testing.assert_array_equal(
                np.asarray(lm_n.keys_lo[k]), np.asarray(lm_p.keys_lo[k])
            )
            np.testing.assert_allclose(
                np.asarray(lm_n.logp[k]), np.asarray(lm_p.logp[k]), rtol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(lm_n.backoff[k]), np.asarray(lm_p.backoff[k]), rtol=1e-6
            )

    def test_load_arpa_native_drops_unmapped(self, arpa_paths):
        plain, _ = arpa_paths
        # drop "sat" from the tokenizer: its n-grams must vanish identically
        tok2id = {"<s>": 0, "the": 1, "cat": 2, "</s>": 4}
        with pytest.warns(UserWarning):
            lm_n = load_arpa(plain, tok2id, vocab_size=5, use_native=True,
                             warn_drop_fraction=0.1)
        with pytest.warns(UserWarning):
            lm_p = load_arpa(plain, tok2id, vocab_size=5, use_native=False,
                             warn_drop_fraction=0.1)
        for k in list(lm_p.logp):
            np.testing.assert_array_equal(
                np.asarray(lm_n.keys_lo[k]), np.asarray(lm_p.keys_lo[k])
            )

    def test_load_word_arpa_native_matches_python(self, arpa_paths):
        plain, gz = arpa_paths
        lm_n, w2i_n = load_word_arpa(gz, use_native=True)
        lm_p, w2i_p = load_word_arpa(plain, use_native=False)
        assert w2i_n == w2i_p
        assert lm_n.vocab_size == lm_p.vocab_size == 5
        for k in range(1, 4):
            np.testing.assert_array_equal(
                np.asarray(lm_n.keys_hi[k]), np.asarray(lm_p.keys_hi[k])
            )
            np.testing.assert_allclose(
                np.asarray(lm_n.logp[k]), np.asarray(lm_p.logp[k]), rtol=1e-6
            )

    def test_scores_identical(self, arpa_paths):
        plain, _ = arpa_paths
        import jax.numpy as jnp

        tok2id = {"<s>": 0, "the": 1, "cat": 2, "sat": 3, "</s>": 4}
        lm_n = load_arpa(plain, tok2id, vocab_size=5, use_native=True)
        lm_p = load_arpa(plain, tok2id, vocab_size=5, use_native=False)
        ctx = jnp.asarray([[0, 1], [-1, 2]], jnp.int32)  # "<s> the", "cat"
        lens = jnp.asarray([2, 1], jnp.int32)
        np.testing.assert_allclose(
            np.asarray(lm_n.score_next(ctx, lens)),
            np.asarray(lm_p.score_next(ctx, lens)),
            rtol=1e-6,
        )

    def test_space_separated_variant(self, tmp_path):
        # some ARPA emitters use spaces everywhere instead of tabs
        p = tmp_path / "sp.arpa"
        p.write_text(ARPA.replace("\t", " "))
        vocab, tables = arpa_native.parse_arpa(str(p))
        assert tables[1][0].shape == (5, 1)
        np.testing.assert_allclose(tables[2][1], [-0.5, -0.4, -0.6, -0.9])


def test_hash_rows_matches_scalar():
    from dynamic_asr_eval_tpu.lm.ngram import _hash_ctx

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 5000, size=(64, 3)).astype(np.int64)
    vec = arpa_native.hash_rows(ids)
    for i in range(ids.shape[0]):
        assert int(vec[i]) == _hash_ctx([int(t) for t in ids[i]])
