"""KenLM-scale ARPA stress test (VERDICT r3 ask #9).

The reference fuses a multi-million-n-gram KenLM (``4gram_big.arpa.gz``,
``.MISSING_LARGE_BLOBS:1``) through pyctcdecode.  The toy ARPA fixtures in
``test_arpa_native.py`` prove parser parity but say nothing about behavior at
real scale, where (a) build time/memory matter and (b) 32-bit hi-key
collisions are ROUTINE (≈ n²/2³³ duplicate-hi pairs — ~120 at 1M rows), so
the build-time probe-width audit (``ngram.probe_width``) is load-bearing: a
probe shorter than the longest equal-hi run silently turns table hits into
backoffs.

This suite generates a synthetic ~1M-row 3-gram ARPA, builds token- and
word-level tables through the same loaders the product uses, and asserts
build-time/memory bounds plus EXACT score retrieval — specifically including
rows that live inside duplicate-hi32 probe runs.
"""

import pytest

pytestmark = pytest.mark.slow  # ~1M-row ARPA build stress

import time

import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_asr_eval_tpu.lm.ngram import (
    LOG10,
    load_arpa,
    load_word_arpa,
    probe_width,
)

VOCAB = 20_000
N_BIGRAMS = 600_000
N_TRIGRAMS = 400_000


def _unique_rows(rng, n, k, vocab):
    rows = rng.integers(0, vocab, size=(int(n * 1.1), k), dtype=np.int64)
    rows = np.unique(rows, axis=0)[:n]
    assert len(rows) >= 0.9 * n  # collisions are rare at this density
    return rows


@pytest.fixture(scope="module")
def big_arpa(tmp_path_factory):
    """~1M-row ARPA written in the standard text format, plus the exact
    (ids, logp) ground truth for every order."""
    rng = np.random.default_rng(0)
    uni = np.arange(VOCAB, dtype=np.int64)[:, None]
    bi = _unique_rows(rng, N_BIGRAMS, 2, VOCAB)
    tri = _unique_rows(rng, N_TRIGRAMS, 3, VOCAB)
    tables = {1: uni, 2: bi, 3: tri}
    logps = {k: np.round(-rng.uniform(0.5, 6.0, size=len(v)), 4)
             for k, v in tables.items()}
    backoffs = {k: np.round(-rng.uniform(0.0, 1.0, size=len(v)), 4)
                for k, v in tables.items() if k < 3}

    path = tmp_path_factory.mktemp("arpa_scale") / "big.arpa"
    with open(path, "w") as f:
        f.write("\\data\\\n")
        for k, v in tables.items():
            f.write(f"ngram {k}={len(v)}\n")
        f.write("\n")
        for k, rows in tables.items():
            f.write(f"\\{k}-grams:\n")
            lp, bo = logps[k], backoffs.get(k)
            words = [" ".join(f"w{t:05d}" for t in row) for row in rows]
            if bo is None:
                f.write("".join(f"{lp[i]}\t{words[i]}\n"
                                for i in range(len(rows))))
            else:
                f.write("".join(f"{lp[i]}\t{words[i]}\t{bo[i]}\n"
                                for i in range(len(rows))))
            f.write("\n")
        f.write("\\end\\\n")
    return str(path), tables, logps


def test_build_word_and_token_tables_at_scale(big_arpa):
    path, tables, logps = big_arpa
    n_total = sum(len(v) for v in tables.values())
    assert n_total > 1_000_000

    t0 = time.time()
    lm_w, word_to_id = load_word_arpa(path)
    build_s = time.time() - t0
    # the native C++ reader parses ~1M rows in single-digit seconds; 120 s
    # is the generous shared-machine ceiling — a quadratic parser blows it
    assert build_s < 120.0, f"word-table build took {build_s:.1f}s"
    assert len(word_to_id) == VOCAB
    assert all(len(lm_w.keys_hi[k]) == len(tables[k]) for k in (1, 2, 3))

    # memory: keys (2×u32) + logp + backoff (2×f32) ≈ 16 B/row
    nbytes = sum(
        int(a[k].nbytes)
        for k in (1, 2, 3)
        for a in (lm_w.keys_hi, lm_w.keys_lo, lm_w.logp, lm_w.backoff)
    )
    assert nbytes < 40 * n_total, f"tables use {nbytes / n_total:.0f} B/row"

    # token-level loader on the same file (identity token map)
    t0 = time.time()
    lm_t = load_arpa(path, dict(word_to_id), VOCAB)
    assert time.time() - t0 < 120.0
    for k in (1, 2, 3):
        np.testing.assert_array_equal(
            np.asarray(lm_t.keys_hi[k]), np.asarray(lm_w.keys_hi[k]))
        np.testing.assert_allclose(
            np.asarray(lm_t.logp[k]), np.asarray(lm_w.logp[k]))

    _check_collisions_and_scores(lm_w, tables, logps)


def _check_collisions_and_scores(lm, tables, logps):
    # -- probe-width audit under REAL collision density -------------------
    hi3 = np.asarray(lm.keys_hi[3])
    runs = _max_equal_run(np.sort(hi3))
    assert runs >= 2, (
        "expected duplicate hi-32 keys at 400k rows — the stress fixture "
        "no longer exercises collision handling")
    assert lm.probe[3] >= runs

    # -- exact retrieval: random rows AND rows inside collision runs ------
    rng = np.random.default_rng(1)
    tri = tables[3]
    pick = rng.integers(0, len(tri), size=200)

    # find trigrams whose hash-hi collides with a different row's
    sort_idx = np.argsort(hi3, kind="stable")
    dup_mask = np.zeros(len(hi3), bool)
    s = hi3[sort_idx]
    eq = s[1:] == s[:-1]
    dup_sorted = np.zeros(len(hi3), bool)
    dup_sorted[1:] |= eq
    dup_sorted[:-1] |= eq
    dup_mask[sort_idx] = dup_sorted
    # map table-row order back to input order: keys were sorted at build, so
    # instead re-hash the input rows and test membership in colliding keys
    from dynamic_asr_eval_tpu.lm.ngram import _hash_ctx

    colliding_his = set(np.asarray(s[np.concatenate([[False], eq]) |
                                     np.concatenate([eq, [False]])]).tolist())
    in_run = [i for i in range(len(tri))
              if (_hash_ctx(tri[i].tolist()) >> 32) in colliding_his]
    assert in_run, "no input trigram maps into a collision run?"
    pick = np.concatenate([pick, np.asarray(in_run[:50])])

    ctx = jnp.asarray(tri[pick][:, :2].astype(np.int32))
    lens = jnp.full((len(pick),), 2, jnp.int32)
    cand = jnp.asarray(tri[pick][:, 2:3].astype(np.int32))
    got = np.asarray(lm.score_candidates(ctx, lens, cand))[:, 0]
    want = logps[3][pick] * LOG10
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def _max_equal_run(sorted_arr):
    if len(sorted_arr) == 0:
        return 0
    change = np.nonzero(np.diff(sorted_arr))[0]
    bounds = np.concatenate([[-1], change, [len(sorted_arr) - 1]])
    return int(np.max(np.diff(bounds)))


def test_probe_width_covers_engineered_collision_runs():
    """probe_width must equal the longest duplicate run even when far above
    the minimum — e.g. an adversarial table where one hi-32 value repeats
    30×, denser than anything birthday statistics produce at KenLM scale."""
    rng = np.random.default_rng(2)
    hi = np.sort(rng.integers(0, 2**32, size=10_000, dtype=np.uint64)
                 .astype(np.uint32))
    hi[4000:4030] = hi[4000]  # engineered 30-run
    hi = np.sort(hi)
    assert probe_width(hi) >= 30
