import numpy as np
import pytest

import jax.numpy as jnp

from dynamic_asr_eval_tpu.ops.chunk import (
    chunk_spectrogram,
    chunk_starts_and_lengths,
    num_chunks,
    pad_num_chunks,
)
from dynamic_asr_eval_tpu.ops.stitch import stitch_chunk_probs, trim_stitched


def reference_chunk_plan(spec_n, seq_len, overlap):
    """Independent re-statement of the reference prepare_chunks rule
    (lcasr/lib.py:128-145) for cross-checking."""
    if spec_n <= seq_len:
        return [(0, spec_n)]
    out = []
    last_ulen, kill_next = None, False
    for i in range(0, spec_n, seq_len - overlap):
        u_len = min(seq_len, spec_n - i)
        if kill_next:
            break
        if last_ulen is not None and u_len < last_ulen:
            kill_next = True
        last_ulen = u_len
        out.append((i, u_len))
    return out


class TestChunkPlan:
    @pytest.mark.parametrize(
        "spec_n,seq_len,overlap",
        [
            (100, 40, 20),
            (16384, 16384, 14336),
            (100000, 16384, 14336),
            (16385, 16384, 14336),
            (5, 40, 20),
            (40, 40, 0),
            (41, 40, 0),
            (123457, 4096, 3584),
        ],
    )
    def test_matches_reference_rule(self, spec_n, seq_len, overlap):
        starts, lengths = chunk_starts_and_lengths(spec_n, seq_len, overlap)
        expected = reference_chunk_plan(spec_n, seq_len, overlap)
        assert list(zip(starts, lengths)) == expected
        assert num_chunks(spec_n, seq_len, overlap) == len(expected)

    def test_coverage(self):
        # every frame of the spectrogram is inside at least one window
        starts, lengths = chunk_starts_and_lengths(100000, 16384, 14336)
        covered = np.zeros(100000, dtype=bool)
        for s, L in zip(starts, lengths):
            covered[s : s + L] = True
        assert covered.all()

    def test_bucket_padding(self):
        assert pad_num_chunks(1) == 4
        assert pad_num_chunks(4) == 4
        assert pad_num_chunks(5) == 5
        assert pad_num_chunks(41) == 44  # octave step 4
        assert pad_num_chunks(196) == 208  # octave step 16 (was 256 at pow2)
        # waste is bounded at 12.5%, shape count at 8 buckets per octave
        for n in range(4, 3000):
            b = pad_num_chunks(n)
            assert b >= n and (b - n) / n <= 0.125 + 1e-9
        assert len({pad_num_chunks(n) for n in range(256, 512)}) <= 9

    def test_chunk_spectrogram_shapes(self):
        spec = np.random.default_rng(0).standard_normal((80, 1000)).astype(np.float32)
        windows, lengths, starts, n_real = chunk_spectrogram(spec, 400, 350, min_bucket=4)
        assert windows.shape[1:] == (80, 400)
        assert n_real <= windows.shape[0]
        for i in range(n_real):
            L = lengths[i]
            np.testing.assert_array_equal(windows[i, :, :L], spec[:, starts[i] : starts[i] + L])
            assert (windows[i, :, L:] == 0).all()
        assert (lengths[n_real:] == 0).all()

    def test_single_chunk_short_spec(self):
        spec = np.ones((80, 300), dtype=np.float32)
        windows, lengths, starts, n_real = chunk_spectrogram(spec, 400, 350)
        assert n_real == 1
        assert windows.shape[2] == 300
        assert lengths[0] == 300


class TestStitch:
    def test_identity_on_single_window(self):
        rng = np.random.default_rng(1)
        probs = rng.uniform(0.1, 1.0, size=(1, 10, 4)).astype(np.float32)
        out, counts = stitch_chunk_probs(
            jnp.asarray(probs), jnp.asarray([10]), jnp.asarray([0]), total_ds=12
        )
        trimmed = trim_stitched(out, counts)
        np.testing.assert_allclose(trimmed, np.log(probs[0]), rtol=1e-5)

    def test_overlap_average(self):
        # two windows overlapping by 2 frames; overlapping region must average
        w0 = np.full((6, 3), 0.2, dtype=np.float32)
        w1 = np.full((6, 3), 0.4, dtype=np.float32)
        probs = np.stack([w0, w1])
        out, counts = stitch_chunk_probs(
            jnp.asarray(probs),
            jnp.asarray([6, 6]),
            jnp.asarray([0, 4]),
            total_ds=10,
        )
        out = np.asarray(out)
        counts = np.asarray(counts)
        np.testing.assert_allclose(counts, [1, 1, 1, 1, 2, 2, 1, 1, 1, 1])
        np.testing.assert_allclose(np.exp(out[:4]), 0.2, rtol=1e-5)
        np.testing.assert_allclose(np.exp(out[4:6]), 0.3, rtol=1e-5)
        np.testing.assert_allclose(np.exp(out[6:]), 0.4, rtol=1e-5)

    def test_padded_windows_ignored(self):
        w0 = np.full((5, 2), 0.5, dtype=np.float32)
        pad = np.zeros((5, 2), dtype=np.float32)
        probs = np.stack([w0, pad])
        out, counts = stitch_chunk_probs(
            jnp.asarray(probs),
            jnp.asarray([5, 0]),
            jnp.asarray([0, 0]),
            total_ds=6,
        )
        counts = np.asarray(counts)
        np.testing.assert_allclose(counts[:5], 1)
        assert counts[5] == 0
        trimmed = trim_stitched(out, counts)
        assert trimmed.shape == (5, 2)
        np.testing.assert_allclose(np.exp(trimmed), 0.5, rtol=1e-5)
