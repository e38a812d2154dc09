import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from dynamic_asr_eval_tpu.ops.ctc import ctc_loss, greedy_labels, greedy_decode
from dynamic_asr_eval_tpu.text import CharTokenizer


def _rand_batch(rng, B, T, V, Umax, blank_id):
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    input_lengths = rng.integers(Umax * 2 + 2, T + 1, size=(B,))
    label_lengths = rng.integers(0, Umax + 1, size=(B,))
    labels = rng.integers(0, V - 1, size=(B, Umax))  # never the blank
    labels = np.where(np.arange(Umax)[None, :] < label_lengths[:, None], labels, 0)
    return np.asarray(log_probs), input_lengths, labels, label_lengths


@pytest.mark.slow
class TestCTCLossVsTorch:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_torch_sum(self, seed):
        rng = np.random.default_rng(seed)
        B, T, V, Umax = 4, 32, 11, 8
        blank = V - 1
        lp, in_len, labels, lab_len = _rand_batch(rng, B, T, V, Umax, blank)

        ours = float(
            ctc_loss(
                jnp.asarray(lp),
                jnp.asarray(in_len),
                jnp.asarray(labels),
                jnp.asarray(lab_len),
                blank_id=blank,
            )
        )

        t_lp = torch.tensor(lp).transpose(0, 1)  # [T, B, V]
        fn = torch.nn.CTCLoss(blank=blank, reduction="sum", zero_infinity=False)
        theirs = float(
            fn(
                t_lp,
                torch.tensor(labels),
                torch.tensor(in_len),
                torch.tensor(lab_len),
            )
        )
        assert ours == pytest.approx(theirs, rel=1e-4, abs=1e-3)

    def test_blank_zero_convention(self):
        rng = np.random.default_rng(3)
        B, T, V, Umax = 2, 20, 7, 5
        logits = rng.standard_normal((B, T, V)).astype(np.float32)
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
        labels = rng.integers(1, V, size=(B, Umax))
        lab_len = np.array([5, 3])
        in_len = np.array([20, 18])
        ours = float(
            ctc_loss(jnp.asarray(lp), jnp.asarray(in_len), jnp.asarray(labels), jnp.asarray(lab_len), blank_id=0)
        )
        fn = torch.nn.CTCLoss(blank=0, reduction="sum")
        theirs = float(
            fn(torch.tensor(lp).transpose(0, 1), torch.tensor(labels), torch.tensor(in_len), torch.tensor(lab_len))
        )
        assert ours == pytest.approx(theirs, rel=1e-4, abs=1e-3)

    def test_gradients_match_torch(self):
        rng = np.random.default_rng(4)
        B, T, V, Umax = 2, 16, 6, 4
        blank = V - 1
        logits = rng.standard_normal((B, T, V)).astype(np.float32)
        labels = rng.integers(0, V - 1, size=(B, Umax))
        lab_len = np.array([4, 2])
        in_len = np.array([16, 12])

        def loss_fn(x):
            lp = jax.nn.log_softmax(x, axis=-1)
            return ctc_loss(lp, jnp.asarray(in_len), jnp.asarray(labels), jnp.asarray(lab_len), blank_id=blank)

        g_ours = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))

        x = torch.tensor(logits, requires_grad=True)
        lp = torch.log_softmax(x, dim=-1).transpose(0, 1)
        fn = torch.nn.CTCLoss(blank=blank, reduction="sum")
        loss = fn(lp, torch.tensor(labels), torch.tensor(in_len), torch.tensor(lab_len))
        loss.backward()
        g_theirs = x.grad.numpy()
        np.testing.assert_allclose(g_ours, g_theirs, rtol=1e-3, atol=1e-4)

    def test_empty_label(self):
        # all-blank likelihood
        V, T = 4, 6
        blank = V - 1
        lp = np.log(np.full((1, T, V), 0.25, dtype=np.float32))
        ours = float(
            ctc_loss(
                jnp.asarray(lp),
                jnp.asarray([T]),
                jnp.zeros((1, 2), dtype=jnp.int32),
                jnp.asarray([0]),
                blank_id=blank,
            )
        )
        assert ours == pytest.approx(-T * np.log(0.25), rel=1e-5)


class TestGreedy:
    def test_device_greedy_collapse(self):
        V, blank = 5, 4
        # sequence: a a blank b b b blank blank c
        toks = [0, 0, blank, 1, 1, 1, blank, blank, 2]
        T = len(toks)
        lp = np.full((T, V), -10.0, dtype=np.float32)
        for t, k in enumerate(toks):
            lp[t, k] = 0.0
        labels, length = greedy_labels(jnp.asarray(lp), jnp.asarray(T), blank, max_tokens=8)
        assert int(length) == 3
        assert list(np.asarray(labels)[:3]) == [0, 1, 2]

    def test_device_greedy_respects_length(self):
        V, blank = 5, 4
        toks = [0, blank, 1, 2, 3]
        lp = np.full((len(toks), V), -10.0, dtype=np.float32)
        for t, k in enumerate(toks):
            lp[t, k] = 0.0
        labels, length = greedy_labels(jnp.asarray(lp), jnp.asarray(3), blank, max_tokens=4)
        assert int(length) == 2
        assert list(np.asarray(labels)[:2]) == [0, 1]

    def test_device_greedy_truncates_at_max_tokens(self):
        V, blank = 4, 3
        toks = [0, 1, 0, 1, 0, 1]
        lp = np.full((len(toks), V), -10.0, dtype=np.float32)
        for t, k in enumerate(toks):
            lp[t, k] = 0.0
        labels, length = greedy_labels(jnp.asarray(lp), jnp.asarray(6), blank, max_tokens=3)
        assert int(length) == 3
        assert list(np.asarray(labels)) == [0, 1, 0]

    def test_host_greedy_decode_text(self):
        tok = CharTokenizer()
        blank = tok.blank_id
        V = tok.vocab_size() + 1
        text = "hi there"
        ids = tok.encode(text)
        frames = []
        for i in ids:
            frames += [i, i, blank]
        lp = np.full((len(frames), V), -10.0, dtype=np.float32)
        for t, k in enumerate(frames):
            lp[t, k] = 0.0
        assert greedy_decode(lp, tok, blank) == text

    def test_device_host_agree(self):
        rng = np.random.default_rng(7)
        tok = CharTokenizer()
        blank = tok.blank_id
        V = tok.vocab_size() + 1
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(rng.standard_normal((50, V)).astype(np.float32))))
        labels, length = greedy_labels(jnp.asarray(lp), jnp.asarray(50), blank, max_tokens=50)
        device_text = tok.decode(list(np.asarray(labels)[: int(length)]))
        host_text = greedy_decode(lp, tok, blank)
        assert device_text == host_text
