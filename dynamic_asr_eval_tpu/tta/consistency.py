"""Consistency TTA: per-chunk parameter collections with distance-decayed
gradient sharing.

Capability parity with ``dynamic_eval_consistency_ctc_loss``
(``lcasr/lib.py:646-903``):

- every chunk owns its own copy of the model parameters and its own
  optimizer (Adafactor by default, ``:654``, ``:736``);
- per epoch, each chunk computes its CTC pseudo-label gradient with its own
  parameters (same augment/pseudo-label step as NSTI) — gradients are stored,
  not applied (``:795-805``);
- after the epoch, gradients are shared across chunks with distance decay
  ``0.95^|i-q|`` and renormalized by ``1 + Σ decay`` (``:817-848``), then
  every chunk's optimizer steps (``:850-853``).  The reference's mixing loop
  mutates ``param.grad`` IN PLACE as it walks chunks in ascending order
  (``:843``), so chunk ``i`` mixes against the already-mixed gradients of
  chunks ``q < i`` and the raw gradients of ``q > i`` — we reproduce those
  exact semantics by composing the sequential row operations into one mixing
  matrix (``sequential_mix_matrix``) applied as a single matmul per leaf;
- the final pass evaluates each chunk with its own adapted parameters and
  stitches as usual.  (The reference's final pass contains a no-op parameter
  install — ``p_cur.data.to(...)`` without assignment, ``lcasr/lib.py:858`` —
  i.e. it unintentionally reuses the last chunk's weights; we implement the
  evident intent: per-chunk parameters.)

TPU-native: parameter collections live as ONE stacked pytree with a leading
chunk axis; the O(N²) sharing loop is a single ``W @ G`` matmul over that
axis (``W[i,q] = 0.95^|i-q|``, row-normalized); per-chunk optimizers are the
same optax transform vmapped over the chunk axis.  The reference mixes
gradients in fp64 on CPU (``:829``) — here fp32 on device (documented
divergence; WER-level parity is the bar).

Memory note: this engine holds ``n_chunks`` copies of the parameters (the
reference pays the same on CPU); use moderate chunk counts or parameter
freezing for large models.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dynamic_asr_eval_tpu.augment import apply_augmentation_pipeline
from dynamic_asr_eval_tpu.ops.ctc import ctc_loss, greedy_labels
from dynamic_asr_eval_tpu.tta.runner import DynamicEvalEngine, EngineOutput


def sequential_mix_matrix(
    chunk_mask: jnp.ndarray, decay: float
) -> jnp.ndarray:
    """Exact matrix form of the reference's in-place gradient-sharing loop
    (``lcasr/lib.py:817-848``).

    The reference walks real chunks in ascending order and overwrites each
    chunk's gradient with the decay-weighted mix BEFORE later chunks read it:

        g_i  ←  (g_i + Σ_{q<i} d_iq·ĝ_q + Σ_{q>i} d_iq·g_q) / s_i,
        d_iq = decay^|i-q|,   s_i = 1 + Σ_{q≠i} d_iq,

    where ``ĝ_q`` are the already-overwritten rows.  Each step is a linear
    row operation, so the whole pass composes into one matrix ``L`` with
    ``Ĝ = L @ G`` — built here by forward substitution.  Masked (padding)
    chunks get identity rows and are excluded from every sum, matching the
    reference where padding chunks simply don't exist.
    """
    N = chunk_mask.shape[0]
    pos = jnp.arange(N)
    D = decay ** jnp.abs(pos[:, None] - pos[None, :]).astype(jnp.float32)
    D = D * chunk_mask[None, :] * chunk_mask[:, None]
    D = D - jnp.diag(jnp.diag(D))  # off-diagonal decay weights only
    s = 1.0 + D.sum(axis=1)  # 1 (self) + Σ decay   (lcasr/lib.py:827,833)
    eye = jnp.eye(N, dtype=jnp.float32)

    def body(i, L):
        below = (pos < i).astype(jnp.float32)
        # q < i contribute their already-mixed rows L[q]; q > i their raw e_q
        row = (eye[i] + (D[i] * below) @ L + D[i] * (1.0 - below)) / s[i]
        row = jnp.where(chunk_mask[i] > 0, row, eye[i])
        return L.at[i].set(row)

    return jax.lax.fori_loop(0, N, body, eye)


class ConsistencyEngine(DynamicEvalEngine):
    decay_per_distance: float = 0.95

    def __init__(self, *args, **kwargs):
        optimizer = kwargs.pop("optimizer", None)
        super().__init__(*args, **kwargs)
        if optimizer is None:
            opt_args = dict(self.config.optim_args)
            lr = opt_args.pop("lr", 9e-5)
            self.optimizer = optax.adafactor(learning_rate=lr)
        else:
            self.optimizer = optimizer

    def _build_run(self, W: int, N: int, total_ds: int, epochs: int, online: bool):
        T_ds_static = self.out_len_fn(W)
        max_tokens = max(8, int(T_ds_static * self.max_label_frames_ratio))
        V = self.n_classes
        nn_neg = self.num_negatives

        def chunk_grad(params, extra_vars, window, w_len, key):
            """Gradient of one chunk's pseudo-label CTC loss (NSTI step sans
            update); returns (grads, clean_lp, ds_len)."""

            aug = jnp.repeat(window[None], nn_neg, axis=0)
            aug = apply_augmentation_pipeline(
                aug, key, self.config.spec_augment, self.config.frame_shuffle,
                self.config.cutout, self.config.random_noise, actual_len=w_len,
            )
            batch = jnp.concatenate([aug, window[None]], axis=0)
            lengths = jnp.full((nn_neg + 1,), w_len, jnp.int32)

            def loss_fn(p):
                out = self.model.apply({"params": p, **extra_vars}, batch, length=lengths)
                lp = out["final_posteriors"]
                ds_len = out["length"][0]
                clean_lp = jax.lax.stop_gradient(lp[-1])
                labels, lab_len = greedy_labels(clean_lp, ds_len, self.blank_id, max_tokens)
                # normalize by the chunk's ACTUAL downsampled length (the
                # reference divides by the ragged chunk's N, lcasr/lib.py:787-791);
                # padded-length division would downweight tail chunks up to ds×
                loss = ctc_loss(
                    lp[:nn_neg],
                    jnp.full((nn_neg,), ds_len, jnp.int32),
                    jnp.repeat(labels[None], nn_neg, axis=0),
                    jnp.full((nn_neg,), lab_len, jnp.int32),
                    blank_id=self.blank_id,
                ) / (jnp.maximum(ds_len, 1) * nn_neg)
                return loss, (clean_lp, ds_len)

            (loss, (clean_lp, ds_len)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            return grads, clean_lp, ds_len

        def run(params, extra_vars, spec_dev, starts, lengths, starts_ds, key):
            F = spec_dev.shape[0]
            # stacked per-chunk params + per-chunk optimizer states
            stacked = jax.tree.map(
                lambda p: jnp.broadcast_to(p[None], (N,) + p.shape) + 0.0, params
            )
            opt_states = jax.vmap(self.optimizer.init)(stacked)

            chunk_mask = (lengths > 0).astype(jnp.float32)  # [N]
            # the reference's sequential in-place mixing as one matrix
            Wn = sequential_mix_matrix(chunk_mask, self.decay_per_distance)

            def epoch_body(carry, ekey):
                stacked, opt_states = carry

                def grad_step(key_carry, xs):
                    key = key_carry
                    idx, start, w_len = xs
                    key, k = jax.random.split(key)
                    window = jax.lax.dynamic_slice(
                        spec_dev, (0, start), (F, W)
                    ).astype(jnp.float32)
                    p_i = jax.tree.map(lambda s: s[idx], stacked)

                    def do(_):
                        g, clean_lp, ds_len = chunk_grad(p_i, extra_vars, window, w_len, k)
                        return g, clean_lp, ds_len

                    def skip(_):
                        return (
                            jax.tree.map(jnp.zeros_like, p_i),
                            jnp.zeros((T_ds_static, V), jnp.float32),
                            jnp.asarray(0, jnp.int32),
                        )

                    g, clean_lp, ds_len = jax.lax.cond(w_len > 0, do, skip, None)
                    return key, (g, clean_lp, ds_len)

                _, (grads, clean_lps, ds_lens) = jax.lax.scan(
                    grad_step, ekey, (jnp.arange(N), starts, lengths)
                )

                # distance-decay gradient sharing: one matmul per leaf
                mixed = jax.tree.map(
                    lambda g: jnp.einsum(
                        "ij,j...->i...", Wn, g, preferred_element_type=jnp.float32
                    ).astype(g.dtype),
                    grads,
                )

                def upd(g, s, p):
                    u, s2 = self.optimizer.update(g, s, p)
                    return optax.apply_updates(p, u), s2

                stacked2, opt_states2 = jax.vmap(upd)(mixed, opt_states, stacked)
                return (stacked2, opt_states2), (clean_lps, ds_lens)

            keys = jax.random.split(key, epochs)
            (stacked, opt_states), (clean_lps, ds_lens) = jax.lax.scan(
                epoch_body, (stacked, opt_states), keys
            )
            # clean_lps from the LAST epoch (online mode semantics)
            clean_lps, ds_lens = clean_lps[-1], ds_lens[-1]

            if online:
                probs = jnp.exp(clean_lps)
            else:
                def infer_chunk(xs):
                    idx, start, w_len = xs
                    window = jax.lax.dynamic_slice(spec_dev, (0, start), (F, W)).astype(jnp.float32)
                    p_i = jax.tree.map(lambda s: s[idx], stacked)
                    out = self.model.apply(
                        {"params": p_i, **extra_vars}, window[None],
                        length=jnp.full((1,), jnp.maximum(w_len, 1), jnp.int32),
                    )
                    return out["final_posteriors"][0], jnp.where(w_len > 0, out["length"][0], 0)

                def infer_scan(carry, xs):
                    lp, dl = infer_chunk(xs)
                    return carry, (lp, dl)

                _, (lps, ds_lens) = jax.lax.scan(
                    infer_scan, 0, (jnp.arange(N), starts, lengths)
                )
                probs = jnp.exp(lps)

            from dynamic_asr_eval_tpu.ops.stitch import stitch_chunk_probs

            log_avg, counts = stitch_chunk_probs(probs, ds_lens, starts_ds, total_ds)
            return stacked, log_avg, counts

        return jax.jit(run)

    def __call__(
        self,
        variables: Dict[str, Any],
        spec: np.ndarray,
        seq_len: int = -1,
        overlap: int = -1,
        return_params: bool = False,
        rng: Optional[jax.Array] = None,
        **_,
    ) -> EngineOutput:
        cfg = self.config
        spec_padded, spec_n, W, N, n_real, starts_np, lengths_np, total_ds = self._plan(
            spec, seq_len, overlap
        )
        params = variables["params"]
        extra_vars = {k: v for k, v in variables.items() if k != "params"}
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        epochs = max(cfg.epochs, 1)

        key = (W, N, total_ds, epochs, cfg.online)
        if key not in self._adapt_cache:
            self._adapt_cache[key] = self._build_run(W, N, total_ds, epochs, cfg.online)

        t0 = time.time()
        spec_dev = jnp.asarray(spec_padded, self.transfer_dtype)
        stacked, log_avg, counts = self._adapt_cache[key](
            params, extra_vars, spec_dev,
            jnp.asarray(starts_np), jnp.asarray(lengths_np),
            jnp.asarray(starts_np // self.ds), rng,
        )
        log_avg.block_until_ready()
        elapsed = time.time() - t0
        if cfg.print_runtimes:
            print(f"Spectrogram length: {spec_n}")
            print(f"Runtime: {elapsed}")
        return EngineOutput(
            logits=log_avg,
            counts=counts,
            params=stacked if return_params else None,  # [N, ...] per-chunk
            elapsed=elapsed,
            blank_id=self.blank_id,
        )
